"""Sequence packing (operators/packing.py)."""

from pyproj_spark.operators.packing import pack_sequences


def test_packing_invariants(spark):
    df = spark.createDataFrame(
        [(0, 100), (1, 50), (2, 0), (3, 120), (4, 30)],
        "doc_id long, n_tokens long")
    rows = {r.bin: r for r in pack_sequences(df, capacity=128).collect()}
    # stream = 100 + 50 + 120 + 30 = 300 tokens -> bins 0,1,2
    assert sorted(rows) == [0, 1, 2]
    assert rows[0].n_tokens == 128 and rows[0].fill == 1.0
    assert rows[1].n_tokens == 128
    assert rows[2].n_tokens == 300 - 256
    # doc 0 fills bin 0 then straddles into bin 1 with doc 1/3
    assert rows[0].n_docs == 2   # doc 0 + doc 1's head? -> check below
    # exact doc membership: doc0 [0,100) bin0; doc1 [100,150) bins 0-1;
    # doc3 [150,270) bins 1-2; doc4 [270,300) bin 2; doc2 skipped
    assert rows[1].n_docs == 2
    assert rows[2].n_docs == 2
    total = sum(r.n_tokens for r in rows.values())
    assert total == 300  # no token lost or duplicated


def test_single_giant_doc_spans_many_bins(spark):
    df = spark.createDataFrame([(0, 1000)], "doc_id long, n_tokens long")
    rows = pack_sequences(df, capacity=128).collect()
    assert len(rows) == 8  # ceil(1000/128)
    assert sum(r.n_tokens for r in rows) == 1000
    assert all(r.n_docs == 1 for r in rows)


def test_stride_mix_local_mixture(spark):
    """In any prefix of the position-ordered stream, each stratum's
    share tracks its weight (the stride guarantee sampling lacks)."""
    from pyproj_spark.operators.packing import stride_mix
    rows = [(i, "a" if i < 300 else "b") for i in range(600)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = (stride_mix(df, {"a": 3.0, "b": 1.0}, "source")
           .toPandas().sort_values("pos").reset_index(drop=True))
    head = out.head(100)
    share_a = (head["source"] == "a").mean()
    assert abs(share_a - 0.75) < 0.05
    # positions within a stratum are strictly increasing by rank
    a = out[out["source"] == "a"]["pos"].to_numpy()
    assert (a[1:] > a[:-1]).all()
