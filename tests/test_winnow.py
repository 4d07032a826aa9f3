"""Winnowing fingerprint invariants (Schleimer et al. 2003)."""


def _fp(spark, rows, k=4, w=5):
    from pyproj_spark.operators.dedup import winnow_fingerprints
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return winnow_fingerprints(df, k=k, w=w).collect()


def test_winnow_detection_guarantee(spark):
    # two docs share a run of w + k - 1 = 8 tokens -> must share a fp
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [(1, "one two three " + shared + " four five"),
            (2, "six seven " + shared + " eight nine ten")]
    out = _fp(spark, rows)
    fps1 = {r.fp for r in out if r.doc_id == 1}
    fps2 = {r.fp for r in out if r.doc_id == 2}
    assert fps1 & fps2


def test_winnow_density_and_positions(spark):
    text = " ".join(f"tok{i}" for i in range(100))  # 97 grams, 93 windows
    out = _fp(spark, [(1, text)])
    n_grams = 97
    # density: every window selects one gram; distinct count is between
    # ceil(windows / w) and windows, expected ~2/(w+1)
    assert 93 // 5 <= len(out) <= 93
    assert len(out) < 50  # ~2/(w+1) * 93 = 31; generous upper bound
    for r in out:
        assert 0 <= r.pos < n_grams
        assert r.fp >= 0


def test_winnow_rightmost_tiebreak(spark):
    # all-equal tokens: every gram hash identical, so each window must
    # select its RIGHTMOST gram -> selected positions are exactly
    # {w-1, ..., n_grams-1}
    out = _fp(spark, [(1, " ".join(["same"] * 12))])  # 9 grams, 5 windows
    assert sorted(r.pos for r in out) == [4, 5, 6, 7, 8]
    assert len({r.fp for r in out}) == 1


def test_winnow_short_doc_no_window_no_rows(spark):
    # fewer than w + k - 1 tokens -> fewer than w grams -> no window
    out = _fp(spark, [(1, "a b c d e f g")])  # 4 grams < w
    assert out == []
