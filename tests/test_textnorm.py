"""Unicode normalization (operators/textnorm.py)."""

from pyproj_spark.operators.textnorm import normalize_py, normalize_text


def test_normalize_py():
    # decomposed -> composed (explicit escapes), junk stripped
    assert normalize_py("cafe\u0301") == "caf\u00e9"
    assert len(normalize_py("e\u0301")) == 1
    assert normalize_py("a\u200bb\u200cc\u200dd\ufeff") == "abcd"
    assert normalize_py("x\x07y\x00z") == "xyz"
    assert normalize_py("keep\tthis\nline") == "keep\tthis\nline"
    # NFC is idempotent on already-composed text
    assert normalize_py("caf\u00e9") == "caf\u00e9"


def test_spark_udf(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(0, "café​!"), (1, None)],
        "doc_id long, text string")
    rows = {r.doc_id: r.n
            for r in df.select("doc_id",
                               normalize_text(F.col("text"))
                               .alias("n")).collect()}
    assert rows[0] == "café!"
    assert rows[1] is None
