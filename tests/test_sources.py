"""Source-format breadth: CSV and JSON-lines roundtrips preserve the
documents table exactly (schema-projected reads, header handling)."""


def test_csv_and_jsonl_roundtrip(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cols = ["doc_id", "lang", "source", "n_chars"]  # text has newlines
    base = src.select(*cols)

    csv_dir = str(tmp_path / "csv")
    base.write.option("header", True).mode("overwrite").csv(csv_dir)
    got_csv = (spark.read.option("header", True)
               .schema(base.schema).csv(csv_dir))
    assert got_csv.exceptAll(base).count() == 0
    assert base.exceptAll(got_csv).count() == 0

    js_dir = str(tmp_path / "jsonl")
    src.write.mode("overwrite").json(js_dir)  # full rows incl. text
    got_js = spark.read.schema(src.schema).json(js_dir)
    assert got_js.exceptAll(src).count() == 0
    assert src.exceptAll(got_js).count() == 0
