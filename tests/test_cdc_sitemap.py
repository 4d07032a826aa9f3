"""Content-defined chunking + sitemap parsing operators."""

from pyspark.sql import functions as F

from pyproj_spark.operators.dedup import cdc_chunk_table
from pyproj_spark.operators.extract import parse_sitemaps


def _chunks(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return cdc_chunk_table(df).collect()


WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india "
         "juliet kilo lima mike november oscar papa quebec romeo "
         "sierra tango uniform victor whiskey xray yankee zulu").split()


class TestCDCChunks:
    def test_chunks_cover_doc_and_boundaries_are_anchor_words(self, spark):
        import hashlib
        text = " ".join(WORDS * 4)
        out = _chunks(spark, [(1, text)])
        assert sum(r.n_words for r in out) == len(WORDS) * 4
        # every word whose md5 starts with '0' opens a chunk; count
        # of chunks = anchors (+1 if the doc starts mid-chunk)
        anchors = sum(1 for w in WORDS * 4
                      if hashlib.md5(w.encode()).hexdigest()[0] == "0")
        starts_with_anchor = (hashlib.md5(WORDS[0].encode())
                              .hexdigest()[0] == "0")
        assert len(out) == anchors + (0 if starts_with_anchor else 1)

    def test_insertion_locality(self, spark):
        # CDC's point: inserting a paragraph leaves all chunks outside
        # the insertion region identical (fixed-size chunking would
        # shift every later chunk).
        base = " ".join(WORDS * 6)
        mid = len(WORDS) * 3
        words = (WORDS * 6)
        edited = " ".join(words[:mid] + ["inserted", "paragraph", "here"]
                          + words[mid:])
        h0 = sorted(r.chunk_hash for r in _chunks(spark, [(1, base)]))
        h1 = sorted(r.chunk_hash for r in _chunks(spark, [(1, edited)]))
        shared = len(set(h0) & set(h1))
        # all but the one or two chunks touching the insertion survive
        assert shared >= len(set(h0)) - 2

    def test_duplicate_paragraphs_produce_duplicate_chunks(self, spark):
        text = " ".join(WORDS * 3)
        out = _chunks(spark, [(1, text), (2, text)])
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.id, []).append(r.chunk_hash)
        assert sorted(by_doc[1]) == sorted(by_doc[2])


class TestParseSitemaps:
    def test_known_xml_round_trip(self, spark):
        xml = ('<?xml version="1.0"?><urlset>'
               "<url><loc>https://a.example/p1</loc>"
               "<lastmod>2024-01-02</lastmod>"
               "<priority>0.8</priority></url>"
               "<url><loc>https://a.example/p2</loc>"
               "<lastmod>2024-03-04</lastmod>"
               "<priority>0.5</priority></url>"
               "</urlset>")
        df = spark.createDataFrame([("a.example", xml)], ["host", "xml"])
        rows = sorted(parse_sitemaps(df).collect(), key=lambda r: r.loc)
        assert [(r.loc, r.lastmod, r.priority) for r in rows] == [
            ("https://a.example/p1", "2024-01-02", "0.8"),
            ("https://a.example/p2", "2024-03-04", "0.5")]

    def test_empty_urlset_yields_no_rows(self, spark):
        df = spark.createDataFrame(
            [("b.example", "<urlset></urlset>")], ["host", "xml"])
        assert parse_sitemaps(df).count() == 0
