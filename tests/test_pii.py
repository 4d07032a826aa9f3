"""PII detection/redaction semantics (operators/pii.py)."""

import pytest

from pyspark.sql import functions as F

from pyproj_spark.operators import pii

CASES = [
    # (text, n_email, n_ipv4, n_ssn, n_phone, redacted)
    ("mail me at jo.doe+x%y@sub-1.Example.ORG today",
     1, 0, 0, 0, "mail me at <EMAIL> today"),
    ("server 192.168.001.1 and 10.0.0.255.",
     0, 2, 0, 0, "server <IP> and <IP>."),
    ("ssn 078-05-1120 tel 555-867-5309 alt 555.867.5309",
     0, 0, 1, 2, "ssn <SSN> tel <PHONE> alt <PHONE>"),
    # version strings match the ipv4 shape from the first \b-anchored
    # digit run ("v1" has no boundary before the 1, so the leftmost
    # match is "2.3.4.5") — documented precision tradeoff
    ("v1.2.3.4.5", 0, 1, 0, 0, "v1.<IP>"),
    # phone needs exactly 3-3-4: SSN's 3-2-4 must not double-count
    ("078-05-1120", 0, 0, 1, 0, "<SSN>"),
    # counts are independent per type (the dotted quad also counts as
    # ipv4), but redaction order lets email claim the span first
    ("1.2.3.4@h.io", 1, 1, 0, 0, "<EMAIL>"),
    ("no pii here 12345", 0, 0, 0, 0, "no pii here 12345"),
]


@pytest.fixture(scope="module")
def report(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_rest) in enumerate(CASES)],
        "doc_id long, text string")
    rows = pii.pii_report(df).orderBy("doc_id").collect()
    return rows


def test_counts(report):
    for row, (text, ne, ni, ns, np_, _red) in zip(report, CASES):
        got = (row.n_email, row.n_ipv4, row.n_ssn, row.n_phone)
        assert got == (ne, ni, ns, np_), text
        assert row.n_pii == ne + ni + ns + np_


def test_redaction(report):
    for row, (text, *_counts, red) in zip(report, CASES):
        assert row.redacted == red, text


def test_patterns_have_no_lookaround():
    # the cross-engine contract: Java-regex/RE2 common subset only
    for _name, pat, _tok in pii.PII_PATTERNS:
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat
        assert "\\1" not in pat


def test_redact_column_matches_report(spark):
    df = spark.createDataFrame([(0, CASES[2][0])], "doc_id long, text string")
    out = df.select(pii.redact(F.col("text")).alias("r")).head().r
    assert out == CASES[2][5]
