"""PII detection and redaction over web text — a first-class
training-data-pipeline stage (alongside dedup/quality/lang-id).

Pure Catalyst: `regexp_extract_all` for per-type counts and sequential
`regexp_replace` for redaction, so the whole pass stays inside
whole-stage codegen with zero Python in the hot path.  The patterns are
written in the common subset of Java regex (Spark) and RE2 (DuckDB
oracle): no lookaround, no backreferences, ASCII `\\d`/`\\b` only, so
the SAME strings drive both engines and the oracle gate hash-checks the
redacted text byte-for-byte.

Redaction is ordered most-specific-first (email > IPv4 > SSN > phone):
each later pattern runs over the already-redacted text, so a span can
only ever be claimed by one type.  Counts, by contrast, are computed
independently over the ORIGINAL text (a detection report should not
depend on redaction order).

At corpus scale this is a narrow map: no shuffle, no UDF, column-pruned
to the text column; the 100-TB plan is the scan plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) in REDACTION order (most specific first).
#: Patterns are valid and equivalent under both Java regex and RE2.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4",
     r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
     "<IP>"),
    ("ssn",
     r"\b\d{3}-\d{2}-\d{4}\b",
     "<SSN>"),
    ("phone",
     r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
     "<PHONE>"),
]


def pii_count(col: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of one PII pattern."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)) \
        .cast("long")


def redact(col: Column) -> Column:
    """Redact all PII types in PII_PATTERNS order."""
    out = col
    for _name, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds per-type match counts (n_email, n_ipv4, n_ssn, n_phone),
    a total, and the redacted text column `redacted`."""
    c = F.col(text_col)
    counts = {f"n_{name}": pii_count(c, pat)
              for name, pat, _tok in PII_PATTERNS}
    out = df
    for name, expr in counts.items():
        out = out.withColumn(name, expr)
    total = sum((F.col(f"n_{n}") for n, _p, _t in PII_PATTERNS),
                F.lit(0).cast("long"))
    return (out.withColumn("n_pii", total)
            .withColumn("redacted", redact(c)))
