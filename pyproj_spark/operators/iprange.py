"""IP-range lookup join (GeoIP-style enrichment) — the canonical
range join of a web-text pipeline: every crawl log / WARC record
carries an address, and the lookup side is a table of disjoint
[start, end] u32 ranges with a payload (country, ASN, ...).

The Spark-first point is the JOIN SHAPE. `ip BETWEEN start AND end`
is a non-equi predicate: Catalyst plans it as BroadcastNestedLoop
(fine only while the range table broadcasts) and at big-big scale a
range join degenerates to a near-cartesian shuffle. PREFIX-BUCKET
DECOMPOSITION turns it into a hash equi-join: each range explodes
into the /B prefix buckets it covers (fan-out bounded by
range_width / 2^(32-B) + 1), each probe IP computes its single
bucket, the join runs on the bucket key, and one residual
start<=ip<=end filter removes the bucket-edge misses. Both sides
partition-parallel, no nested loop anywhere — the same decomposition
trick the tiling/LSH operators use for spatial and similarity
predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default bucket = /16 prefix (65536 addresses per bucket)
BUCKET_BITS = 16


def ip_range_join(probe: DataFrame, ranges: DataFrame,
                  id_cols: list[str], ip_col: str = "ip32",
                  bucket_bits: int = BUCKET_BITS) -> DataFrame:
    """Left-join ``probe`` to ``ranges`` (start, end, plus payload
    columns) on start <= ip <= end via prefix-bucket decomposition.
    Ranges must be disjoint (at most one match per IP — the GeoIP
    contract); ``id_cols`` uniquely identify a probe row. Unmatched
    probes keep NULL payloads.

    Plan: ranges explode into covered buckets, probes compute one
    bucket, inner hash equi-join + residual between-filter (<= 1 row
    per probe by disjointness), then one left equi-join back on the
    probe id — every exchange is a hash join, no nested loop."""
    shift = 32 - bucket_bits
    payload = [c for c in ranges.columns if c not in ("start", "end")]
    r = ranges.withColumn(
        "_bkt", F.explode(F.sequence(
            F.shiftright(F.col("start"), shift),
            F.shiftright(F.col("end"), shift))))
    p = probe.select(*id_cols, F.col(ip_col))
    hit = (p.withColumn("_bkt", F.shiftright(F.col(ip_col), shift))
           .join(r, "_bkt")
           .filter((F.col(ip_col) >= F.col("start"))
                   & (F.col(ip_col) <= F.col("end")))
           .select(*id_cols, *payload))
    return probe.join(hit, id_cols, "left")
