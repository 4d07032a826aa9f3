"""Stateful streaming dedup — first-seen-wins over a keyed state store.

Custom stateful operator via ``applyInPandasWithState`` (the Spark
primitive for operators the built-ins can't express — SURVEY.md §2.6
mapping). Keyed by a hash prefix of the url so state is uniformly
spread across partitions regardless of site skew; state per key is the
set of seen url-hashes (bounded by processing-time timeout in real
deployments)."""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "url string, warc_ts timestamp, first_seen boolean"
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState
              ) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values("warc_ts")
        mask = ~pdf["url_md5"].isin(seen) & ~pdf["url_md5"].duplicated()
        new = pdf[mask]
        seen.update(new["url_md5"].tolist())
        out.append(new[["url", "warc_ts"]].assign(first_seen=True))
    state.update((list(seen),))
    yield pd.concat(out) if out else pd.DataFrame(
        columns=["url", "warc_ts", "first_seen"])


def streaming_first_seen(pages_stream: DataFrame,
                         shards: int = 64) -> DataFrame:
    """Emit each url the first time it is ever seen on the stream."""
    keyed = (pages_stream
             .select("url", "warc_ts", F.md5("url").alias("url_md5"))
             .withColumn("shard",
                         F.pmod(F.conv(F.substring("url_md5", 1, 6), 16, 10)
                                .cast("long"), F.lit(shards))))
    return (keyed.groupBy("shard")
            .applyInPandasWithState(
                _dedup_fn, OUT_SCHEMA, STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout))
