"""Streaming one-sided CUSUM drift detection — the online form of the
batch `cusum_drift` gate (queries_text.py).

The batch operator removes the per-host MEAN, which needs every day up
front; the online detector instead tracks deviations against a FIXED
per-host reference rate (the trained baseline every production monitor
ships with). The recurrence S_t = max(0, S_{t-1} + dev_t) equals
P_t - min(0, min_{s<=t} P_s) for the prefix sums P, so the keyed
stream state is just THREE longs — (p, runmin, cus_max) plus the
argmax day — regardless of stream length, and processing the same
rows in the same day order through any micro-batch slicing yields
BIT-IDENTICAL excursions (all-integer arithmetic; the batch/stream
parity contract of streaming/sketch.py)."""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("source string, cus_max long, peak_day long, "
              "p long, days_seen long")
STATE_SCHEMA = "p long, runmin long, cus_max long, peak_day long, n long"


def cusum_update(p: int, runmin: int, cus_max: int, peak_day: int,
                 days: np.ndarray, devs: np.ndarray
                 ) -> tuple[int, int, int, int]:
    """Advance the CUSUM state through (day, dev) rows already sorted
    by day. Pure integer numpy: prefix sums, running min of
    min(P, 0), excursion max with smallest-day tie-break."""
    ps = p + np.cumsum(devs)
    floors = np.minimum.accumulate(np.minimum(ps, 0))
    floors = np.minimum(floors, runmin)
    cus = ps - floors
    for day, c in zip(days, cus):
        if c > cus_max:
            cus_max = int(c)
            peak_day = int(day)
    return int(ps[-1]), int(floors[-1]), cus_max, peak_day


def _fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState
        ) -> Iterator[pd.DataFrame]:
    if state.exists:
        p, runmin, cus_max, peak_day, n = state.get
    else:
        p, runmin, cus_max, peak_day, n = 0, 0, 0, -1, 0
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks).sort_values("day")
        devs = pdf["dev"].to_numpy(dtype=np.int64)
        days = pdf["day"].to_numpy(dtype=np.int64)
        p, runmin, cus_max, peak_day = cusum_update(
            p, runmin, cus_max, peak_day, days, devs)
        n += len(pdf)
    state.update((int(p), int(runmin), int(cus_max),
                  int(peak_day), int(n)))
    yield pd.DataFrame({"source": [str(key[0])],
                        "cus_max": [int(cus_max)],
                        "peak_day": [int(peak_day)],
                        "p": [int(p)], "days_seen": [int(n)]})


def streaming_cusum(stream: DataFrame, source_col: str = "source",
                    day_col: str = "day", value_col: str = "y",
                    target_col: str = "target") -> DataFrame:
    """Per-host running CUSUM excursion against a fixed reference:
    one updated row per host per micro-batch (outputMode 'update').
    `dev = y - target` must be integer columns; rows must arrive in
    day order across triggers (the monitor's natural feed order)."""
    from pyspark.sql import functions as F
    keyed = stream.select(
        F.col(source_col).cast("string").alias("source"),
        F.col(day_col).cast("long").alias("day"),
        (F.col(value_col).cast("long")
         - F.col(target_col).cast("long")).alias("dev"))
    return (keyed.groupBy("source")
            .applyInPandasWithState(
                _fn, OUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))
