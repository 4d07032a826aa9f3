"""Streaming HyperLogLog distinct counting — the register vector as
keyed stream state.

The batch operator (operators/sketch.py) shows WHY HLL scales: the
512-register vector merges with element-wise max. This module shows
the streaming consequence: the same vector is a perfect
``applyInPandasWithState`` state — O(m) integers per group forever,
regardless of stream length — and because the register computation is
the SAME deterministic md5/bit-length arithmetic, the streaming
estimate after N micro-batches is BIT-IDENTICAL to the batch estimate
over the union of their rows (the batch/stream-parity contract the
other streaming operators in this package follow, cf. streaming/
tiles.py). A native two-level streaming agg (max per register, then
the harmonic sum) would need chained stateful aggregations, which
Structured Streaming forbids in one query — exactly the case SURVEY
§2.6 routes to a custom stateful operator.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pyproj_spark.operators.sketch import C_NUM, LC_THRESH, M, W

OUT_SCHEMA = "grp string, hll_est double, zeros long"
STATE_SCHEMA = "regs array<int>"


def _registers(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(idx, rho) arrays via the exact arithmetic of the batch
    operator: md5 -> 60-bit int -> top-P index, bit-length rank.
    np.frexp supplies the bit length exactly (integers < 2^53 are
    exact in double; the exponent is floor(log2)+1 with no libm
    rounding involved)."""
    h = values.map(lambda v: int(
        hashlib.md5(str(v).encode()).hexdigest()[:15], 16))
    v = h.to_numpy(dtype=np.int64)
    idx = v >> W
    w = v & ((1 << W) - 1)
    _, e = np.frexp(w.astype(np.float64))
    rho = np.where(w == 0, W + 1, W + 1 - e)
    return idx, rho.astype(np.int64)


def _estimate(regs: np.ndarray) -> tuple[float, int]:
    present = regs > 0
    zeros = int(M - present.sum())
    s = int((1 << (W + 1 - regs[present])).sum()) \
        + zeros * (1 << (W + 1))
    raw = C_NUM / s
    if raw <= LC_THRESH and zeros > 0:
        est = float(M) * np.log(float(M) / zeros)
    else:
        est = raw
    return round(float(est), 4), zeros


def _hll_fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState
            ) -> Iterator[pd.DataFrame]:
    regs = (np.array(state.get[0], dtype=np.int64) if state.exists
            else np.zeros(M, dtype=np.int64))
    for pdf in pdfs:
        if len(pdf):
            idx, rho = _registers(pdf["_v"])
            np.maximum.at(regs, idx, rho)
    state.update((regs.astype(int).tolist(),))
    est, zeros = _estimate(regs)
    yield pd.DataFrame({"grp": [str(key[0])], "hll_est": [est],
                        "zeros": [zeros]})


def streaming_hll_distinct(stream: DataFrame, group_col: str,
                           value_col: str) -> DataFrame:
    """Per-group running distinct estimate, one updated row per group
    per micro-batch. Use outputMode('update')."""
    from pyspark.sql import functions as F
    keyed = stream.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(value_col).cast("string").alias("_v"))
    return (keyed.groupBy("grp")
            .applyInPandasWithState(
                _hll_fn, OUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))


# ----------------------------------------------------------- CM

from pyproj_spark.operators.sketch import CM_D, CM_W  # noqa: E402

CM_OUT_SCHEMA = "grp string, value string, est long"
CM_STATE_SCHEMA = "counters array<long>"


def _cm_col(r: int, v: str, w: int) -> int:
    """EXACT arithmetic of the batch operator (operators/sketch.py
    cm_build): md5(f'{r}:{v}') first-15-hex -> int % w."""
    return int(hashlib.md5(f"{r}:{v}".encode()).hexdigest()[:15],
               16) % w


def streaming_cm_heavy(stream: DataFrame, group_col: str,
                       value_col: str, probes: list,
                       d: int = CM_D, w: int = CM_W) -> DataFrame:
    """Streaming Count-Min: the d*w counter matrix is PERFECT keyed
    stream state — additive, so micro-batch boundaries cannot change
    it, and O(d*w) longs per group forever. Each trigger re-emits the
    current frequency estimate for every probe value (update mode).
    After the stream drains, the estimates are BIT-IDENTICAL to the
    batch sketch over the union of rows (cm_build + min-over-rows
    probe) — the same batch/stream-parity contract as streaming HLL
    above."""
    from pyspark.sql import functions as F

    probe_strs = [str(p) for p in probes]

    def _fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState
            ) -> Iterator[pd.DataFrame]:
        cnt = (np.array(state.get[0], dtype=np.int64) if state.exists
               else np.zeros(d * w, dtype=np.int64))
        for pdf in pdfs:
            if not len(pdf):
                continue
            vs = pdf["_v"].astype(str)
            for r in range(d):
                cols = vs.map(lambda v, _r=r: _cm_col(_r, v, w)) \
                    .to_numpy(dtype=np.int64)
                np.add.at(cnt, r * w + cols, 1)
        state.update((cnt.astype(int).tolist(),))
        ests = [int(min(cnt[r * w + _cm_col(r, p, w)]
                        for r in range(d))) for p in probe_strs]
        yield pd.DataFrame({"grp": [str(key[0])] * len(probe_strs),
                            "value": probe_strs, "est": ests})

    keyed = stream.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(value_col).cast("string").alias("_v"))
    return (keyed.groupBy("grp")
            .applyInPandasWithState(
                _fn, CM_OUT_SCHEMA, CM_STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))
