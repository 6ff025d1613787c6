"""O(n·q) naive oracle — an independent re-statement of the window spec.

Port of the reference's test oracle (aggregator/src/test/scala/ai/chronon/
aggregator/test/NaiveAggregator.scala:24-56): for every query timestamp T,
re-scan all events and include e iff

    round(T - w, tailHop(w)) <= e.ts <= T     (unbounded: e.ts <= T)

then compute each operation directly with pandas/python — deliberately NOT
sharing code with the engine kernels.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd

from zipline_chronon_spark.api import AggregationPart, GroupBy, Operation, Window


def tail_start(t: int, window: Window) -> int:
    hop = window.tail_hop_millis()
    return ((t - window.millis) // hop) * hop


def _percentiles(args: dict) -> list[float]:
    return [float(p) for p in args.get("percentiles", "[0.5]").strip("[] ").split(",")]


def naive_one(part: AggregationPart, w_vals: list, w_ts: list) -> object:
    """Compute one op over the in-window (value, ts) pairs (nulls removed)."""
    if not w_vals:
        return None
    op, k = part.operation, part.k
    if op == Operation.COUNT:
        return len(w_vals)
    if op == Operation.SUM:
        s = sum(w_vals)
        return s
    if op == Operation.AVERAGE:
        return sum(float(v) for v in w_vals) / len(w_vals)
    if op == Operation.VARIANCE:
        x = np.array(w_vals, dtype=float)
        return float(np.mean((x - x.mean()) ** 2))
    if op == Operation.SKEW:
        x = np.array(w_vals, dtype=float)
        n = len(x)
        m2 = float(((x - x.mean()) ** 2).sum())
        m3 = float(((x - x.mean()) ** 3).sum())
        if n < 3 or m2 == 0:
            return float("nan")
        return math.sqrt(n) * m3 / m2**1.5
    if op == Operation.KURTOSIS:
        x = np.array(w_vals, dtype=float)
        n = len(x)
        m2 = float(((x - x.mean()) ** 2).sum())
        m4 = float(((x - x.mean()) ** 4).sum())
        if n < 4 or m2 == 0:
            return float("nan")
        return n * m4 / (m2 * m2) - 3.0
    if op == Operation.MIN:
        return min(w_vals)
    if op == Operation.MAX:
        return max(w_vals)
    if op == Operation.FIRST:
        return w_vals[0]
    if op == Operation.LAST:
        mx = max(w_ts)
        for v, t in zip(w_vals, w_ts):
            if t == mx:
                return v
    if op == Operation.LAST_K:
        return list(reversed(w_vals[-k:]))
    if op == Operation.FIRST_K:
        return w_vals[:k]
    if op == Operation.TOP_K:
        return sorted(w_vals, reverse=True)[:k]
    if op == Operation.BOTTOM_K:
        return sorted(w_vals)[:k]
    if op in (Operation.UNIQUE_COUNT, Operation.APPROX_UNIQUE_COUNT):
        return len(set(w_vals))
    if op == Operation.HISTOGRAM:
        counts = pd.Series(w_vals).value_counts()
        d = {str(kk): int(v) for kk, v in counts.items()}
        if part.k is not None and len(d) > part.k:
            top = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[: part.k]
            d = dict(top)
        return d
    if op in (Operation.APPROX_FREQUENT_K, Operation.APPROX_HEAVY_HITTERS_K):
        counts = pd.Series(w_vals).value_counts()
        items = sorted(((str(kk), int(v)) for kk, v in counts.items()), key=lambda kv: (-kv[1], kv[0]))
        return dict(items[:k])
    if op == Operation.APPROX_PERCENTILE:
        return [float(v) for v in np.quantile(np.array(w_vals, dtype=float), _percentiles(part.args))]
    if op == Operation.UNIQUE_TOP_K:
        seen = []
        for v in w_vals:
            if v not in seen:
                seen.append(v)
        return sorted(seen, reverse=True)[:k]
    raise NotImplementedError(op)


def naive_features(
    events: pd.DataFrame,
    queries: pd.DataFrame,
    gb: GroupBy,
    ts_ms_col: str = "ts_ms",
    tie_col: Optional[str] = None,
) -> pd.DataFrame:
    """events/queries: pandas with gb.key_columns + ts_ms_col (+ inputs).
    Returns queries with one extra column per AggregationPart."""
    parts = gb.parts()
    out_rows = []
    sort_cols = [ts_ms_col] + ([tie_col] if tie_col else [])
    for _, q in queries.iterrows():
        key = tuple(q[k] for k in gb.key_columns)
        ev = events
        for kcol, kval in zip(gb.key_columns, key):
            ev = ev[ev[kcol] == kval]
        ev = ev.sort_values(sort_cols, kind="stable")
        T = int(q[ts_ms_col])
        row = {}
        for part in parts:
            if part.window is None:
                m = ev[ts_ms_col] <= T
            else:
                m = (ev[ts_ms_col] >= tail_start(T, part.window)) & (ev[ts_ms_col] <= T)
            w = ev[m]
            w = w[w[part.input_column].notna()]
            if part.bucket is None:
                row[part.output_name] = naive_one(
                    part, list(w[part.input_column]), list(w[ts_ms_col])
                )
            else:
                w = w[w[part.bucket].notna()]
                d = {}
                for bv, sub in w.groupby(part.bucket, sort=False):
                    r = naive_one(part, list(sub[part.input_column]), list(sub[ts_ms_col]))
                    if r is not None:
                        d[str(bv)] = r
                row[part.output_name] = d if d else None
        out_rows.append(row)
    res = queries.reset_index(drop=True).copy()
    for part in parts:
        res[part.output_name] = pd.Series([r[part.output_name] for r in out_rows], dtype=object)
    return res
