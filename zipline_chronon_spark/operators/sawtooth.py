"""Sawtooth window index math — the point-in-time window rule, vectorized.

The reference's invariant (the spec — see NaiveAggregator test oracle,
aggregator/src/test/.../NaiveAggregator.scala:42-48; tail rounding
SawtoothAggregator.scala:106; hop assignment HopsAggregator.scala:150-158;
inclusive-head boundary SawtoothAggregatorTest.scala:177-216):

    event e contributes to the feature at query time T for window w iff
        round(T - w.millis, tailHop(w)) <= e.ts <= T
    where round(x, h) = (x // h) * h and tailHop is 5m / 1h / 1d by window
    size (Resolution.scala:38-48). Unbounded window: e.ts <= T.

The reference implements this with per-hop partial IRs stitched per query
(SawtoothAggregator). Our rebuild reaches the identical semantics with a
different, numpy-native mechanism: events sorted by ts once per group, then
``searchsorted`` produces [lo, hi) bounds per query in O((n+q) log n), and
prefix/RMQ kernels (kernels.py) answer every window from the same sorted
array — the "sub-window sharing" the hops provide falls out of sharing the
sorted array + prefix structures across all windows.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from zipline_chronon_spark.api import Window


def window_bounds(
    event_ts: np.ndarray,
    query_ts: np.ndarray,
    window: Optional[Window],
) -> tuple[np.ndarray, np.ndarray]:
    """Return per-query [lo, hi) bounds into the sorted event_ts array.

    hi: first index with ts > T          (head inclusive: ts <= T)
    lo: first index with ts >= sawtooth tail (tail inclusive)
    """
    hi = np.searchsorted(event_ts, query_ts, side="right")
    if window is None:
        lo = np.zeros(len(query_ts), dtype=hi.dtype)
    else:
        hop = window.tail_hop_millis()
        tail = ((query_ts - window.millis) // hop) * hop
        lo = np.searchsorted(event_ts, tail, side="left")
        lo = np.minimum(lo, hi)
    return lo, hi
