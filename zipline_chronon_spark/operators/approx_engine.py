"""Batch backfill over MERGEABLE tile IRs — the bounded-memory path for
APPROX_* (and the scalar ops) at KV-state scale.

The default batch engine (pit_join/arrow_engine) finalizes APPROX_* EXACTLY
over the raw events of each window — best accuracy, but per-(key, window)
cost is O(distinct values). This engine instead serves each query point
from per-(key, hop-tile) sketch IRs (HLL / KLL / Misra-Gries,
operators/sketches.py) plus the raw events of the query's head hop — the
same sawtooth lambda rule as the online Fetcher (online/fetcher.py
merge_state/finalize_part semantics), so:

  compute_group_by_approx(spark, gb, q)  ==  Fetcher.fetch(key, T)

for every (key, T), by construction (tested in tests/test_approx_engine.py).

Scale shape (the round-5 redesign): there is NO query x tile join. Tiles,
head events and query rows are shuffled ONCE, keyed by the GroupBy keys,
and served cogrouped: within each key, queries are answered in time order
against the key's tile/event arrays with

  - prefix-sum difference arrays for SUM / COUNT / AVERAGE,
  - monotone-deque sliding extremes for MIN / MAX,
  - next/prev-non-null index hops for FIRST / LAST,
  - a two-stack sliding-window merge (SWAG) for sketch parts: both window
    endpoints are monotone in query time, so each tile sketch is
    deserialized ONCE and merged O(1) amortized times per key, instead of
    once per (query, tile) pair.

Shuffle volume is therefore O(tiles + head_events + queries) — the old
join-based plan moved O(queries x tiles_per_window) rows (a 7d/1h window =
168x fan-out, each row carrying sketch blobs) and re-deserialized every
blob per query. Head events are pruned to the hops some query actually
touches (a (key, hop) semi-join), so the event shuffle is bounded by the
query head hops, not the full history. For very SPARSE query sets over
very WIDE time spans the old join shape can move fewer event rows; the
dense-backfill case (every event becomes a query) is what this engine is
for, and there the cogroup shape wins by the full fan-out factor.

Skew: a single hot key's tiles+events+queries land in one task. The exact
engine's hot-key time-slice salting seam (pit_join) applies here
unchanged if needed — tiles/queries can be sliced by time range with
boundary tiles duplicated per slice; not wired up by default.

Cardinality contract: the output has exactly one row per query row (same
as the exact engine) — query rows drive the output, so a key with no
tiles and no head events still yields a null-feature row.

Reference analogue: GroupByUpload + Flink tiles + the fetcher's
SawtoothOnlineAggregator — the reference has no batch-side sketch backfill
(its batch APPROX_* are CPC/KLL sketches per output row); here both tiers
share one IR format and one finalize rule.
"""

from __future__ import annotations

import collections
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zipline_chronon_spark.api import GroupBy, Operation
from zipline_chronon_spark.online import fetcher as fl
from zipline_chronon_spark.operators import kernels, pit_join
from zipline_chronon_spark.operators.sketches import hash64

ROW_ID = pit_join.ROW_ID
TS_COL = pit_join.TS_COL

# union row kinds, in within-key sort order
K_TILE, K_EVENT, K_COLLAPSED, K_QUERY = 0, 1, 2, 3


def _split_point(gb: GroupBy, t_min: int) -> int:
    """Oldest millisecond any query at T >= t_min can need at TILE
    granularity — upload_batch_state's tile_floor evaluated at the earliest
    query time. Below it, windowed parts see nothing (their tails are
    higher) and unbounded parts need only a merged total: ONE collapsed IR
    row per key."""
    wfloor = fl._tile_floor(gb, t_min)
    if wfloor is not None:
        return wfloor
    hop = fl._tile_hop(gb) or 86_400_000
    return (t_min // hop) * hop  # unbounded-only: collapse below min head


def _build_frames(
    spark: SparkSession,
    gb: GroupBy,
    queries: DataFrame,
    row_id: str = ROW_ID,
    query_time_col: str = "ts",
) -> tuple[DataFrame, DataFrame, list[str]]:
    """The serving input frame, keyed by the GroupBy keys (NO per-query
    fan-out): each (key, tile) IR appears ONCE (kind=0), each queried head
    event once (kind=1), at most one collapsed row per key (kind=2), and
    one row per query (kind=3). Split out so tests can assert the shuffle
    shape directly. Returns (union, events_frame, ir_cols)."""
    parts = fl._parts(gb)
    keys = list(gb.key_columns)
    hop = fl._tile_hop(gb) or 86_400_000  # unbounded-only: any fixed tiling

    ev = pit_join.events_df(spark, gb)
    inputs = sorted({p.input_column for p in parts})
    has_unbounded = any(p.window is None for p in parts)

    q_dt = queries.select(F.expr(query_time_col).alias("t")).schema[0].dataType
    q = queries.select(
        *keys,
        pit_join._time_to_millis(F.expr(query_time_col), q_dt).alias("__T"),
        F.col(row_id).cast("long").alias(ROW_ID),
    )
    # one tiny driver-side scalar: the query-time span bounds BOTH ends of
    # the event scan (events above max_T can never contribute; events below
    # the split collapse — or drop entirely when no part is unbounded)
    b = q.agg(F.min("__T").alias("lo"), F.max("__T").alias("hi")).collect()[0]
    t_min, t_max = (b["lo"], b["hi"]) if b["lo"] is not None else (0, 0)
    split = _split_point(gb, t_min)

    ev = ev.where(F.col(TS_COL) <= t_max)
    recent = ev.where(F.col(TS_COL) >= split)

    qkeys = q.select(*keys).distinct()

    # per-(key, tile) mergeable IRs over [split, t_max] — ONE pass, then
    # pruned to queried keys (mirrors the exact engine's semi-join prefilter)
    tiles = fl._ir_rows(recent, gb, tile_hop=hop).join(qkeys, keys, "leftsemi")
    ir_cols = [c for c in tiles.columns if c not in keys + ["__tile"]]

    def _nulls(df_schema, cols, prefix=""):
        return [F.lit(None).cast(df_schema[c].dataType).alias(f"{prefix}{c}")
                for c in cols]

    zero_l = F.lit(0).cast("long")
    neg1_l = F.lit(-1).cast("long")  # ROW_ID stays null-free int64 (2^53 rule)

    t_u = tiles.select(
        *keys, F.lit(K_TILE).alias("__kind"), F.col("__tile").alias("__t"),
        neg1_l.alias(ROW_ID), *ir_cols, *_nulls(ev.schema, inputs, "__e_"))

    # head events: only (key, hop) cells some query actually touches —
    # [head_floor(T), T] per query is exact-head territory; everything
    # below head_floor is covered by tiles
    q_hop = (F.col("__T") / hop).cast("long") * hop
    qhops = q.select(*keys, q_hop.alias("__hop")).distinct()
    head_lo = (t_min // hop) * hop
    he = (ev.where(F.col(TS_COL) >= head_lo)
            .withColumn("__hop", (F.col(TS_COL) / hop).cast("long") * hop)
            .join(qhops, keys + ["__hop"], "leftsemi"))
    e_u = he.select(
        *keys, F.lit(K_EVENT).alias("__kind"), F.col(TS_COL).alias("__t"),
        neg1_l.alias(ROW_ID), *_nulls(tiles.schema, ir_cols),
        *[F.col(c).alias(f"__e_{c}") for c in inputs])

    q_u = q.select(
        *keys, F.lit(K_QUERY).alias("__kind"), F.col("__T").alias("__t"),
        ROW_ID, *_nulls(tiles.schema, ir_cols),
        *_nulls(ev.schema, inputs, "__e_"))

    union = t_u.unionByName(e_u).unionByName(q_u)

    # collapsed rows only exist (and are only read) for unbounded parts;
    # every key contributes at most ONE such row TOTAL — not per query
    if has_unbounded:
        old = ev.where(F.col(TS_COL) < split)
        collapsed = fl._ir_rows(old, gb).join(qkeys, keys, "leftsemi")
        c_u = collapsed.select(
            *keys, F.lit(K_COLLAPSED).alias("__kind"), zero_l.alias("__t"),
            neg1_l.alias(ROW_ID), *ir_cols, *_nulls(ev.schema, inputs, "__e_"))
        union = union.unionByName(c_u)

    return union, ev, ir_cols


# ---------------------------------------------------------------------------
# per-key range kernels
# ---------------------------------------------------------------------------

def _prefix(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(prefix sums with nan->0, prefix non-nan counts), length n+1."""
    ok = ~np.isnan(x)
    s = np.empty(len(x) + 1)
    s[0] = 0.0
    np.cumsum(np.where(ok, x, 0.0), out=s[1:])
    c = np.empty(len(x) + 1, dtype=np.int64)
    c[0] = 0
    np.cumsum(ok, out=c[1:])
    return s, c


def _next_valid(valid: np.ndarray) -> np.ndarray:
    """nxt[i] = smallest j >= i with valid[j], else n."""
    n = len(valid)
    idx = np.where(valid, np.arange(n), n)
    return np.minimum.accumulate(idx[::-1])[::-1]


def _prev_valid(valid: np.ndarray) -> np.ndarray:
    """prv[i] = largest j <= i with valid[j], else -1."""
    idx = np.where(valid, np.arange(len(valid)), -1)
    return np.maximum.accumulate(idx)


class _SlideExtreme:
    """Range min/max over [lo, hi) for MONOTONE lo and hi (amortized O(1)
    per element; works for any orderable dtype incl. strings, unlike a
    float RMQ table)."""

    __slots__ = ("vals", "valid", "is_min", "dq", "lo", "hi")

    def __init__(self, vals: np.ndarray, valid: np.ndarray, is_min: bool):
        self.vals, self.valid, self.is_min = vals, valid, is_min
        self.dq: collections.deque = collections.deque()
        self.lo = 0
        self.hi = 0

    def query(self, lo: int, hi: int):
        vals, dq = self.vals, self.dq
        while self.hi < hi:
            i = self.hi
            if self.valid[i]:
                v = vals[i]
                if self.is_min:
                    while dq and vals[dq[-1]] >= v:
                        dq.pop()
                else:
                    while dq and vals[dq[-1]] <= v:
                        dq.pop()
                dq.append(i)
            self.hi += 1
        if lo > self.lo:
            self.lo = lo
        while dq and dq[0] < self.lo:
            dq.popleft()
        return vals[dq[0]] if dq else None


class _SwagSketch:
    """Two-stack sliding-window aggregation over a key's tile sketches:
    window endpoints are monotone in query time, so each tile is merged
    O(1) amortized times total (once into the back aggregate, once during
    a front flip) — NOT once per query. ``items`` entries are never
    mutated; answers are fresh copies."""

    __slots__ = ("items", "front", "back", "back_agg", "lo", "hi")

    def __init__(self, items: list):
        self.items = items
        self.front: list = []   # suffix aggregates; pop() evicts the oldest
        self.back: list = []    # indices newer than everything in front
        self.back_agg = None
        self.lo = 0
        self.hi = 0

    def advance(self, lo: int, hi: int) -> None:
        items = self.items
        while self.hi < hi:
            it = items[self.hi]
            if it is not None:
                if self.back_agg is None:
                    self.back_agg = it.copy()
                else:
                    self.back_agg.merge(it)
            self.back.append(self.hi)
            self.hi += 1
        while self.lo < lo:
            if not self.front:
                agg = None  # suffix agg over items newer than position i
                for i in reversed(self.back):
                    if items[i] is not None:
                        if agg is None:
                            agg = items[i].copy()
                        else:
                            agg = agg.copy().merge(items[i])
                    self.front.append(agg)  # aliasing OK: entries read-only
                self.back = []
                self.back_agg = None
            if self.front:
                self.front.pop()
            self.lo += 1

    def window_agg(self):
        """Fresh sketch covering [lo, hi), or None if nothing valid."""
        f = self.front[-1] if self.front else None
        if f is None and self.back_agg is None:
            return None
        out = f.copy() if f is not None else self.back_agg.copy()
        if f is not None and self.back_agg is not None:
            out.merge(self.back_agg)
        return out


class _PrefixSketch:
    """Running (unbounded-window) merge: lo is pinned at 0, hi monotone."""

    __slots__ = ("items", "run", "hi")

    def __init__(self, items: list, seed=None):
        self.items = items
        self.run = seed.copy() if seed is not None else None
        self.hi = 0

    def advance(self, hi: int) -> None:
        while self.hi < hi:
            it = self.items[self.hi]
            if it is not None:
                if self.run is None:
                    self.run = it.copy()
                else:
                    self.run.merge(it)
            self.hi += 1

    def window_agg(self):
        return None if self.run is None else self.run.copy()


def _finalize_sketch(op: Operation, sk, k: int, nfp: bool, pcts):
    if op == Operation.APPROX_UNIQUE_COUNT:
        return int(round(sk.estimate()))
    if op in fl._FREQ:
        return dict(sk.top_k(k, no_false_positives=nfp))
    return sk.quantiles(pcts)


# group-boundary mask shared with the tile builder (fetcher._group_starts):
# factorize-based, so None/NaN/pd.NA key rows are isolated — null keys match
# nothing, and such query rows correctly get null features
_group_starts = fl._group_starts


def _make_group_server(parts, inputs, out_fields, keys):
    """serve(pdf) for one sorted batch of whole key groups: splits each key
    into (tiles | events | collapsed | queries) slices and answers the
    key's queries with the range kernels above."""

    def _num(pdf, col):
        return pd.to_numeric(pdf[col], errors="coerce").to_numpy(
            dtype=np.float64, copy=False)

    def _obj(pdf, col):
        return pdf[col].to_numpy(dtype=object)

    keyed = [(p, p.output_name, p.operation, p.input_column) for p in parts]
    hop = None
    for p in parts:
        if p.window is not None:
            h = p.window.tail_hop_millis()
            hop = h if hop is None else min(hop, h)
    hop = hop or 86_400_000

    def serve(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        kind = pdf["__kind"].to_numpy()
        t_all = pdf["__t"].to_numpy(dtype=np.int64)
        rid_all = pdf[ROW_ID].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(_group_starts(pdf[keys]))
        ends = np.r_[starts[1:], n]

        # batch-level column caches (lazy, one C-level conversion each)
        num_cache: dict = {}
        obj_cache: dict = {}
        numf_cache: dict = {}

        def num(col):
            if col not in num_cache:
                num_cache[col] = _num(pdf, col)
            return num_cache[col]

        def obj(col):
            if col not in obj_cache:
                obj_cache[col] = _obj(pdf, col)
            return obj_cache[col]

        def numf(col):
            """(values, valid) for NATIVELY numeric columns, else None —
            the dtype check keeps string/object columns on the exact
            object-comparison path (pd.to_numeric would silently coerce
            numeric-looking strings and change MIN/MAX ordering)."""
            if col not in numf_cache:
                ser = pdf[col]
                if pd.api.types.is_integer_dtype(ser):
                    v = ser.to_numpy(dtype=np.int64)
                    numf_cache[col] = (v, np.ones(len(v), dtype=bool))
                elif pd.api.types.is_float_dtype(ser):
                    v = ser.to_numpy(dtype=np.float64)
                    numf_cache[col] = (v, ~np.isnan(v))
                else:
                    numf_cache[col] = None
            return numf_cache[col]

        out_rid: list = []
        out_cols: dict = {nm: [] for _, nm, _, _ in keyed}

        for s, e in zip(starts, ends):
            ks = kind[s:e]
            b1 = s + np.searchsorted(ks, K_EVENT)
            b2 = s + np.searchsorted(ks, K_COLLAPSED)
            b3 = s + np.searchsorted(ks, K_QUERY)
            if b3 == e:
                continue  # no queries in this key (shouldn't happen)
            T = t_all[b3:e]
            nq = e - b3
            out_rid.append(rid_all[b3:e])

            tile_ts = t_all[s:b1]
            e_ts = t_all[b1:b2]
            col_i = b2 if b2 < b3 else -1  # index of the collapsed row

            head = (T // hop) * hop
            hi_t_head = np.searchsorted(tile_ts, head)
            e_hi = np.searchsorted(e_ts, T, side="right")
            e_lo_head = np.searchsorted(e_ts, head)

            for p, nm, op, col in keyed:
                if p.window is None:
                    lo_t = None
                    hi_t = hi_t_head
                    e_lo = e_lo_head
                else:
                    w, th = p.window.millis, p.window.tail_hop_millis()
                    tail = ((T - w) // th) * th
                    lo_t = np.searchsorted(tile_ts, tail)
                    hi_t = np.maximum(hi_t_head, lo_t)
                    e_lo = np.minimum(
                        np.searchsorted(e_ts, np.maximum(tail, head)), e_hi)

                # collapsed (below-split) state feeds ONLY unbounded parts
                # (merge_state rule: windowed tails are above the split)
                ci = col_i if p.window is None else -1
                if op in fl.SKETCH_OPS:
                    out_cols[nm].append(_serve_sketch(
                        p, nm, op, col, s, b1, b2, ci, lo_t, hi_t,
                        e_lo, e_hi, nq, obj, pdf))
                elif op in (Operation.SUM, Operation.AVERAGE, Operation.COUNT):
                    out_cols[nm].append(_serve_additive(
                        nm, op, col, s, b1, b2, ci, lo_t, hi_t,
                        e_lo, e_hi, nq, num, obj))
                elif op in (Operation.MIN, Operation.MAX):
                    out_cols[nm].append(_serve_extreme(
                        nm, op, col, s, b1, b2, ci, lo_t, hi_t,
                        e_lo, e_hi, nq, obj, numf))
                else:  # FIRST / LAST
                    out_cols[nm].append(_serve_first_last(
                        nm, op, col, s, b1, b2, ci, lo_t, hi_t,
                        e_lo, e_hi, nq, num, obj, p.window is None))

        if not out_rid:
            return pd.DataFrame({c: [] for c in [ROW_ID, *out_fields]},
                                columns=[ROW_ID, *out_fields])
        data = {ROW_ID: np.concatenate(out_rid)}
        for nm in out_cols:
            data[nm] = np.concatenate(out_cols[nm])
        return pd.DataFrame({c: data[c] for c in [ROW_ID, *out_fields]},
                            columns=[ROW_ID, *out_fields])

    def _rng(lo_t, nq):
        return np.zeros(nq, dtype=np.int64) if lo_t is None else lo_t

    def _serve_additive(nm, op, col, s, b1, b2, col_i, lo_t, hi_t,
                        e_lo, e_hi, nq, num, obj):
        lo_t = _rng(lo_t, nq)
        csum = ccnt = None
        if op in (Operation.SUM, Operation.AVERAGE):
            ts_, tc_ = _prefix(num(f"{nm}__sum")[s:b1])
            es_, ec_ = _prefix(num(f"__e_{col}")[b1:b2])
            tot = (ts_[hi_t] - ts_[lo_t]) + (es_[e_hi] - es_[e_lo])
            have = (tc_[hi_t] - tc_[lo_t]) + (ec_[e_hi] - ec_[e_lo])
            if col_i >= 0:
                cs = num(f"{nm}__sum")[col_i]
                if not np.isnan(cs):
                    tot = tot + cs
                    have = have + 1
            csum, chave = tot, have
        if op in (Operation.COUNT, Operation.AVERAGE):
            tcv = num(f"{nm}__count")[s:b1]
            tp = np.empty(b1 - s + 1)
            tp[0] = 0.0
            np.cumsum(np.where(np.isnan(tcv), 0.0, tcv), out=tp[1:])
            if op == Operation.COUNT:
                # null-test on the raw objects: COUNT works on any dtype
                eok = ~pd.isna(obj(f"__e_{col}")[b1:b2])
                ec_ = np.empty(b2 - b1 + 1, dtype=np.int64)
                ec_[0] = 0
                np.cumsum(eok, out=ec_[1:])
            else:
                _, ec_ = _prefix(num(f"__e_{col}")[b1:b2])
            cnt = (tp[hi_t] - tp[lo_t]) + (ec_[e_hi] - ec_[e_lo])
            if col_i >= 0:
                cc = num(f"{nm}__count")[col_i]
                if not np.isnan(cc):
                    cnt = cnt + cc
            ccnt = cnt
        out = np.full(nq, None, dtype=object)
        if op == Operation.SUM:
            m = chave > 0
            out[m] = csum[m]
        elif op == Operation.COUNT:
            m = ccnt > 0
            out[m] = ccnt[m].astype(np.int64)
        else:  # AVERAGE
            m = ccnt > 0
            out[m] = csum[m] / ccnt[m]
        return out

    def _serve_extreme(nm, op, col, s, b1, b2, col_i, lo_t, hi_t,
                       e_lo, e_hi, nq, obj, numf):
        lo_t = _rng(lo_t, nq)
        suffix = "min" if op == Operation.MIN else "max"
        is_min = op == Operation.MIN
        t_nf = numf(f"{nm}__{suffix}")
        e_nf = numf(f"__e_{col}")
        if t_nf is not None and e_nf is not None:
            # numeric fast path: O(n log n) sparse-table build + O(1) range
            # min/max per query (kernels._SparseTable, the exact engine's
            # RMQ) replaces the per-query deque loop. Invalid positions are
            # filled with the op identity so they can never win a range;
            # emptiness is decided by separate validity prefix counts.
            tvv, tok = t_nf[0][s:b1], t_nf[1][s:b1]
            evv_, eok = e_nf[0][b1:b2], e_nf[1][b1:b2]
            is_int = tvv.dtype == np.int64 and evv_.dtype == np.int64
            if is_int:
                fill = np.iinfo(np.int64).max if is_min else np.iinfo(np.int64).min
            else:
                tvv, evv_ = tvv.astype(np.float64), evv_.astype(np.float64)
                fill = np.inf if is_min else -np.inf
            npop = np.minimum if is_min else np.maximum
            dt = tvv.dtype

            def range_ext(vals, ok, lo, hi):
                res = np.full(nq, fill, dtype=dt)
                has = np.zeros(nq, dtype=bool)
                if len(vals):
                    v = np.where(ok, vals, fill)
                    st = kernels._SparseTable(v, npop)
                    r = st.query(lo, hi)
                    m = hi > lo
                    res[m] = r[m]
                    cnt = np.zeros(len(ok) + 1, dtype=np.int64)
                    np.cumsum(ok, out=cnt[1:])
                    has = (cnt[hi] - cnt[lo]) > 0
                return res, has

            rt, has_t = range_ext(tvv, tok, lo_t, hi_t)
            re_, has_e = range_ext(evv_, eok, e_lo, e_hi)
            res = npop(rt, re_)
            ok = has_t | has_e
            if col_i >= 0:
                c = t_nf[0][col_i]
                if t_nf[1][col_i]:
                    res = npop(res, c)
                    ok |= True
            out = np.full(nq, None, dtype=object)
            out[ok] = res[ok]
            return out
        # object/string path: amortized deque sweep (orderable any-dtype)
        tv = obj(f"{nm}__{suffix}")[s:b1]
        evv = obj(f"__e_{col}")[b1:b2]
        t_ext = _SlideExtreme(tv, ~pd.isna(tv), is_min)
        e_ext = _SlideExtreme(evv, ~pd.isna(evv), is_min)
        cv = None
        if col_i >= 0:
            c = obj(f"{nm}__{suffix}")[col_i]
            cv = None if pd.isna(c) else c
        out = np.full(nq, None, dtype=object)
        pick = min if is_min else max
        for i in range(nq):
            cands = [v for v in (t_ext.query(lo_t[i], hi_t[i]),
                                 e_ext.query(e_lo[i], e_hi[i]), cv)
                     if v is not None]
            if cands:
                out[i] = pick(cands)
        return out

    def _serve_first_last(nm, op, col, s, b1, b2, col_i, lo_t, hi_t,
                          e_lo, e_hi, nq, num, obj, unbounded):
        lo_t = _rng(lo_t, nq)
        t_ts = num(f"{nm}__ts")[s:b1]
        t_v = obj(f"{nm}__v")[s:b1]
        evv = obj(f"__e_{col}")[b1:b2]
        cv = None
        if col_i >= 0 and unbounded:
            cts = num(f"{nm}__ts")[col_i]
            if not np.isnan(cts):
                cv = obj(f"{nm}__v")[col_i]
        out = np.full(nq, None, dtype=object)
        t_valid = ~np.isnan(t_ts)
        e_valid = ~pd.isna(evv)
        nt, ne = b1 - s, b2 - b1
        if op == Operation.FIRST:
            # tiles are strictly older than head events, collapsed older still
            if cv is not None:
                out[:] = cv  # collapsed (oldest non-null) wins everywhere
            else:
                nxt_t = np.r_[_next_valid(t_valid), nt]
                nxt_e = np.r_[_next_valid(e_valid), ne]
                ti = nxt_t[lo_t]
                tm = ti < hi_t
                ei = nxt_e[e_lo]
                em = ei < e_hi
                out[em] = evv[ei[em]]
                out[tm] = t_v[ti[tm]]  # tiles (older) override events
        else:  # LAST: head events newest, then tiles, then collapsed —
            # vectorized gathers (prev-valid index per range end), assigned
            # lowest-precedence first so later masks override
            if cv is not None:
                out[:] = cv
            if nt:
                prv_t = _prev_valid(t_valid)
                jt = prv_t[np.maximum(hi_t, 1) - 1]
                tm = (hi_t > lo_t) & (jt >= lo_t)
                out[tm] = t_v[jt[tm]]
            if ne:
                prv_e = _prev_valid(e_valid)
                je = prv_e[np.maximum(e_hi, 1) - 1]
                em = (e_hi > e_lo) & (je >= e_lo)
                out[em] = evv[je[em]]
        return out

    def _serve_sketch(p, nm, op, col, s, b1, b2, col_i, lo_t, hi_t,
                      e_lo, e_hi, nq, obj, pdf):
        blobs = obj(f"{nm}__sk")[s:b1]
        cls = fl._sketch_cls(op)
        items = [None if pd.isna(b) else cls.from_bytes(bytes(b))
                 for b in blobs]
        seed = None
        if col_i >= 0 and p.window is None:
            cb = obj(f"{nm}__sk")[col_i]
            if not pd.isna(cb):
                seed = cls.from_bytes(bytes(cb))
        if p.window is None:
            slider = _PrefixSketch(items, seed)
        else:
            slider = _SwagSketch(items)

        evv = obj(f"__e_{col}")[b1:b2]
        e_valid = ~pd.isna(evv)
        vpos = np.flatnonzero(e_valid)
        if op == Operation.APPROX_UNIQUE_COUNT:
            hv = hash64(evv[vpos]) if len(vpos) else np.empty(0, np.uint64)
        elif op == Operation.APPROX_PERCENTILE:
            fv = pd.to_numeric(pd.Series(evv[vpos]), errors="coerce").to_numpy(
                dtype=np.float64) if len(vpos) else np.empty(0)
        k = p.k or 1
        nfp = op == Operation.APPROX_HEAVY_HITTERS_K
        pcts = None
        if op == Operation.APPROX_PERCENTILE:
            pcts = [float(x) for x in
                    p.args.get("percentiles", "[0.5]").strip("[] ").split(",")]

        a = np.searchsorted(vpos, e_lo)
        b = np.searchsorted(vpos, e_hi)
        lo_eff = _rng(lo_t if p.window is not None else None, nq)
        # batched segment sweep (round-5 verdict item #2): queries sharing
        # (tile window, head-slice start) — constant within one hop — are
        # served from ONE window_agg copy; head events append incrementally
        # (b is monotone) and finalize is read-only, so per-query cost drops
        # from copy+merge+update to update-delta+finalize. Result content is
        # identical: within a segment a[i] is constant, so the cumulative
        # updates [a, b_i) equal the old per-query fresh-copy updates.
        seg_start = np.zeros(nq, dtype=bool)
        if nq:
            seg_start[0] = True
            seg_start[1:] = ((lo_eff[1:] != lo_eff[:-1])
                             | (hi_t[1:] != hi_t[:-1]) | (a[1:] != a[:-1]))
        starts = np.flatnonzero(seg_start)
        ends = np.r_[starts[1:], nq]
        out = np.full(nq, None, dtype=object)
        for s0, s1 in zip(starts, ends):
            if p.window is None:
                slider.advance(int(hi_t[s0]))
            else:
                slider.advance(int(lo_eff[s0]), int(hi_t[s0]))
            work = slider.window_agg()  # one fresh copy per segment
            bprev = int(a[s0])
            for i in range(s0, s1):
                bi = int(b[i])
                if bi > bprev:
                    if work is None:
                        work = fl._new_sketch(op)
                    if op == Operation.APPROX_UNIQUE_COUNT:
                        work.update_hashes(hv[bprev:bi])
                    elif op == Operation.APPROX_PERCENTILE:
                        work.update(fv[bprev:bi])
                    else:
                        work.update(list(evv[vpos[bprev:bi]]))
                    bprev = bi
                if work is not None:
                    out[i] = _finalize_sketch(op, work, k, nfp, pcts)
        return out

    return serve


def compute_group_by_approx(
    spark: SparkSession,
    gb: GroupBy,
    queries: DataFrame,
    row_id: str = ROW_ID,
    query_time_col: str = "ts",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Enrich each query row (keys…, ts) with gb's features served from
    mergeable tile IRs + exact raw head events. Supports the scalar ops
    (SUM/COUNT/AVERAGE/MIN/MAX/FIRST/LAST) and all APPROX_* ops, windowed
    and unbounded. Returns (row_id, feature columns…) with the SAME output
    schema AND row cardinality as the exact engine."""
    parts = fl._parts(gb)
    inputs = sorted({p.input_column for p in parts})
    keys = list(gb.key_columns)
    union, ev, ir_cols = _build_frames(spark, gb, queries, row_id,
                                       query_time_col)

    _, part_types, out_schema = pit_join._output_schema(gb, dict(
        (f.name, f.dataType) for f in ev.schema.fields), [])
    out_fields = [f.name for f in out_schema.fields if f.name != ROW_ID]

    serve = _make_group_server(parts, inputs, out_fields, keys)

    # ONE shuffle keyed by the GroupBy keys; each key's rows arrive sorted
    # (tiles | events | collapsed | queries, each time-ordered) and are
    # served whole via group-boundary rechunking with a carry (same pattern
    # as arrow_engine.make_arrow_runner)
    nparts = (num_partitions
              or union.sparkSession.sparkContext.defaultParallelism)
    arranged = union.repartition(nparts, *keys).sortWithinPartitions(
        *keys, "__kind", "__t")

    def runner(batches):
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            n = len(pdf)
            if n == 0:
                continue
            gs = np.flatnonzero(_group_starts(pdf[keys]))
            last_start = int(gs[-1])
            if last_start == 0:  # one group so far: may continue next batch
                carry = pdf
                continue
            carry = pdf.iloc[last_start:]
            yield serve(pdf.iloc[:last_start])
        if carry is not None and len(carry):
            yield serve(carry)

    return arranged.mapInPandas(runner, schema=out_schema)
