"""Batch backfill over MERGEABLE tile IRs — the bounded-memory path for
APPROX_* (and the scalar ops) at KV-state scale.

The default batch engine (pit_join/arrow_engine) finalizes APPROX_* EXACTLY
over the raw events of each window — best accuracy, but per-(key, window)
cost is O(distinct values). This engine instead serves each query point
from per-(key, hop-tile) sketch IRs (HLL / KLL / Misra-Gries,
operators/sketches.py) plus the raw events of the query's head hop — the
same sawtooth lambda rule as the online Fetcher, literally the same code
(online/fetcher.py merge_state), so:

  compute_group_by_approx(spark, gb, q)  ==  Fetcher.fetch(key, T)

for every (key, T), by construction (tested in tests/test_approx_engine.py).

Scale shape (why this exists): per-key state is O(n_tiles x sketch_bytes)
instead of O(distinct values). History is split exactly like the online
upload (upload_batch_state, online/fetcher.py): events older than ANY query
can need per-tile collapse into ONE IR row per key (only unbounded parts
read it — merge_state adds collapsed only for window=None), and only
events in [split, max_T] tile at the finest tail hop. The query x tile join
is therefore bounded by tiles-per-window (+ the query-time span for
unbounded parts), e.g. 168 rows for 7d/1h — NOT by history length. Head
events stay exact. Choose this engine when windows are long and values are
high-cardinality; the exact engine wins when windows are short or finalize
cost is small.

Cardinality contract: the output has exactly one row per query row (same as
the exact engine) — a query whose key has no tiles and no head events gets
a null-feature row, via a bare per-query anchor row in the union.

Reference analogue: GroupByUpload + Flink tiles + the fetcher's
SawtoothOnlineAggregator — the reference has no batch-side sketch backfill
(its batch APPROX_* are CPC/KLL sketches per output row); here both tiers
share one IR format and one merge.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zipline_chronon_spark.api import GroupBy
from zipline_chronon_spark.online import fetcher as fl
from zipline_chronon_spark.operators import pit_join

ROW_ID = pit_join.ROW_ID
TS_COL = pit_join.TS_COL


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


def _build_union(
    spark: SparkSession,
    gb: GroupBy,
    queries: DataFrame,
    row_id: str = ROW_ID,
    query_time_col: str = "ts",
) -> tuple[DataFrame, DataFrame, list[str]]:
    """The serving input frame: per query row, its anchor (kind=-1), its
    in-range tiles (kind=0), its head events (kind=1) and — when an
    unbounded part exists — its ONE collapsed row (kind=2). Split out so
    tests can assert the per-query tile fan-out bound directly.
    Returns (union, events_frame, ir_cols)."""
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
        F.col(row_id).alias(ROW_ID),
    )
    # one tiny driver-side scalar: the query-time span bounds BOTH ends of
    # the event scan (events above max_T can never contribute; events below
    # the split collapse — or drop entirely when no part is unbounded)
    b = q.agg(F.min("__T").alias("lo"), F.max("__T").alias("hi")).collect()[0]
    t_min, t_max = (b["lo"], b["hi"]) if b["lo"] is not None else (0, 0)
    split = _split_point(gb, t_min)
    head_floor = (F.col("__T") / hop).cast("long") * hop

    ev = ev.where(F.col(TS_COL) <= t_max)
    recent = ev.where(F.col(TS_COL) >= split)

    # per-(key, tile) mergeable IRs over [split, t_max] — ONE pass
    tiles = fl._ir_rows(recent, gb, tile_hop=hop)
    ir_cols = [c for c in tiles.columns if c not in keys + ["__tile"]]

    def _nulls(df_schema, cols, prefix=""):
        return [F.lit(None).cast(df_schema[c].dataType).alias(f"{prefix}{c}")
                for c in cols]

    # bare anchor per query row: guarantees one output row per query even
    # when its key has no tiles in range and no head events (the exact
    # engine emits a null-feature row there; inner joins below would drop it)
    q_bare = q.select(
        ROW_ID, "__T", F.lit(-1).alias("__kind"),
        F.lit(None).cast("long").alias("__tile"),
        *_nulls(ev.schema, inputs, "__e_"),
        F.lit(None).cast("long").alias("__e_ts"),
        *_nulls(tiles.schema, ir_cols))

    # query x tiles-below-head join, bounded below by the oldest tail any
    # part can need at this T when every part is windowed (with an unbounded
    # part present all tiles are needed — but they only exist >= split)
    max_w = gb.max_window_millis()
    tcond = tiles["__tile"] < head_floor
    if max_w is not None:
        oldest = [((F.col("__T") - p.window.millis) / p.window.tail_hop_millis())
                  .cast("long") * p.window.tail_hop_millis()
                  for p in parts if p.window is not None]
        tcond = tcond & (tiles["__tile"] >= F.least(*oldest)
                         if len(oldest) > 1 else tiles["__tile"] >= oldest[0])
    qt = (q.join(tiles, keys, "inner").where(tcond)
          .select(ROW_ID, "__T", F.lit(0).alias("__kind"), "__tile",
                  *_nulls(ev.schema, inputs, "__e_"),
                  F.lit(None).cast("long").alias("__e_ts"), *ir_cols))

    # query x head-hop raw events (exact head, ts <= T)
    he = ev.select(*keys, F.col(TS_COL).alias("__e_ts"),
                   *[F.col(c).alias(f"__e_{c}") for c in inputs])
    qh = (q.join(he, keys, "inner")
          .where((F.col("__e_ts") >= head_floor) & (F.col("__e_ts") <= F.col("__T")))
          .select(ROW_ID, "__T", F.lit(1).alias("__kind"),
                  F.lit(None).cast("long").alias("__tile"),
                  *[F.col(f"__e_{c}") for c in inputs], "__e_ts",
                  *_nulls(tiles.schema, ir_cols)))

    union = q_bare.unionByName(qt).unionByName(qh)

    # collapsed rows only exist (and are only read by merge_state) for
    # unbounded parts; every key contributes at most ONE such row per query
    if has_unbounded:
        old = ev.where(F.col(TS_COL) < split)
        collapsed = fl._ir_rows(old, gb)
        qc = (q.join(collapsed, keys, "inner")
              .select(ROW_ID, "__T", F.lit(2).alias("__kind"),
                      F.lit(None).cast("long").alias("__tile"),
                      *_nulls(ev.schema, inputs, "__e_"),
                      F.lit(None).cast("long").alias("__e_ts"), *ir_cols))
        union = union.unionByName(qc)

    return union, ev, ir_cols


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
    union, ev, ir_cols = _build_union(spark, gb, queries, row_id, query_time_col)
    if num_partitions:
        union = union.repartition(num_partitions, ROW_ID)

    _, part_types, out_schema = pit_join._output_schema(gb, dict(
        (f.name, f.dataType) for f in ev.schema.fields), [])
    out_fields = [f.name for f in out_schema.fields if f.name != ROW_ID]

    def _clean(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        return v

    def serve(pdf: pd.DataFrame) -> pd.DataFrame:
        # column-wise extraction (one C-level tolist per column), then a
        # per-query merge_state call — the merge itself is the shared
        # online code path, per query point by design
        kind = pdf["__kind"].to_numpy()
        tile = pdf["__tile"].tolist()
        e_ts = pdf["__e_ts"].tolist()
        tcols = {c: pdf[c].tolist() for c in ir_cols}
        ecols = {c: pdf[f"__e_{c}"].tolist() for c in inputs}
        Ts = pdf["__T"].tolist()
        groups = pdf.groupby(ROW_ID, sort=False).indices
        rows = []
        for rid, idxs in groups.items():
            T = int(Ts[idxs[0]])
            tiles_list, events, collapsed_ir = [], [], None
            for i in idxs:
                k = kind[i]
                if k == 0:
                    ir = {c: tcols[c][i] for c in ir_cols
                          if _clean(tcols[c][i]) is not None}
                    tiles_list.append((int(tile[i]), ir))
                elif k == 1:
                    events.append({"ts": int(e_ts[i]),
                                   **{c: _clean(ecols[c][i]) for c in inputs}})
                elif k == 2:
                    collapsed_ir = {c: tcols[c][i] for c in ir_cols
                                    if _clean(tcols[c][i]) is not None}
            merged = fl.merge_state(parts, collapsed_ir, tiles_list, events, T)
            rows.append({ROW_ID: rid, **merged})
        out = pd.DataFrame(rows, columns=[ROW_ID, *out_fields])
        # FREQUENT_K/HEAVY_HITTERS return [(value, count)] -> dict for the
        # map output column; percentiles are already lists
        for f_ in out_schema.fields:
            if f_.name == ROW_ID:
                continue
            if f_.dataType.typeName() == "map":
                out[f_.name] = out[f_.name].map(
                    lambda v: dict(v) if isinstance(v, list) else v)
        return out

    return union.groupBy(ROW_ID).applyInPandas(
        lambda _key, pdf: serve(pdf), schema=out_schema)
