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
instead of O(distinct values); tiles build in ONE groupBy(keys, tile) pass
(map-side combinable for scalars, one grouped-Arrow pass for sketches);
each query row then joins the tiles inside its largest window
(|q| x tiles_per_window rows, e.g. 168 for 7d/1h) plus its head-hop raw
events. Choose it when windows are long and values are high-cardinality;
the exact engine wins when windows are short or finalize cost is small.

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
    schema as the exact engine."""
    parts = fl._parts(gb)
    keys = list(gb.key_columns)
    hop = fl._tile_hop(gb) or 86_400_000  # unbounded-only: any fixed tiling

    ev = pit_join.events_df(spark, gb)
    inputs = sorted({p.input_column for p in parts})

    q_dt = queries.select(F.expr(query_time_col).alias("t")).schema[0].dataType
    q = queries.select(
        *keys,
        pit_join._time_to_millis(F.expr(query_time_col), q_dt).alias("__T"),
        F.col(row_id).alias(ROW_ID),
    )
    head_floor = (F.col("__T") / hop).cast("long") * hop

    # per-(key, tile) mergeable IRs — ONE pass over events
    tiles = fl._ir_rows(ev, gb, tile_hop=hop)
    ir_cols = [c for c in tiles.columns if c not in keys + ["__tile"]]

    # query x full-tiles-below-head join, bounded below by the oldest tail
    # any part can need at this T (unbounded part -> no lower bound)
    max_w = gb.max_window_millis()
    tcond = tiles["__tile"] < head_floor
    if max_w is not None:
        oldest = [((F.col("__T") - p.window.millis) / p.window.tail_hop_millis())
                  .cast("long") * p.window.tail_hop_millis()
                  for p in parts if p.window is not None]
        tcond = tcond & (tiles["__tile"] >= F.least(*oldest)
                         if len(oldest) > 1 else tiles["__tile"] >= oldest[0])
    qt = q.join(tiles, keys, "left")
    qt = qt.where(tcond | F.col("__tile").isNull()).select(
        ROW_ID, "__T", F.lit(0).alias("__kind"), "__tile",
        *[F.lit(None).cast(ev.schema[c].dataType).alias(f"__e_{c}") for c in inputs],
        F.lit(None).cast("long").alias("__e_ts"), *ir_cols)

    # query x head-hop raw events (exact head, ts <= T)
    he = ev.select(*keys, F.col(TS_COL).alias("__e_ts"),
                   *[F.col(c).alias(f"__e_{c}") for c in inputs])
    qh = (q.join(he, keys, "inner")
          .where((F.col("__e_ts") >= head_floor) & (F.col("__e_ts") <= F.col("__T")))
          .select(ROW_ID, "__T", F.lit(1).alias("__kind"),
                  F.lit(None).cast("long").alias("__tile"),
                  *[F.col(f"__e_{c}") for c in inputs], "__e_ts",
                  *[F.lit(None).cast(tiles.schema[c].dataType).alias(c)
                    for c in ir_cols]))

    union = qt.unionByName(qh)
    if num_partitions:
        union = union.repartition(num_partitions, ROW_ID)

    _, part_types, out_schema = pit_join._output_schema(gb, dict(
        (f.name, f.dataType) for f in ev.schema.fields), [])
    out_fields = [f.name for f in out_schema.fields if f.name != ROW_ID]

    def serve(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rid, g in pdf.groupby(ROW_ID, sort=False):
            T = int(g["__T"].iloc[0])
            tile_rows = g[g["__kind"] == 0]
            tiles_list = []
            for _, r in tile_rows.iterrows():
                if pd.isna(r["__tile"]):
                    continue  # left-join miss: unseen key
                ir = {c: r[c] for c in ir_cols if r[c] is not None
                      and not (isinstance(r[c], float) and pd.isna(r[c]))}
                tiles_list.append((int(r["__tile"]), ir))
            events = [
                {"ts": int(r["__e_ts"]),
                 **{c: (None if r[f"__e_{c}"] is None
                        or (isinstance(r[f"__e_{c}"], float) and pd.isna(r[f"__e_{c}"]))
                        else r[f"__e_{c}"]) for c in inputs}}
                for _, r in g[g["__kind"] == 1].iterrows()
            ]
            merged = fl.merge_state(parts, None, tiles_list, events, T)
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
