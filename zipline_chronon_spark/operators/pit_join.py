"""Point-in-time (as-of) windowed aggregation — the engine core.

Architecture = the reference's skew-free "UnionJoin" plan
(spark/src/main/scala/ai/chronon/spark/join/UnionJoin.scala:26-238, README
claims 9x vs the legacy cogroup path), re-expressed Spark-first:

    events ∪ queries  --one hash shuffle on keys-->  groupBy(keys)
        .applyInPandas(sort by (ts, tie) → searchsorted bounds → kernels)

One shuffle total, no join, no per-row Python: inside each Arrow batch the
whole group is aggregated with numpy prefix/RMQ kernels (kernels.py) under
the sawtooth window rule (sawtooth.py). The reference does the same shape
with Scala mapPartitions + collect_list (SawtoothUdf.scala:82-138); we let
Arrow hand us columnar batches instead.

Scale notes (100 TB design point):
 - the only shuffle is hash-partitioned by key; skew from hot keys is
   handled by time-slice salting (salt.py) since window lookback is bounded;
 - map-side the union is two scans with pushed filters; column pruning keeps
   only keys + ts + aggregation inputs on the wire;
 - group state is O(events-per-key); Arrow batches stream per group.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zipline_chronon_spark.api import AggregationPart, EventSource, GroupBy, Operation
from zipline_chronon_spark.operators import kernels, sawtooth

TS_COL = "__ts"  # epoch millis long (Constants.scala:24 — time is always epoch ms)
SIDE_COL = "__isq"  # 0 = event, 1 = query row
ROW_ID = "__row_id"
TIE_COL = "__tie"

_LONG_INPUTS = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)


def _widen(dt: T.DataType) -> T.DataType:
    """Numeric widening per ColumnAggregator.scala:209-441 (Int/Short/Bool ->
    Long, Float/Decimal -> Double)."""
    if isinstance(dt, _LONG_INPUTS):
        return T.LongType()
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return T.DoubleType()
    return dt


def output_field(part: AggregationPart, input_type: T.DataType) -> T.StructField:
    op = part.operation
    if op in (Operation.COUNT, Operation.UNIQUE_COUNT, Operation.APPROX_UNIQUE_COUNT):
        out: T.DataType = T.LongType()
    elif op == Operation.SUM:
        out = _widen(input_type)
    elif op in (Operation.AVERAGE, Operation.VARIANCE, Operation.SKEW, Operation.KURTOSIS):
        out = T.DoubleType()
    elif op in (Operation.MIN, Operation.MAX, Operation.FIRST, Operation.LAST):
        out = input_type
    elif op in (Operation.LAST_K, Operation.FIRST_K, Operation.TOP_K, Operation.BOTTOM_K,
                Operation.UNIQUE_TOP_K):
        out = T.ArrayType(input_type)
    elif op in (Operation.HISTOGRAM, Operation.APPROX_FREQUENT_K, Operation.APPROX_HEAVY_HITTERS_K):
        out = T.MapType(T.StringType(), T.LongType())
    elif op == Operation.APPROX_PERCENTILE:
        out = T.ArrayType(T.DoubleType())
    else:
        raise NotImplementedError(f"operation {op}")
    if part.bucket is not None:
        out = T.MapType(T.StringType(), out)
    return T.StructField(part.output_name, out, True)


def _read_table(spark: SparkSession, table: str) -> DataFrame:
    if "/" in table:
        return spark.read.parquet(table)
    return spark.table(table)


def _time_to_millis(col: F.Column, dt: T.DataType) -> F.Column:
    if isinstance(dt, T.TimestampNTZType):
        # session TZ is UTC (session.py) so NTZ == UTC instant
        return F.unix_millis(col.cast("timestamp"))
    if isinstance(dt, T.TimestampType):
        return F.unix_millis(col)
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return col.cast("long")
    raise TypeError(f"unsupported time column type {dt}")


def render_source(
    spark: SparkSession,
    src: EventSource,
    key_columns: tuple[str, ...],
    input_columns: list[str],
    tie_breaker: Optional[str] = None,
    time_range_ms: Optional[tuple[Optional[int], Optional[int]]] = None,
) -> DataFrame:
    """Scan → where → selectExpr → normalized epoch-millis TS_COL.

    Declarative so Catalyst pushes the filters/pruning to the parquet scan
    (reference analogue: TableUtils.scanDf, catalog/TableUtils.scala:689-772
    + QueryUtils.build, api/.../QueryUtils.scala:25-66).
    """
    for stmt in src.query.setups:
        spark.sql(stmt)
    df = _read_table(spark, src.table)
    for w in src.query.wheres:
        df = df.where(w)
    time_expr = F.expr(src.query.time_column)
    time_dt = df.select(time_expr.alias("t")).schema[0].dataType
    ts_ms = _time_to_millis(time_expr, time_dt)
    if time_range_ms is not None:
        lo, hi = time_range_ms
        if lo is not None:
            df = df.where(ts_ms >= F.lit(lo))
        if hi is not None:
            df = df.where(ts_ms <= F.lit(hi))
    sel: list[F.Column] = []
    selects = src.query.selects
    seen: set[str] = set()
    for name in [*key_columns, *input_columns, *([tie_breaker] if tie_breaker else [])]:
        if name in seen or name is None:
            continue
        seen.add(name)
        expr = (selects or {}).get(name, name)
        sel.append(F.expr(expr).alias(name))
    return df.select(*sel, ts_ms.alias(TS_COL))


def _input_columns(gb: GroupBy) -> list[str]:
    cols: list[str] = []
    for p in gb.parts():
        for c in (p.input_column, p.bucket):
            if c and c not in cols:
                cols.append(c)
    return cols


def events_df(
    spark: SparkSession,
    gb: GroupBy,
    time_range_ms: Optional[tuple[Optional[int], Optional[int]]] = None,
) -> DataFrame:
    """Union of all rendered sources (GroupBy.scala:624-669 union semantics),
    rows with all-null keys dropped (GroupBy.scala:640-642)."""
    cols = _input_columns(gb)
    dfs = [
        render_source(spark, s, gb.key_columns, cols, gb.tie_breaker_column, time_range_ms)
        for s in gb.sources
    ]
    df = dfs[0]
    for other in dfs[1:]:
        df = df.unionByName(other)
    not_all_null = None
    for k in gb.key_columns:
        c = F.col(k).isNotNull()
        not_all_null = c if not_all_null is None else (not_all_null | c)
    return df.where(not_all_null).where(F.col(TS_COL).isNotNull())


def _as_numpy(s: pd.Series, dt: T.DataType) -> np.ndarray:
    if isinstance(dt, _LONG_INPUTS):
        return s.to_numpy(dtype=np.int64)
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return s.to_numpy(dtype=np.float64)
    return s.to_numpy(dtype=object)


def _part_results(
    part: AggregationPart,
    ev: pd.DataFrame,
    ev_ts: np.ndarray,
    q_ts: np.ndarray,
    input_type: T.DataType,
) -> list:
    """One aggregation part over one group's sorted events: null-filter the
    input column (ColumnAggregator.scala null guards), compute [lo,hi) via
    the sawtooth rule, run the numpy kernel. Buckets (BucketedColumnAggregator)
    become per-bucket-value kernel runs assembled into dicts."""
    col = ev[part.input_column]
    mask = col.notna().to_numpy()
    n_q = len(q_ts)
    if part.bucket is None:
        if not mask.any():
            return [None] * n_q
        vals = _as_numpy(col[mask], input_type)
        ts_f = ev_ts[mask]
        lo, hi = sawtooth.window_bounds(ts_f, q_ts, part.window)
        return kernels.run_kernel(part, vals, ts_f, lo, hi)
    bcol = ev[part.bucket]
    mask = mask & bcol.notna().to_numpy()
    out: list = [None] * n_q
    if not mask.any():
        return out
    sub = ev[mask]
    ts_m = ev_ts[mask]
    vals_m = _as_numpy(sub[part.input_column], input_type)
    bvals = sub[part.bucket].astype(str).to_numpy()
    for bv in pd.unique(bvals):
        bmask = bvals == bv
        lo, hi = sawtooth.window_bounds(ts_m[bmask], q_ts, part.window)
        res = kernels.run_kernel(part, vals_m[bmask], ts_m[bmask], lo, hi)
        for i, r in enumerate(res):
            if r is not None:
                if out[i] is None:
                    out[i] = {}
                out[i][str(bv)] = r
    return out


def compute_group_by(
    spark: SparkSession,
    gb: GroupBy,
    queries: DataFrame,
    row_id: str = ROW_ID,
    key_mapping: Optional[dict[str, str]] = None,
    query_time_col: str = "ts",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Enrich each query row (keys…, ts) with gb's features as of its ts.

    queries: DataFrame with the (left-named) key columns, a time column, and
    a unique ``row_id`` column. Returns (row_id, feature columns…).

    Plan = union → single shuffle → applyInPandas (see module docstring).
    """
    # key_mapping maps left column -> right key (api.thrift:384-386)
    key_mapping = key_mapping or {}
    right_keys = list(gb.key_columns)
    inv = {r: l for l, r in key_mapping.items()}
    left_cols = {rk: inv.get(rk, rk) for rk in right_keys}

    ev = events_df(spark, gb)
    ev_schema = dict(zip(ev.schema.names, [f.dataType for f in ev.schema.fields]))

    q_time_dt = queries.select(F.expr(query_time_col).alias("t")).schema[0].dataType
    q = queries.select(
        *[F.col(left_cols[rk]).alias(rk) for rk in right_keys],
        _time_to_millis(F.expr(query_time_col), q_time_dt).alias(TS_COL),
        F.col(row_id).alias(ROW_ID),
    )

    tie = gb.tie_breaker_column
    # NOTE: no nulls in ROW_ID/TIE_COL — a null would make Arrow hand pandas
    # a float64 column and 64-bit row ids (e.g. xxhash64) lose precision
    # above 2^53. Events carry a dummy 0 row id instead.
    ev_u = ev.withColumn(SIDE_COL, F.lit(0)).withColumn(ROW_ID, F.lit(0).cast("long"))
    if tie:
        ev_u = ev_u.withColumn(TIE_COL, F.coalesce(F.col(tie).cast("long"), F.lit(0)))
    else:
        ev_u = ev_u.withColumn(TIE_COL, F.lit(0).cast("long"))
    q_u = q.withColumn(SIDE_COL, F.lit(1)).withColumn(TIE_COL, F.lit(0).cast("long"))
    union = ev_u.unionByName(q_u, allowMissingColumns=True)

    parts = gb.parts()
    fields = [T.StructField(ROW_ID, T.LongType(), False)]
    part_types: list[T.DataType] = []
    for p in parts:
        in_t = ev_schema[p.input_column]
        part_types.append(in_t)
        fields.append(output_field(p, in_t))
    out_schema = T.StructType(fields)
    input_cols = _input_columns(gb)

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        is_q = pdf[SIDE_COL].to_numpy() == 1
        qr = pdf[is_q]
        if len(qr) == 0:
            return pd.DataFrame({f.name: pd.Series(dtype=object) for f in fields})
        ev_p = pdf[~is_q]
        order = np.lexsort((ev_p[TIE_COL].to_numpy(dtype=np.int64),
                            ev_p[TS_COL].to_numpy(dtype=np.int64)))
        ev_p = ev_p.iloc[order]
        ev_ts = ev_p[TS_COL].to_numpy(dtype=np.int64)
        q_ts = qr[TS_COL].to_numpy(dtype=np.int64)
        data: dict = {ROW_ID: qr[ROW_ID].to_numpy(dtype=np.int64)}
        for p, in_t in zip(parts, part_types):
            data[p.output_name] = pd.Series(
                _part_results(p, ev_p, ev_ts, q_ts, in_t), dtype=object
            )
        return pd.DataFrame(data)

    grouped = union
    if num_partitions:
        grouped = grouped.repartition(num_partitions, *right_keys)
    return grouped.groupBy(*right_keys).applyInPandas(process, schema=out_schema).drop(*[])
