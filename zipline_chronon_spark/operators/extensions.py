"""North-rule extensions beyond the reference operator set: lag/lead turn
features and gap-based sessionization.

The reference has no lag/lead or session operators (SURVEY.md §2.7) — these
are required by BASELINE.json north_rule and are built purely from Spark
window functions (whole-stage-codegen JVM path, zero Python):

 - lag/lead over Window.partitionBy(keys).orderBy(orderCols)
 - session_id = cumulative sum of (gap > threshold) flags per key, the
   classic sessionization idiom; session aggregates via groupBy.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def with_lag_lead(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    columns: Sequence[str],
    offsets: Sequence[int] = (1,),
) -> DataFrame:
    """Adds {col}_lag{n} / {col}_lead{n} for each column and offset."""
    w = W.partitionBy(*keys).orderBy(*order_by)
    for c in columns:
        for n in offsets:
            df = df.withColumn(f"{c}_lag{n}", F.lag(c, n).over(w))
            df = df.withColumn(f"{c}_lead{n}", F.lead(c, n).over(w))
    return df


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    order_by: Optional[Sequence[str]] = None,
    gap: str = "30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """Assign 0-based session ids per key: a new session starts when the gap
    from the previous row exceeds ``gap`` (SQL interval literal)."""
    import pandas as pd

    order_by = list(order_by) if order_by else [ts_col]
    w = W.partitionBy(*keys).orderBy(*order_by)
    gap_ms = F.lit(int(pd.Timedelta(gap).total_seconds() * 1000))
    prev_ts = F.lag(F.unix_millis(F.col(ts_col).cast("timestamp"))).over(w)
    cur_ts = F.unix_millis(F.col(ts_col).cast("timestamp"))
    is_new = F.when(prev_ts.isNull(), F.lit(0)).when(
        (cur_ts - prev_ts) > gap_ms, F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(session_col, F.sum(is_new).over(
        W.partitionBy(*keys).orderBy(*order_by).rowsBetween(W.unboundedPreceding, 0)
    ).cast("long"))


def session_aggregates(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    session_col: str = "session_id",
) -> DataFrame:
    """Per-session row count + duration (ms) + start/end — one shuffle."""
    ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    return (
        df.withColumn("__ts_ms", ts_ms)
        .groupBy(*keys, session_col)
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("__ts_ms").alias("session_start_ms"),
            F.max("__ts_ms").alias("session_end_ms"),
            (F.max("__ts_ms") - F.min("__ts_ms")).alias("duration_ms"),
        )
    )
