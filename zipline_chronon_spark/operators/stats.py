"""Stats / observability operators (SURVEY.md §2.8).

Reference: aggregator/.../row/StatsGenerator.scala:35-263 (null counts,
percentiles, frequent items), spark/.../stats/{StatsCompute,CompareJob}.scala,
online/.../stats/DriftMetrics.scala (PSI / Jensen-Shannon / L-infinity
between distributions), aggregator/.../stats/EditDistance.scala.

All summary aggregations are plain DataFrame ops (one pass, JVM-side);
drift metrics compare two histogram maps in numpy.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def summarize(df: DataFrame, cols: Optional[Sequence[str]] = None) -> DataFrame:
    """Per-column profile in one aggregation pass: total/null counts, approx
    distinct, and p5/p50/p95 + mean for numeric columns. Returns one row per
    column (long format, stable at any width)."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    cols = list(cols) if cols else list(schema)
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        aggs.append(F.count(c).alias(f"{c}__nonnull"))
        aggs.append(F.approx_count_distinct(c).alias(f"{c}__distinct"))
        if isinstance(schema[c], (T.LongType, T.IntegerType, T.ShortType, T.DoubleType,
                                  T.FloatType, T.DecimalType)):
            aggs.append(F.mean(F.col(c).cast("double")).alias(f"{c}__mean"))
            aggs.append(F.percentile_approx(F.col(c).cast("double"),
                                            F.array(F.lit(0.05), F.lit(0.5), F.lit(0.95)),
                                            10000).alias(f"{c}__pctl"))
    row = df.agg(*aggs).collect()[0].asDict()
    out_rows = []
    for c in cols:
        pct = row.get(f"{c}__pctl")
        out_rows.append((
            c,
            int(row["__total"]),
            int(row["__total"] - row[f"{c}__nonnull"]),
            int(row[f"{c}__distinct"]),
            float(row[f"{c}__mean"]) if row.get(f"{c}__mean") is not None else None,
            [float(x) for x in pct] if pct is not None else None,
        ))
    return df.sparkSession.createDataFrame(
        out_rows,
        "column string, total long, nulls long, approx_distinct long, "
        "mean double, p5_p50_p95 array<double>",
    )


def column_histogram(df: DataFrame, col: str, bins: int = 20) -> dict:
    """Equi-width histogram of a numeric column as {bin_start: count}."""
    lo, hi = df.agg(F.min(col), F.max(col)).collect()[0]
    if lo is None or hi == lo:
        return {float(lo or 0): df.where(F.col(col).isNotNull()).count()}
    width = (hi - lo) / bins
    b = F.least(((F.col(col) - F.lit(lo)) / F.lit(width)).cast("long"), F.lit(bins - 1))
    rows = (
        df.where(F.col(col).isNotNull()).groupBy(b.alias("b")).count().collect()
    )
    return {float(lo + r["b"] * width): int(r["count"]) for r in rows}


def _aligned(p: dict, q: dict) -> tuple[np.ndarray, np.ndarray]:
    keys = sorted(set(p) | set(q))
    eps = 1e-9
    a = np.array([p.get(k, 0) for k in keys], dtype=float) + eps
    b = np.array([q.get(k, 0) for k in keys], dtype=float) + eps
    return a / a.sum(), b / b.sum()


def psi(p: dict, q: dict) -> float:
    """Population stability index between two histograms (DriftMetrics)."""
    a, b = _aligned(p, q)
    return float(np.sum((a - b) * np.log(a / b)))


def js_divergence(p: dict, q: dict) -> float:
    """Jensen-Shannon divergence (base-2, in [0, 1])."""
    a, b = _aligned(p, q)
    m = (a + b) / 2
    kl = lambda x, y: float(np.sum(x * np.log2(x / y)))  # noqa: E731
    return 0.5 * kl(a, m) + 0.5 * kl(b, m)


def linf_distance(p: dict, q: dict) -> float:
    """L-infinity distance between normalized histograms."""
    a, b = _aligned(p, q)
    return float(np.max(np.abs(a - b)))


def edit_distance(df: DataFrame, col_a: str, col_b: str, alias: str = "edit_distance") -> DataFrame:
    """Levenshtein distance between two string columns (EditDistance.scala;
    Spark's built-in levenshtein keeps it JVM-side)."""
    return df.withColumn(alias, F.levenshtein(F.col(col_a), F.col(col_b)))
