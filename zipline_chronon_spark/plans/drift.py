"""Drift as a job: per-partition column summaries + drift series over time.

Reference shape: spark/.../stats/drift/Summarizer.scala (per-tile column
summaries — histograms for low-cardinality/string columns, percentiles and
moments for numerics — keyed by (column, tile)) and DriftJob/CompareJob
computing PSI / JS / L-infinity between summaries at a time offset
(online/.../stats/DriftMetrics.scala). The metric primitives live in
operators/stats.py; this module is the summarize-partitions ->
compare-windows pipeline on top.

Scale shape: summarization is TWO shuffles total regardless of column
count — one global pass for bin edges / top-k string values (so every
partition is binned against the SAME edges, otherwise cross-partition
histograms aren't comparable), and one explode -> groupBy(ds, column, bin)
pass for the histograms (plus a tiny per-ds wide aggregate for moments).
The summary table is O(partitions x columns x bins) rows — metadata scale —
so the drift comparison itself runs driver-side in numpy like the
reference's fetch-side DriftMetrics.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zipline_chronon_spark.operators import pit_join
from zipline_chronon_spark.operators.stats import js_divergence, linf_distance, psi

_NUMERIC = (T.LongType, T.IntegerType, T.ShortType, T.ByteType,
            T.DoubleType, T.FloatType, T.DecimalType)

OTHER_BIN = "__other"


def summarize_partitions(
    spark: SparkSession,
    table,  # table name / parquet path / DataFrame
    partition_column: str = "ds",
    cols: Optional[Sequence[str]] = None,
    bins: int = 20,
    top_k: int = 20,
) -> DataFrame:
    """One summary row per (partition, column): totals, null count, mean
    (numeric), and a bin->count histogram. Numeric bins are equi-width on
    the GLOBAL [min, max] so histograms align across partitions; string
    bins are the global top-k values with everything else folded into
    ``__other`` (Summarizer.scala's cardinality-threshold idea)."""
    df = table if isinstance(table, DataFrame) else pit_join._read_table(spark, table)
    schema = {f.name: f.dataType for f in df.schema.fields}
    cols = [c for c in (cols or df.columns) if c != partition_column]
    numeric = [c for c in cols if isinstance(schema[c], _NUMERIC)]
    strings = [c for c in cols if isinstance(schema[c], T.StringType)]
    cols = numeric + strings  # summarizable subset, stable order

    # pass 1a: global bin edges for numerics (single tiny aggregate)
    edge_aggs = []
    for c in numeric:
        edge_aggs += [F.min(F.col(c).cast("double")).alias(f"{c}__lo"),
                      F.max(F.col(c).cast("double")).alias(f"{c}__hi")]
    edges = df.agg(*edge_aggs).collect()[0].asDict() if edge_aggs else {}
    # pass 1b: global top-k values per string column (one shuffle each;
    # string columns in a drift config are few and low-cardinality)
    tops: dict[str, list[str]] = {}
    for c in strings:
        rows = (df.where(F.col(c).isNotNull()).groupBy(c)
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.desc("n"), F.asc(c)).limit(top_k).collect())
        tops[c] = [r[c] for r in rows]

    # pass 2: explode each row into (column, bin) entries -> ONE shuffle
    entries = []
    for c in numeric:
        lo, hi = edges[f"{c}__lo"], edges[f"{c}__hi"]
        if lo is None or hi == lo:
            bin_col = F.when(F.col(c).isNotNull(), F.lit("all"))
        else:
            width = (hi - lo) / bins
            b = F.least(((F.col(c).cast("double") - F.lit(lo)) / F.lit(width))
                        .cast("long"), F.lit(bins - 1))
            bin_col = F.when(F.col(c).isNotNull(), b.cast("string"))
        entries.append(F.struct(F.lit(c).alias("column"), bin_col.alias("bin")))
    for c in strings:
        bin_col = F.when(F.col(c).isNull(), F.lit(None).cast("string")) \
            .when(F.col(c).isin(tops[c]) if tops[c] else F.lit(False), F.col(c)) \
            .otherwise(F.lit(OTHER_BIN))
        entries.append(F.struct(F.lit(c).alias("column"), bin_col.alias("bin")))

    ds = F.col(partition_column).cast("string").alias("ds")
    long_df = (df.select(ds, F.explode(F.array(*entries)).alias("e"))
               .select("ds", F.col("e.column").alias("column"),
                       F.col("e.bin").alias("bin"))
               .where(F.col("bin").isNotNull()))
    hists = (long_df.groupBy("ds", "column", "bin")
             .agg(F.count(F.lit(1)).alias("n"))
             .groupBy("ds", "column")
             .agg(F.map_from_entries(
                 F.sort_array(F.collect_list(F.struct("bin", "n")))).alias("bin_counts")))

    # per-ds moments (tiny wide aggregate, melted Spark-side)
    stat_aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        stat_aggs.append(F.count(c).alias(f"{c}__nn"))
    for c in numeric:
        stat_aggs.append(F.mean(F.col(c).cast("double")).alias(f"{c}__mean"))
    wide = df.groupBy(ds).agg(*stat_aggs)
    melted = wide.select(
        "ds", "__total",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("column"),
                     F.col(f"{c}__nn").alias("nonnull"),
                     (F.col(f"{c}__mean") if c in numeric
                      else F.lit(None).cast("double")).alias("mean"))
            for c in cols
        ])).alias("e"),
    ).select("ds", F.col("e.column").alias("column"),
             F.col("__total").alias("total"),
             (F.col("__total") - F.col("e.nonnull")).alias("nulls"),
             F.col("e.mean").alias("mean"))
    return melted.join(hists, ["ds", "column"], "left")


_METRICS = {"psi": psi, "js": js_divergence, "linf": linf_distance}


def drift_series(
    summaries: DataFrame,
    metric: str = "psi",
    offset: int = 1,
) -> DataFrame:
    """Per (ds, column) drift of each partition's histogram vs the
    partition ``offset`` steps earlier (in the sorted ds order). The
    summary table is metadata-scale (partitions x columns rows), so the
    pairwise metric runs driver-side in numpy — same split as the
    reference (Spark summarizes, DriftMetrics compares)."""
    fn = _METRICS[metric]
    pdf = summaries.select("ds", "column", "bin_counts").toPandas()
    ds_sorted = sorted(pdf["ds"].unique())
    by_key = dict(zip(zip(pdf["ds"], pdf["column"]), pdf["bin_counts"]))
    cols_by_ds = pdf.groupby("ds")["column"].agg(lambda s: sorted(s.unique()))
    rows = []
    for i, d in enumerate(ds_sorted):
        if i < offset:
            continue
        prev = ds_sorted[i - offset]
        for c in cols_by_ds[d]:
            cur_h, prev_h = by_key.get((d, c)), by_key.get((prev, c))
            if cur_h is None or prev_h is None or not len(cur_h) or not len(prev_h):
                continue
            rows.append((d, prev, c, float(fn(dict(cur_h), dict(prev_h)))))
    return summaries.sparkSession.createDataFrame(
        rows, f"ds string, vs_ds string, column string, {metric} double")
