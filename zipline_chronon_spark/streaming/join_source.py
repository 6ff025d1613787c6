"""Streaming JoinSource enrichment — chained features on a live stream.

Reference: streaming/JoinSourceRunner.scala (444 LoC): a streaming GroupBy
whose source is a JoinSource first enriches each micro-batch of left
events with the parent Join's features (an online fetch per batch), then
feeds the enriched rows onward. The PySpark formulation uses
foreachBatch: every micro-batch becomes the LEFT of a point-in-time
compute_group_by against the (static) feature source — each stream row is
a query at its own event time, so enrichment is leak-free by
construction. The fetch tier is replaced by the batch engine reading the
feature GroupBy's source table directly (this sandbox has no KV store);
swapping in a fetcher changes only `_enrich`.

Parity oracle (tests/test_streaming_sources.py): draining the stream with
availableNow and enriching per micro-batch must equal ONE batch
compute_group_by over all stream rows — micro-batching must not change
any feature value.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zipline_chronon_spark.api import GroupBy
from zipline_chronon_spark.operators.pit_join import compute_group_by

ROW_ID = "__jsr_row_id"


def enrich_batch(spark: SparkSession, gb: GroupBy, batch_df: DataFrame,
                 key_map: Optional[dict[str, str]] = None,
                 ts_col: str = "ts") -> DataFrame:
    """Enrich one (micro-)batch: every row queries the GroupBy's features
    at its own timestamp. Returns the batch columns + feature columns."""
    key_map = key_map or {k: k for k in gb.key_columns}
    # mint + persist the row id ONCE (monotonically_increasing_id is
    # plan-dependent; persisting pins it — same pattern as join.py left)
    based = batch_df.withColumn(ROW_ID, F.monotonically_increasing_id()).persist()
    based.count()
    left = based.select(
        *[F.col(lc).alias(rk) for rk, lc in key_map.items()],
        F.col(ts_col).alias("__q_ts"),
        ROW_ID,
    )
    feats = compute_group_by(spark, gb, left, row_id=ROW_ID,
                             query_time_col="__q_ts")
    # the engine returns its internal row-id column name
    from zipline_chronon_spark.operators import pit_join as _pj

    if _pj.ROW_ID in feats.columns and ROW_ID not in feats.columns:
        feats = feats.withColumnRenamed(_pj.ROW_ID, ROW_ID)
    return based.join(feats, ROW_ID, "left").drop(ROW_ID)


def run_join_source_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    gb: GroupBy,
    out_path: str,
    checkpoint: str,
    key_map: Optional[dict[str, str]] = None,
    ts_col: str = "ts",
    transform: Optional[Callable[[DataFrame], DataFrame]] = None,
) -> None:
    """Drain a stream with availableNow, enriching each micro-batch with
    the GroupBy's point-in-time features and appending to parquet.
    ``transform`` optionally post-processes the enriched batch (the
    chained GroupBy's own selects/derivations)."""

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = enrich_batch(spark, gb, batch_df, key_map=key_map, ts_col=ts_col)
        if transform is not None:
            out = transform(out)
        out.write.mode("append").parquet(out_path)

    q = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
