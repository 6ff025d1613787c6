"""Kafka decode pipeline (format-agnostic half) + streaming JoinSource
enrichment parity: micro-batched enrichment == one batch compute."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zipline_chronon_spark.api import Aggregation, EventSource, GroupBy, Operation, Query
from zipline_chronon_spark.api import TimeUnit, Window
from zipline_chronon_spark.operators.pit_join import compute_group_by
from zipline_chronon_spark.streaming.join_source import enrich_batch, run_join_source_stream
from zipline_chronon_spark.streaming.sources import KafkaSource, build_kafka_stream

BASE = 1_700_000_000_000


def test_kafka_decode_pipeline(spark, tmp_path):
    """The bytes->JSON->typed->watermark pipeline through a file source
    (the kafka format itself needs the external package)."""
    events = [{"k": f"u{i % 3}", "v": float(i), "ts": BASE + i * 60_000} for i in range(30)]
    in_dir = str(tmp_path / "in")
    pd.DataFrame({"value": [json.dumps(e) for e in events]}).to_json(
        f"{tmp_path}/raw.json", orient="records", lines=True)
    import os
    os.makedirs(in_dir)
    with open(f"{in_dir}/b0.txt", "w") as f:
        f.write("\n".join(json.dumps(e) for e in events))

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("ts", T.LongType()),
    ])
    src = KafkaSource(topic="t", bootstrap_servers="none", schema=schema, ts_col="ts")
    stream = build_kafka_stream(spark, src, format_override=("text", {"path": in_dir}))
    out = str(tmp_path / "out")
    q = (stream.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(out).orderBy("ts").toPandas()
    assert len(got) == 30
    assert list(got.columns[:3]) == ["k", "v", "ts"]
    assert got["v"].tolist() == [float(i) for i in range(30)]
    assert str(got["__event_time"].iloc[0])  # event-time column materialized


@pytest.fixture(scope="module")
def js_data(spark, tmp_path_factory):
    rng = np.random.default_rng(12)
    n = 1500
    pdf = pd.DataFrame({
        "user": [f"u{int(x)}" for x in rng.integers(0, 20, size=n)],
        "amount": rng.normal(50, 10, size=n).round(2),
        "ts_ms": BASE + rng.integers(0, 5 * 86_400_000, size=n),
    }).astype({"ts_ms": "int64"})
    base = tmp_path_factory.mktemp("js")
    feat_path = str(base / "features_src.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(feat_path)
    return base, feat_path, pdf


def _gb(feat_path):
    return GroupBy(
        name="js_feats",
        sources=(EventSource(table=feat_path, query=Query(time_column="ts_ms")),),
        key_columns=("user",),
        aggregations=(
            Aggregation("amount", Operation.SUM, windows=(Window(1, TimeUnit.DAYS),)),
            Aggregation("amount", Operation.COUNT, windows=(None,)),
        ),
    )


def test_join_source_stream_parity(spark, js_data):
    """availableNow drain with per-micro-batch enrichment == one batch
    compute over the same rows (JoinSourceRunner oracle)."""
    base, feat_path, pdf = js_data
    gb = _gb(feat_path)

    # the "stream": the last 40% of rows by ts, in 3 chronological files
    stream_rows = pdf.sort_values("ts_ms").iloc[int(0.6 * len(pdf)):].reset_index(drop=True)
    in_dir = str(base / "in")
    import os
    os.makedirs(in_dir, exist_ok=True)
    cuts = np.array_split(np.arange(len(stream_rows)), 3)
    for i, idxs in enumerate(cuts):
        spark.createDataFrame(stream_rows.iloc[idxs]).coalesce(1).write.mode(
            "overwrite").parquet(f"{in_dir}/b{i}.parquet")

    schema = spark.read.parquet(f"{in_dir}/b0.parquet").schema
    stream = (spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
              .parquet(f"{in_dir}/b*.parquet"))
    out = str(base / "out")
    run_join_source_stream(spark, stream, gb, out, str(base / "ck"), ts_col="ts_ms")

    got = (spark.read.parquet(out)
           .orderBy("user", "ts_ms", "amount").toPandas().reset_index(drop=True))
    assert len(got) == len(stream_rows)

    # oracle: one batch enrichment over all stream rows at once
    exp = (enrich_batch(spark, gb, spark.createDataFrame(stream_rows), ts_col="ts_ms")
           .orderBy("user", "ts_ms", "amount").toPandas().reset_index(drop=True))
    for c in ["amount_sum_1d", "amount_count"]:
        a = got[c].astype(float).fillna(-1).round(6)
        b = exp[c].astype(float).fillna(-1).round(6)
        assert (a == b).all(), c


def test_enrich_batch_matches_direct_compute(spark, js_data):
    """enrich_batch features equal a direct compute_group_by with the same
    query points (no leakage introduced by the row-id plumbing)."""
    base, feat_path, pdf = js_data
    gb = _gb(feat_path)
    batch = spark.createDataFrame(pdf.iloc[:200])
    got = enrich_batch(spark, gb, batch, ts_col="ts_ms").toPandas()
    left = (batch.select("user", F.col("ts_ms").alias("__q_ts"))
            .withColumn("__rid", F.xxhash64("user", "__q_ts")))
    direct = (compute_group_by(spark, gb, left, row_id="__rid",
                               query_time_col="__q_ts")
              .withColumnRenamed("__row_id", "__rid").toPandas())
    g = got.groupby(["user", "ts_ms"])["amount_count"].max()
    left_pdf = left.toPandas()
    d = direct.merge(left_pdf, left_on="__rid", right_on="__rid")
    dm = d.groupby(["user", "__q_ts"])["amount_count"].max()
    for (u, t), v in g.items():
        assert dm[(u, t)] == v or (pd.isna(v) and pd.isna(dm[(u, t)]))
