"""JoinSource chaining + stats/drift operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests import specs
from zipline_chronon_spark.api import (
    Aggregation,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    JoinSource,
    Operation,
    Query,
)
from zipline_chronon_spark.operators import stats
from zipline_chronon_spark.operators.pit_join import compute_group_by
from zipline_chronon_spark.sources.transcripts import generate_transcripts


def test_join_source_chaining(spark, tmp_path_factory):
    pdf = generate_transcripts(n_convs=6, avg_turns=12, n_days=3, seed=61)
    path = str(tmp_path_factory.mktemp("chain") / "t.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)

    inner_gb = GroupBy(
        name="inner",
        sources=(specs.transcripts_source(path),),
        key_columns=("conv_id",),
        aggregations=(Aggregation("len_text", Operation.SUM, windows=(specs.W1D,)),),
        tie_breaker_column="turn_idx",
    )
    upstream = Join(
        name="up",
        left=EventSource(table=path, query=Query(time_column="ts")),
        parts=(JoinPart(inner_gb),),
        row_ids=("conv_id", "turn_idx"),
    )
    # downstream GroupBy over the join's OUTPUT: max of the derived feature
    chained = GroupBy(
        name="chained",
        sources=(JoinSource(join=upstream, query=Query(time_column="ts")),),
        key_columns=("conv_id",),
        aggregations=(Aggregation("inner_len_text_sum_1d", Operation.MAX, windows=(None,)),),
        tie_breaker_column="turn_idx",
    )
    left = (
        spark.read.parquet(path).select("conv_id", "ts", "turn_idx")
        .withColumn("__row_id", F.xxhash64("conv_id", "turn_idx"))
    )
    got = compute_group_by(spark, chained, left, row_id="__row_id")
    res = left.join(got, "__row_id").toPandas()
    assert len(res) == len(pdf)
    assert res["inner_len_text_sum_1d_max"].notna().sum() > 0
    # the chained max is the running max of the upstream feature per conv
    up_df = spark.createDataFrame(pdf).select("conv_id", "turn_idx", "ts")
    assert res.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")[
        "inner_len_text_sum_1d_max"].apply(lambda s: s.dropna().is_monotonic_increasing).all()


def test_summarize_and_drift(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    prof = stats.summarize(df, ["value", "event_type", "user_id"]).toPandas()
    prof = prof.set_index("column")
    assert prof.loc["value", "total"] == 1000
    assert prof.loc["value", "nulls"] == 0
    assert prof.loc["event_type", "mean"] is None or np.isnan(prof.loc["event_type", "mean"])
    p5, p50, p95 = prof.loc["value", "p5_p50_p95"]
    assert p5 <= p50 <= p95

    h1 = stats.column_histogram(df.where("value < 100"), "value")
    h2 = stats.column_histogram(df.where("value >= 50"), "value")
    assert stats.psi(h1, h1) == 0.0
    assert stats.js_divergence(h1, h1) == 0.0
    assert stats.psi(h1, h2) > 0.1
    assert 0 < stats.js_divergence(h1, h2) <= 1.0
    assert 0 < stats.linf_distance(h1, h2) <= 1.0


def test_edit_distance(spark):
    df = spark.createDataFrame([("kitten", "sitting"), ("abc", "abc")], "a string, b string")
    out = {r["a"]: r["edit_distance"] for r in stats.edit_distance(df, "a", "b").collect()}
    assert out == {"kitten": 3, "abc": 0}
