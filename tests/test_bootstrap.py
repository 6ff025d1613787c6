"""Bootstrap parts: precomputed values take precedence over fresh compute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests import specs
from zipline_chronon_spark.api import (
    Aggregation,
    BootstrapPart,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
)
from zipline_chronon_spark.operators.join import compute_join
from zipline_chronon_spark.sources.transcripts import generate_transcripts


def test_bootstrap_precedence(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("boot")
    tpath = str(base / "t.parquet")
    bpath = str(base / "boot.parquet")
    pdf = generate_transcripts(n_convs=6, avg_turns=10, n_days=3, seed=51)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(tpath)

    gb = GroupBy(
        name="g",
        sources=(specs.transcripts_source(tpath),),
        key_columns=("conv_id",),
        aggregations=(Aggregation("text", Operation.COUNT, windows=(specs.W1D,)),),
        tie_breaker_column="turn_idx",
    )
    # bootstrap pre-fills the feature for turn_idx 0 rows with sentinel -777
    boot = (
        spark.read.parquet(tpath).where("turn_idx = 0")
        .select("conv_id", "turn_idx", F.lit(-777).cast("long").alias("g_text_count_1d"))
    )
    boot.write.mode("overwrite").parquet(bpath)

    join = Join(
        name="bj",
        left=EventSource(table=tpath, query=Query(time_column="ts")),
        parts=(JoinPart(gb),),
        row_ids=("conv_id", "turn_idx"),
        bootstrap_parts=(BootstrapPart(table=bpath, key_columns=("conv_id", "turn_idx")),),
    )
    out = compute_join(spark, join).toPandas()
    first = out[out["turn_idx"] == 0]
    rest = out[out["turn_idx"] != 0]
    assert (first["g_text_count_1d"] == -777).all(), "bootstrap values must win"
    assert (rest["g_text_count_1d"].dropna() >= 1).all()
    assert (rest["g_text_count_1d"] != -777).all()
