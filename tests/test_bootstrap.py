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


def test_covering_set_prunes_part_compute(spark, tmp_path_factory, monkeypatch):
    """Rows fully covered by a bootstrap table must never reach the part
    engine (Join.scala:130-193 matched_hashes): the covering bootstrap here
    provides the part's whole output schema for turn_idx==0 rows, so the
    part computes over strictly fewer left rows — with identical output."""
    import zipline_chronon_spark.operators.join as join_mod

    base = tmp_path_factory.mktemp("boot2")
    tpath = str(base / "t.parquet")
    bpath = str(base / "boot.parquet")
    pdf = generate_transcripts(n_convs=6, avg_turns=10, n_days=3, seed=52)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(tpath)

    gb = GroupBy(
        name="g",
        sources=(specs.transcripts_source(tpath),),
        key_columns=("conv_id",),
        aggregations=(Aggregation("text", Operation.COUNT, windows=(specs.W1D,)),),
        tie_breaker_column="turn_idx",
    )
    boot = (
        spark.read.parquet(tpath).where("turn_idx = 0")
        .select("conv_id", "turn_idx",
                F.lit(-777).cast("long").alias("g_text_count_1d"))
    )
    boot.write.mode("overwrite").parquet(bpath)
    n_covered = boot.count()
    n_left = spark.read.parquet(tpath).count()

    seen_sizes = []
    real = join_mod.compute_part

    def spy(spark_, part, left, *a, **kw):
        seen_sizes.append(left.count())
        return real(spark_, part, left, *a, **kw)

    monkeypatch.setattr(join_mod, "compute_part", spy)

    join = Join(
        name="bj2",
        left=EventSource(table=tpath, query=Query(time_column="ts")),
        parts=(JoinPart(gb),),
        row_ids=("conv_id", "turn_idx"),
        bootstrap_parts=(BootstrapPart(table=bpath,
                                       key_columns=("conv_id", "turn_idx")),),
    )
    out = compute_join(spark, join).toPandas()
    assert seen_sizes == [n_left - n_covered], "covered rows reached the part engine"
    first = out[out["turn_idx"] == 0]
    rest = out[out["turn_idx"] != 0]
    assert (first["g_text_count_1d"] == -777).all()
    assert (rest["g_text_count_1d"].dropna() >= 1).all()
    assert len(out) == n_left
