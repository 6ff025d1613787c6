"""Physical-plan guarantees (pushdown, pruning, semi-join) + analyzer."""

from __future__ import annotations

import dataclasses

import pytest
from pyspark.sql import functions as F

from tests import specs
from zipline_chronon_spark.api import (
    Aggregation,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
)
from zipline_chronon_spark.operators import pit_join
from zipline_chronon_spark.plans.analyzer import analyze_group_by, analyze_join
from zipline_chronon_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def tpath(spark, tmp_path_factory):
    pdf = generate_transcripts(n_convs=8, avg_turns=15, n_days=4, seed=41)
    p = str(tmp_path_factory.mktemp("plan") / "t.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(p)
    return p


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_and_pruning(spark, tpath):
    gb = GroupBy(
        name="pp",
        sources=(EventSource(
            table=tpath,
            query=Query(selects={"conv_id": "conv_id", "len_text": "length(text)"},
                        wheres=("role = 'user'",), time_column="ts"),
        ),),
        key_columns=("conv_id",),
        aggregations=(Aggregation("len_text", Operation.SUM, windows=(specs.W1D,)),),
    )
    ev = pit_join.events_df(spark, gb, time_range_ms=(1_700_000_000_000, None))
    plan = _physical(ev)
    # filter pushed to the parquet scan
    assert "PushedFilters:" in plan
    assert "EqualTo(role,user)" in plan, plan
    # column pruning: ds/tool/turn_idx never read
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "tool" not in read_schema and "ds" not in read_schema
    for col in ("conv_id", "text", "ts", "role"):
        assert col in read_schema


def test_semi_join_prefilter_in_plan(spark, tpath):
    gb = GroupBy(
        name="semi",
        sources=(specs.transcripts_source(tpath),),
        key_columns=("conv_id",),
        aggregations=(Aggregation("len_text", Operation.SUM, windows=(specs.W1D,)),),
    )
    left = (
        spark.read.parquet(tpath).where("conv_id = 'conv_000001'")
        .select("conv_id", "ts").withColumn("__row_id", F.monotonically_increasing_id())
    )
    out = pit_join.compute_group_by(spark, gb, left, row_id="__row_id")
    plan = _physical(out)
    assert "LeftSemi" in plan, "events scan should be semi-filtered by left keys"
    rows = out.count()
    left_n = left.count()
    assert rows == left_n


def test_analyzer_groupby(spark, tpath):
    good = specs.convo_features(tpath)
    rep = analyze_group_by(spark, good)
    assert rep.ok, rep.errors
    assert rep.key_schema == {"conv_id": "string"}
    assert rep.output_schema["text_count_1d"] == "bigint"
    assert rep.output_schema["len_text_sum_1d_by_role"] == "map<string,bigint>"

    bad = dataclasses.replace(
        good,
        aggregations=(Aggregation("nope", Operation.SUM),),
    )
    rep2 = analyze_group_by(spark, bad)
    assert not rep2.ok

    # aggregating a raw timestamp is rejected with guidance
    ts_agg = GroupBy(
        name="tsagg",
        sources=(EventSource(table=tpath, query=Query(time_column="ts")),),
        key_columns=("conv_id",),
        aggregations=(Aggregation("ts", Operation.MAX),),
    )
    rep3 = analyze_group_by(spark, ts_agg)
    assert any("cannot be aggregated" in e for e in rep3.errors)


def test_analyzer_join(spark, tpath):
    gb = GroupBy(
        name="g",
        sources=(specs.transcripts_source(tpath),),
        key_columns=("conv_id",),
        aggregations=(Aggregation("len_text", Operation.SUM, windows=(specs.W1D,)),),
    )
    join = Join(
        name="j",
        left=EventSource(table=tpath, query=Query(time_column="ts")),
        parts=(JoinPart(gb), JoinPart(gb, key_mapping=(("missing_col", "conv_id"),), prefix="x")),
    )
    rep = analyze_join(spark, join)
    assert any("missing on left" in e for e in rep.errors)
    assert "g_len_text_sum_1d" in rep.output_schema


def test_in_list_small_mode_pushdown(spark, tpath):
    gb = GroupBy(
        name="small",
        sources=(specs.transcripts_source(tpath),),
        key_columns=("conv_id",),
        aggregations=(Aggregation("len_text", Operation.SUM, windows=(specs.W1D,)),),
    )
    left = (
        spark.read.parquet(tpath).where("conv_id = 'conv_000002'")
        .select("conv_id", "ts").withColumn("__row_id", F.monotonically_increasing_id())
    )
    out = pit_join.compute_group_by(spark, gb, left, row_id="__row_id",
                                    semi_filter="in_list")
    plan = _physical(out)
    # the IN-list literal reaches the parquet scan's pushed filters
    assert "In(conv_id" in plan or "EqualTo(conv_id,conv_000002)" in plan, plan
    assert out.count() == left.count()


def test_analyzer_data_checks(spark, tpath):
    """Timestamp sanity, key-type match, data availability, skew detection
    (Analyzer.scala:354-505 parity)."""
    gb = GroupBy(
        name="g",
        sources=(specs.transcripts_source(tpath),),
        key_columns=("conv_id",),
        aggregations=(Aggregation("len_text", Operation.SUM, windows=(specs.W30D,)),),
    )
    # key TYPE mismatch: left joins an int column onto the string conv_id
    join = Join(
        name="j2",
        left=EventSource(table=tpath,
                         query=Query(selects={"conv_id": "turn_idx", "turn_idx": "turn_idx"},
                                     time_column="ts")),
        parts=(JoinPart(gb),),
    )
    rep = analyze_join(spark, join, check_data=True, skew_detection=True,
                       start_ds="2024-06-01")
    assert any("type mismatch" in e for e in rep.errors), rep.errors
    # 30d window over a 4-day fixture starting at the fixture's first day:
    # availability must flag missing history
    assert any("data availability" in e for e in rep.errors), rep.errors
    assert rep.hot_keys and all(len(v) > 0 for v in rep.hot_keys.values())

    # healthy join: no data errors when start_ds leaves enough lookback
    gb_ok = dataclasses.replace(
        gb, aggregations=(Aggregation("len_text", Operation.SUM, windows=(specs.W1D,)),))
    join_ok = Join(
        name="j3",
        left=EventSource(table=tpath, query=Query(time_column="ts")),
        parts=(JoinPart(gb_ok),),
    )
    import pandas as pd
    lo = spark.read.parquet(tpath).agg(F.max("ts")).collect()[0][0]
    ok_start = pd.Timestamp(lo).strftime("%Y-%m-%d")
    rep2 = analyze_join(spark, join_ok, check_data=True, start_ds=ok_start)
    assert rep2.ok, (rep2.errors, rep2.warnings)


def test_analyzer_timestamp_sanity(spark, tmp_path):
    import pandas as pd
    bad = pd.DataFrame({"k": ["a", "b"], "ts_ms": [123, 456], "v": [1.0, 2.0]})
    p = str(tmp_path / "bad.parquet")
    spark.createDataFrame(bad).write.mode("overwrite").parquet(p)
    gb = GroupBy(
        name="badts",
        sources=(EventSource(table=p, query=Query(time_column="ts_ms")),),
        key_columns=("k",),
        aggregations=(Aggregation("v", Operation.SUM),),
    )
    rep = analyze_group_by(spark, gb, check_data=True)
    assert any("epoch-millis" in w for w in rep.warnings), (rep.errors, rep.warnings)


def test_simhash_plan_is_shuffle_free(spark, tpath):
    """simhash64 computes per row via array folds — the physical plan up to
    the simhash values must contain NO Exchange (the r2 implementation
    shuffled exploded tokens through a 31-buffer hash aggregate)."""
    from zipline_chronon_spark.operators.dedup import simhash64

    df = spark.read.parquet(tpath).select(
        F.col("conv_id").alias("doc_id"), F.col("text"))
    plan = _physical(simhash64(df.where("text IS NOT NULL")))
    assert "Exchange" not in plan, plan


def test_analyzer_external_part_keys(spark, tpath):
    from zipline_chronon_spark.api import (EventSource, ExternalPart,
                                           ExternalSource, Join, JoinPart, Query)
    from zipline_chronon_spark.plans.analyzer import analyze_join

    gb = GroupBy(
        name="g",
        sources=(specs.transcripts_source(tpath),),
        key_columns=("conv_id",),
        aggregations=(Aggregation("len_text", Operation.SUM, windows=(specs.W1D,)),),
    )
    ext = ExternalSource(name="r", key_columns=("uid",), value_columns=("score",))
    j = Join(
        name="xj",
        left=EventSource(table=tpath, query=Query(time_column="ts")),
        parts=(JoinPart(group_by=gb),),
        online_external_parts=(
            ExternalPart(source=ext, key_mapping=(("nope_col", "uid"),)),),
    )
    rep = analyze_join(spark, j)
    assert any("missing left column 'nope_col'" in e for e in rep.errors), rep.errors
    # fixed mapping -> clean
    j2 = Join(
        name="xj2",
        left=EventSource(table=tpath, query=Query(time_column="ts")),
        parts=(JoinPart(group_by=gb),),
        online_external_parts=(
            ExternalPart(source=ext, key_mapping=(("conv_id", "uid"),)),),
    )
    rep2 = analyze_join(spark, j2)
    assert not rep2.errors, rep2.errors
    assert "ext_r_score" in rep2.output_schema


def test_analyzer_entity_groupby(spark, tmp_path_factory):
    import pandas as pd

    from zipline_chronon_spark.api import EntitySource, Query
    from zipline_chronon_spark.plans.analyzer import analyze_group_by

    pdf = pd.DataFrame({
        "ds": ["2024-03-01"] * 3,
        "user_id": [1, 2, 3],
        "amount": [1.0, 2.0, 3.0],
        "ts": [1_700_000_000_000 + i for i in range(3)],
    })
    path = str(tmp_path_factory.mktemp("aent") / "snap.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)

    gb = GroupBy(
        name="bal",
        sources=(EntitySource(snapshot_table=path, query=Query(time_column="ts")),),
        key_columns=("user_id",),
        aggregations=(Aggregation("amount", Operation.SUM),),
    )
    rep = analyze_group_by(spark, gb, check_data=True)
    assert not rep.errors, rep.errors
    assert rep.output_schema.get("amount_sum") == "double"
    # bad key surfaces as a named error, not an AttributeError
    import dataclasses
    bad = dataclasses.replace(gb, key_columns=("nope",))
    rep2 = analyze_group_by(spark, bad)
    assert any("'nope'" in e for e in rep2.errors), rep2.errors


def test_derivation_validation(spark, tmp_path_factory):
    """Derivation expressions are Catalyst-analyzed against the real output
    schema at spec time: a typo'd column or type-invalid expression fails
    with a named error BEFORE any backfill runs; expressions over
    fetch-time external columns downgrade to warnings."""
    import dataclasses

    import pandas as pd

    from zipline_chronon_spark.api import (Aggregation, Derivation, EventSource,
                                           GroupBy, Operation, Query)
    from zipline_chronon_spark.plans.analyzer import analyze_group_by

    pdf = pd.DataFrame({"k": ["a", "b"], "ts_ms": [1_700_000_000_000] * 2,
                        "v": [1.0, 2.0]})
    spark.createDataFrame(pdf).createOrReplaceTempView("anl_ev4")
    gb = GroupBy(
        name="anl4",
        sources=(EventSource(table="anl_ev4", query=Query(time_column="ts_ms")),),
        key_columns=("k",),
        aggregations=(Aggregation("v", Operation.SUM, windows=(None,)),
                      Aggregation("v", Operation.COUNT, windows=(None,))),
        derivations=(Derivation("*", "*"),
                     Derivation("rate", "v_sum / v_count")),
    )
    assert analyze_group_by(spark, gb).ok

    bad = dataclasses.replace(gb, derivations=(
        Derivation("rate", "v_sum / v_countt"),))  # typo'd column
    rep = analyze_group_by(spark, bad)
    assert not rep.ok and any("derivation 'rate'" in e for e in rep.errors)

    bad2 = dataclasses.replace(gb, derivations=(
        Derivation("boom", "substr(v_sum,, 1)"),))  # unparsable
    rep2 = analyze_group_by(spark, bad2)
    assert not rep2.ok and any("derivation 'boom'" in e for e in rep2.errors)


def test_join_derivation_external_warning(spark):
    """A join derivation over an external (fetch-time) column cannot be
    validated offline -> warning, not error."""
    import pandas as pd

    from zipline_chronon_spark.api import (Aggregation, Derivation, EventSource,
                                           ExternalPart, ExternalSource, GroupBy,
                                           Join, JoinPart, Operation, Query)
    from zipline_chronon_spark.plans.analyzer import analyze_join

    pdf = pd.DataFrame({"k": ["a"], "ts_ms": [1_700_000_000_000], "v": [1.0]})
    spark.createDataFrame(pdf).createOrReplaceTempView("anl_ev5")
    gb = GroupBy(
        name="anl5",
        sources=(EventSource(table="anl_ev5", query=Query(time_column="ts_ms")),),
        key_columns=("k",),
        aggregations=(Aggregation("v", Operation.SUM, windows=(None,)),),
    )
    join = Join(
        name="anlj5",
        left=EventSource(table="anl_ev5", query=Query(time_column="ts_ms")),
        parts=(JoinPart(group_by=gb),),
        online_external_parts=(ExternalPart(
            source=ExternalSource(name="scorer", key_columns=("k",),
                                  value_columns=("score",)),),),
        derivations=(Derivation("*", "*"),
                     Derivation("boosted", "ext_scorer_score * 2"),
                     Derivation("ok_col", "anl5_v_sum + 1")),
    )
    rep = analyze_join(spark, join)
    assert rep.ok, rep.errors  # external-col derivation is only a warning
    assert any("fetch-time" in w for w in rep.warnings)
