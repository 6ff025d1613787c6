"""Catalog seam: partition listing, dynamic overwrite, autoExpand schema
evolution, archival — the TableUtils.scala:287-358 contract on the
parquet-backed implementation (Iceberg is a constructor swap)."""

from __future__ import annotations

import dataclasses
import os

import pytest
from pyspark.sql import functions as F

from tests import specs
from zipline_chronon_spark.api import Aggregation, GroupBy, Operation
from zipline_chronon_spark.catalog import ParquetWarehouse
from zipline_chronon_spark.plans.backfill import GroupByBackfill
from zipline_chronon_spark.sources.transcripts import generate_transcripts


@pytest.fixture()
def wh(spark):
    return ParquetWarehouse(spark)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema=schema)


def test_partition_listing_and_overwrite(spark, wh, tmp_path):
    t = str(tmp_path / "tbl")
    assert not wh.exists(t)
    assert wh.partitions(t) == []
    df = _df(spark, [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], "id long, v string, ds string")
    wh.insert_partitions(df, t)
    assert wh.exists(t)
    assert wh.partitions(t) == ["2024-01-01", "2024-01-02"]
    # dynamic overwrite: only the touched partition is replaced
    df2 = _df(spark, [(9, "z", "2024-01-02")], "id long, v string, ds string")
    wh.insert_partitions(df2, t)
    got = wh.read(t).orderBy("ds").collect()
    assert [(r["id"], str(r["ds"])) for r in got] == [(1, "2024-01-01"), (9, "2024-01-02")]


def test_auto_expand_both_directions(spark, wh, tmp_path):
    t = str(tmp_path / "tbl")
    wh.insert_partitions(
        _df(spark, [(1, "a", "2024-01-01")], "id long, v string, ds string"), t)
    # new column arrives: schema extends, old rows read as null
    wh.insert_partitions(
        _df(spark, [(2, "b", 7.5, "2024-01-02")], "id long, v string, extra double, ds string"), t)
    got = {str(r["ds"]): r for r in wh.read(t).collect()}
    assert got["2024-01-01"]["extra"] is None
    assert got["2024-01-02"]["extra"] == 7.5
    # column disappears from a later write: null-filled, not dropped
    wh.insert_partitions(
        _df(spark, [(3, "2024-01-03")], "id long, ds string"), t)
    got = {str(r["ds"]): r for r in wh.read(t).collect()}
    assert got["2024-01-03"]["v"] is None and got["2024-01-03"]["extra"] is None
    assert got["2024-01-01"]["v"] == "a"


def test_archive(spark, wh, tmp_path):
    t = str(tmp_path / "tbl")
    assert wh.archive(t) is None
    wh.insert_partitions(_df(spark, [(1, "2024-01-01")], "id long, ds string"), t)
    dest = wh.archive(t, reason="test")
    assert dest and os.path.isdir(dest) and not wh.exists(t)
    assert wh.partitions(dest) == ["2024-01-01"]


def test_backfill_spec_change_archives_through_seam(spark, tmp_path_factory):
    pdf = generate_transcripts(n_convs=6, avg_turns=15, n_days=3, seed=21)
    src = str(tmp_path_factory.mktemp("cat") / "t.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    ds_min, ds_max = pdf["ds"].min(), pdf["ds"].max()
    out = str(tmp_path_factory.mktemp("cat") / "out")

    def gb(aggs):
        return GroupBy(
            name="cat_bf", sources=(specs.transcripts_source(src),),
            key_columns=("conv_id",), aggregations=aggs,
            tie_breaker_column="turn_idx",
        )

    job1 = GroupByBackfill(
        spark, gb((Aggregation("text", Operation.COUNT, windows=(None,)),)),
        out, "xxhash64(conv_id, turn_idx)")
    job1.run(ds_min, ds_max)
    cols1 = set(ParquetWarehouse(spark).read(out).columns)
    assert "text_count" in cols1

    job2 = GroupByBackfill(
        spark, gb((Aggregation("len_text", Operation.SUM, windows=(None,)),)),
        out, "xxhash64(conv_id, turn_idx)")
    res = job2.run(ds_min, ds_max)
    assert res["archived"] is not None and os.path.isdir(res["archived"])
    cols2 = set(ParquetWarehouse(spark).read(out).columns)
    assert "len_text_sum" in cols2 and "text_count" not in cols2
    # archived table still holds the old spec's output + lineage
    assert "text_count" in set(ParquetWarehouse(spark).read(res["archived"]).columns)
    assert os.path.exists(os.path.join(res["archived"], "_lineage.jsonl"))
    # idempotent: rerun computes nothing further
    res2 = job2.run(ds_min, ds_max)
    assert res2["computed_chunks"] == [] and res2["archived"] is None
