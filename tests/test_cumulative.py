"""Cumulative event sources: every ds partition holds the full history up
to that day, so the engine must scan ONLY the latest partition (reference
GroupBy.scala:759-764); scanning all partitions double-counts.

Oracle: a cumulative table's features == the same GroupBy over a plain
table containing exactly the latest partition's rows.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from zipline_chronon_spark.api import (
    Aggregation, EventSource, GroupBy, Operation, Query, TimeUnit, Window,
)
from zipline_chronon_spark.operators.pit_join import compute_group_by

MS_DAY = 86_400_000
BASE = 19_000  # days since epoch


def _events() -> pd.DataFrame:
    rows = []
    for i in range(120):
        day = i % 3  # events spread over 3 days
        rows.append({
            "user_id": i % 5,
            "value": float(i),
            "ts": (BASE + day) * MS_DAY + (i * 977) % MS_DAY,
            "event_id": i,
        })
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cumul")
    pdf = _events()
    # cumulative layout: partition d contains ALL events with day <= d
    parts = []
    for d in range(3):
        ds = pd.Timestamp((BASE + d) * MS_DAY, unit="ms").strftime("%Y-%m-%d")
        chunk = pdf[pdf["ts"] < (BASE + d + 1) * MS_DAY].copy()
        chunk["ds"] = ds
        parts.append(chunk)
    cum = pd.concat(parts, ignore_index=True)
    spark.createDataFrame(cum).write.partitionBy("ds").mode("overwrite") \
        .parquet(str(base / "cumulative"))
    # plain layout: just the events (== content of the latest partition)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(base / "plain"))
    return str(base / "cumulative"), str(base / "plain")


def _gb(table: str, cumulative: bool) -> GroupBy:
    return GroupBy(
        name="cum",
        sources=(EventSource(table=table, query=Query(time_column="ts"),
                             is_cumulative=cumulative),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.SUM, windows=(Window(7, TimeUnit.DAYS),)),
            Aggregation("value", Operation.COUNT, windows=(None,)),
        ),
        tie_breaker_column="event_id",
    )


def _queries(spark):
    q = pd.DataFrame({
        "user_id": [0, 1, 2, 3, 4, 0, 1],
        "ts": [(BASE + 3) * MS_DAY + i * 1000 for i in range(7)],
        "__row_id": list(range(7)),
    })
    return spark.createDataFrame(q)


def test_cumulative_equals_latest_partition(spark, tables):
    cum_table, plain_table = tables
    q = _queries(spark)
    got = (compute_group_by(spark, _gb(cum_table, True), q)
           .toPandas().sort_values("__row_id").reset_index(drop=True))
    exp = (compute_group_by(spark, _gb(plain_table, False), q)
           .toPandas().sort_values("__row_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_like=True)
    # and the naive (wrong) interpretation really would differ: reading all
    # partitions of the cumulative table double/triple-counts
    naive = (compute_group_by(spark, _gb(cum_table, False), q)
             .toPandas().sort_values("__row_id").reset_index(drop=True))
    assert (naive["value_count"] > exp["value_count"]).any()


def test_cumulative_without_partition_column_raises(spark, tables):
    _, plain_table = tables  # plain table has no ds column
    q = _queries(spark)
    with pytest.raises(ValueError, match="partition column"):
        compute_group_by(spark, _gb(plain_table, True), q).collect()
