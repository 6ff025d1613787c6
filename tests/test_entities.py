"""ENTITIES x SNAPSHOT: each ds partition aggregates independently."""

from __future__ import annotations

import pandas as pd
import pytest

from zipline_chronon_spark.api import (
    Aggregation,
    EntitySource,
    GroupBy,
    Operation,
    Query,
    TimeUnit,
    Window,
)
from zipline_chronon_spark.operators.pit_join import compute_entity_snapshot


@pytest.fixture(scope="module")
def snapshot_table(spark, tmp_path_factory):
    # a mutable "user balances" dimension snapshotted on two days; user 2's
    # row mutates between snapshots, user 3 appears only on day 2
    rows = [
        # ds, user, item, amount, ts (row event time within the day)
        ("2024-03-01", 1, "a", 10.0, "2024-03-01 01:00:00"),
        ("2024-03-01", 1, "b", 5.0, "2024-03-01 23:00:00"),
        ("2024-03-01", 2, "a", 7.0, "2024-03-01 12:00:00"),
        ("2024-03-02", 1, "a", 10.0, "2024-03-01 01:00:00"),
        ("2024-03-02", 1, "b", 5.0, "2024-03-01 23:00:00"),
        ("2024-03-02", 2, "a", 99.0, "2024-03-02 06:00:00"),  # mutated
        ("2024-03-02", 3, "c", 1.0, "2024-03-02 03:00:00"),   # new entity
    ]
    pdf = pd.DataFrame(rows, columns=["ds", "user_id", "item", "amount", "ts_s"])
    pdf["ts"] = pd.to_datetime(pdf["ts_s"]).astype("datetime64[us]")
    path = str(tmp_path_factory.mktemp("ent") / "snap.parquet")
    spark.createDataFrame(pdf.drop(columns="ts_s")).write.mode("overwrite").parquet(path)
    return path


def test_entity_snapshot(spark, snapshot_table):
    gb = GroupBy(
        name="balances",
        sources=(EntitySource(
            snapshot_table=snapshot_table,
            query=Query(time_column="ts"),
        ),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("amount", Operation.SUM),
            Aggregation("amount", Operation.COUNT),
            Aggregation("amount", Operation.SUM, windows=(Window(12, TimeUnit.HOURS),)),
        ),
    )
    got = compute_entity_snapshot(spark, gb).toPandas().sort_values(
        ["ds", "user_id"]).reset_index(drop=True)
    idx = got.set_index(["ds", "user_id"])
    # day 1: user 1 has two rows (10 + 5); only the 23:00 row is within the
    # trailing 12h window ending at eod
    assert idx.loc[("2024-03-01", 1), "amount_sum"] == 15.0
    assert idx.loc[("2024-03-01", 1), "amount_count"] == 2
    assert idx.loc[("2024-03-01", 1), "amount_sum_12h"] == 5.0
    assert idx.loc[("2024-03-01", 2), "amount_sum"] == 7.0
    # day 2: partitions aggregate independently — user 2 reflects the
    # mutation only, user 3 exists only here
    assert idx.loc[("2024-03-02", 2), "amount_sum"] == 99.0
    assert idx.loc[("2024-03-02", 3), "amount_sum"] == 1.0
    assert ("2024-03-01", 3) not in idx.index
    # day-2 12h window ends at eod(03-02): user 1's rows are day-1 times
    assert pd.isna(idx.loc[("2024-03-02", 1), "amount_sum_12h"])
