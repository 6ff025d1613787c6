"""SNAPSHOT-accuracy join parts: a left row on ts-day d sees features as of
end-of-day(d-1).

Reference cells (JoinPartJob.scala:217-247):
 - (EVENTS, EVENTS, SNAPSHOT)   -> snapshotEvents over range shifted -1 day,
   joined on ts_ds with +1-day realignment (JoinBase.scala:66-125)
 - (EVENTS, ENTITIES, SNAPSHOT) -> snapshotEntities over the shifted range,
   same day-keyed join
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zipline_chronon_spark.api import (
    Accuracy,
    Aggregation,
    EntitySource,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    TimeUnit,
    Window,
)
from zipline_chronon_spark.operators.join import compute_join

MS_DAY = 86_400_000
BASE = 19_100


@pytest.fixture(scope="module")
def events_table(spark, tmp_path_factory):
    rng = np.random.default_rng(17)
    pdf = pd.DataFrame({
        "user_id": rng.integers(0, 5, 300),
        "value": np.round(rng.random(300) * 10, 3),
        "ts": BASE * MS_DAY + rng.integers(0, 9 * MS_DAY, 300),
        "event_id": np.arange(300),
    })
    path = str(tmp_path_factory.mktemp("js") / "events.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    return pdf, path


def test_events_events_snapshot_cell(spark, events_table):
    pdf, path = events_table
    left = EventSource(table=path, query=Query(
        time_column="ts", selects={"event_id": "event_id", "user_id": "user_id"}))
    gb = GroupBy(
        name="snapgb",
        sources=(EventSource(table=path, query=Query(time_column="ts")),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.SUM, windows=(Window(3, TimeUnit.DAYS),)),
            Aggregation("value", Operation.COUNT, windows=(None,)),
        ),
        accuracy=Accuracy.SNAPSHOT,
        tie_breaker_column="event_id",
    )
    j = Join(name="sj", left=left, parts=(JoinPart(group_by=gb),))
    got = (compute_join(spark, j).toPandas()
           .sort_values("event_id").reset_index(drop=True))
    assert len(got) == len(pdf)
    for _, r in got.iterrows():
        lrow = pdf[pdf.event_id == r.event_id].iloc[0]
        d = lrow.ts // MS_DAY
        before = pdf[(pdf.user_id == lrow.user_id) & (pdf.ts < d * MS_DAY)]
        in_w = before[before.ts >= (d - 3) * MS_DAY]
        exp_sum = in_w.value.sum() if len(in_w) else None
        exp_cnt = len(before) if len(before) else None
        gs, gc = r["snapgb_value_sum_3d"], r["snapgb_value_count"]
        assert (exp_sum is None) == pd.isna(gs), r.event_id
        if exp_sum is not None:
            assert abs(gs - exp_sum) < 1e-9, r.event_id
        assert (exp_cnt is None) == pd.isna(gc), r.event_id
        if exp_cnt is not None:
            assert gc == exp_cnt, r.event_id


def test_events_entities_snapshot_cell(spark, tmp_path_factory):
    # dimension snapshotted on two days; left rows on the day AFTER each
    # snapshot must see exactly that snapshot's aggregate
    rows = [
        ("2024-03-01", 1, 10.0), ("2024-03-01", 1, 5.0), ("2024-03-01", 2, 7.0),
        ("2024-03-02", 1, 10.0), ("2024-03-02", 1, 5.0), ("2024-03-02", 2, 99.0),
        ("2024-03-02", 3, 1.0),
    ]
    pdf = pd.DataFrame(rows, columns=["ds", "user_id", "amount"])
    pdf["ts"] = (pd.to_datetime(pdf["ds"]).astype("int64") // 10**6
                 + 3_600_000)  # 01:00 within the day
    base = tmp_path_factory.mktemp("jse")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(base / "snap"))

    day0 = pd.Timestamp("2024-03-01").value // 10**6 // MS_DAY
    left_pdf = pd.DataFrame({
        # days: 03-02 (sees 03-01 snapshot), 03-03 (sees 03-02), 03-01 (sees none)
        "user_id": [1, 2, 1, 3, 1],
        "ts": [(day0 + 1) * MS_DAY + 100, (day0 + 1) * MS_DAY + 200,
               (day0 + 2) * MS_DAY + 300, (day0 + 2) * MS_DAY + 400,
               day0 * MS_DAY + 500],
        "qid": [0, 1, 2, 3, 4],
    })
    spark.createDataFrame(left_pdf).write.mode("overwrite").parquet(str(base / "left"))

    gb = GroupBy(
        name="bal",
        sources=(EntitySource(snapshot_table=str(base / "snap"),
                              query=Query(time_column="ts")),),
        key_columns=("user_id",),
        aggregations=(Aggregation("amount", Operation.SUM),),
        accuracy=Accuracy.SNAPSHOT,
    )
    j = Join(
        name="ej",
        left=EventSource(table=str(base / "left"), query=Query(
            time_column="ts", selects={"qid": "qid", "user_id": "user_id"})),
        parts=(JoinPart(group_by=gb),),
    )
    got = (compute_join(spark, j).toPandas()
           .sort_values("qid").reset_index(drop=True))
    exp = [15.0, 7.0, 15.0, 1.0, None]  # qid 4 is before any snapshot
    for i, e in enumerate(exp):
        v = got.loc[i, "bal_amount_sum"]
        assert (e is None and pd.isna(v)) or v == e, (i, v, e)
