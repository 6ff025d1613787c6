"""Offline/online ConsistencyJob (plans/consistency.py): serve a Join via a
logging fetcher, diff the log against the offline join output — 100% match
on an honest run; a corrupted logged response is detected per-column.
(Reference: spark/.../stats/CompareJob.scala + ConsistencyJob;
EditDistance.scala for the string metric.)"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zipline_chronon_spark.api import (Aggregation, Derivation, EventSource,
                                       GroupBy, Join, JoinPart, Operation,
                                       Query, TimeUnit, Window)
from zipline_chronon_spark.online.fetcher import upload_batch_state, upload_stream_events
from zipline_chronon_spark.online.kv import InMemoryKv
from zipline_chronon_spark.operators.join import compute_join, release_caches
from zipline_chronon_spark.plans.consistency import (FetchLog, LoggingJoinFetcher,
                                                     consistency_report)

BASE = 1_700_000_000_000
HOP = 300_000


@pytest.fixture(scope="module")
def setup(spark):
    rng = np.random.default_rng(17)
    n = 2500
    pdf = pd.DataFrame({
        "u": rng.integers(0, 8, size=n).astype("int64"),
        "ts_ms": BASE + rng.integers(0, 2 * 86_400_000, size=n),
        "v": rng.normal(5, 2, size=n).round(3),
    }).astype({"ts_ms": "int64"})
    spark.createDataFrame(pdf).createOrReplaceTempView("cx_events")

    gb = GroupBy(
        name="cx",
        sources=(EventSource(table="cx_events", query=Query(time_column="ts_ms")),),
        key_columns=("u",),
        aggregations=(
            Aggregation("v", Operation.SUM, windows=(None, Window(1, TimeUnit.DAYS))),
            Aggregation("v", Operation.COUNT, windows=(None,)),
        ),
    )
    t1 = BASE + 2 * 86_400_000 + 3_600_000
    t0 = ((BASE + 86_400_000) // HOP) * HOP

    # one left row per key, all at t1 (the logged traffic we'll replay)
    q = pd.DataFrame({"u": np.arange(8, dtype=np.int64),
                      "ts_ms": np.int64(t1)})
    spark.createDataFrame(q).createOrReplaceTempView("cx_left")
    join = Join(
        name="cxj",
        left=EventSource(table="cx_left", query=Query(time_column="ts_ms")),
        parts=(JoinPart(group_by=gb),),
        derivations=(Derivation("*", "*"),
                     Derivation("v_rate", "cx_v_sum / cx_v_count")),
    )
    kv = InMemoryKv()
    upload_batch_state(kv, spark, gb, t0)
    upload_stream_events(kv, spark, gb, t0, t1)
    offline = compute_join(spark, join).toPandas()
    release_caches()
    offline_df = spark.createDataFrame(offline)
    return join, kv, t1, offline_df


def _serve(spark, join, kv, t1):
    log = FetchLog()
    jf = LoggingJoinFetcher(kv, join, spark=spark, log=log)
    for u in range(8):
        jf.fetch_join({"u": u, "ts_ms": t1}, at_ts_ms=t1)
    return log


def test_honest_serving_fully_consistent(spark, setup):
    join, kv, t1, offline_df = setup
    log = _serve(spark, join, kv, t1)
    rep = consistency_report(spark, log.to_df(spark), offline_df, key_cols=["u"])
    assert rep["n_logged"] == 8 and rep["n_joined"] == 8
    assert rep["overall_match_rate"] == 1.0
    assert set(rep["columns"]) >= {"cx_v_sum", "cx_v_sum_1d", "cx_v_count", "v_rate"}
    for c, d in rep["columns"].items():
        assert d["match_rate"] == 1.0, (c, d)
        if "max_abs_delta" in d:
            assert d["max_abs_delta"] <= 1e-6, (c, d)


def test_wrong_on_purpose_row_detected(spark, setup):
    join, kv, t1, offline_df = setup
    log = _serve(spark, join, kv, t1)
    # corrupt ONE served value for one user (a stale-cache / lost-tile bug)
    log.records[3]["response"]["cx_v_sum"] += 100.0
    rep = consistency_report(spark, log.to_df(spark), offline_df, key_cols=["u"])
    bad = rep["columns"]["cx_v_sum"]
    assert bad["matches"] == 7 and bad["match_rate"] == 7 / 8
    assert bad["max_abs_delta"] >= 99.0
    assert rep["overall_match_rate"] < 1.0
    # untouched columns stay clean
    assert rep["columns"]["cx_v_count"]["match_rate"] == 1.0
