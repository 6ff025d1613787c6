"""SNAPSHOT accuracy + vector/map input shapes vs hand-rolled oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests import specs
from zipline_chronon_spark.api import (
    Accuracy,
    Aggregation,
    EventSource,
    GroupBy,
    Operation,
    Query,
    TimeUnit,
    Window,
)
from zipline_chronon_spark.operators import pit_join
from zipline_chronon_spark.sources.transcripts import generate_transcripts

MS_DAY = 86_400_000


def test_snapshot_daily(spark, tmp_path_factory):
    pdf = generate_transcripts(n_convs=10, avg_turns=25, n_days=6, seed=31)
    path = str(tmp_path_factory.mktemp("snap") / "t.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)

    gb = GroupBy(
        name="snap",
        sources=(specs.transcripts_source(path),),
        key_columns=("conv_id",),
        aggregations=(
            Aggregation("text", Operation.COUNT, windows=(Window(3, TimeUnit.DAYS), None)),
            Aggregation("len_text", Operation.SUM, windows=(Window(3, TimeUnit.DAYS),)),
        ),
        accuracy=Accuracy.SNAPSHOT,
        tie_breaker_column="turn_idx",
    )
    got = pit_join.compute_snapshot(spark, gb).toPandas().sort_values(
        ["conv_id", "ds"]).reset_index(drop=True)

    ev = pdf.copy()
    ev["ts_ms"] = ev["ts"].astype("datetime64[ms]").astype("int64")
    ev["len_text"] = ev["text"].str.len()
    ev["day"] = ev["ts_ms"] // MS_DAY
    rows = []
    for (conv, day), _ in ev.groupby(["conv_id", "day"]):
        eod_excl = (day + 1) * MS_DAY
        w3_lo = eod_excl - 3 * MS_DAY  # 3 calendar days ending at eod
        sub = ev[(ev["conv_id"] == conv) & (ev["ts_ms"] < eod_excl)]
        sub3 = sub[(sub["ts_ms"] >= w3_lo)]
        t = sub["text"].dropna()
        t3 = sub3["text"].dropna()
        l3 = sub3["len_text"].dropna()
        rows.append({
            "conv_id": conv,
            "ds": pd.Timestamp(day * MS_DAY, unit="ms").strftime("%Y-%m-%d"),
            "text_count_3d": len(t3) or None,
            "text_count": len(t) or None,
            "len_text_sum_3d": int(l3.sum()) if len(l3) else None,
        })
    exp = pd.DataFrame(rows).sort_values(["conv_id", "ds"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for c in ("text_count_3d", "text_count", "len_text_sum_3d"):
        a = got[c].astype("float64").fillna(-1).tolist()
        b = exp[c].astype("float64").fillna(-1).tolist()
        assert a == b, (c, [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:5])


@pytest.fixture(scope="module")
def shaped(spark):
    rows = []
    base = 1_700_000_000_000
    for i in range(60):
        rows.append((
            "k1" if i % 2 == 0 else "k2",
            base + i * 60_000,
            [float(i), float(i * 2)] if i % 5 != 0 else None,   # vector input
            {"a": i, "b": i * 10} if i % 3 != 0 else {"a": i},  # map input
            i,
        ))
    pdf = pd.DataFrame(rows, columns=["key", "ts_ms", "vec", "m", "i"])
    df = spark.createDataFrame(
        rows, "key string, ts_ms long, vec array<double>, m map<string,long>, i long")
    df.createOrReplaceTempView("shaped_events")
    return pdf


def _shaped_gb(aggs):
    return GroupBy(
        name="shaped",
        sources=(EventSource(table="shaped_events", query=Query(time_column="ts_ms")),),
        key_columns=("key",),
        aggregations=aggs,
        tie_breaker_column="i",
    )


def test_vector_input_explodes(spark, shaped):
    gb = _shaped_gb((
        Aggregation("vec", Operation.SUM, windows=(None,)),
        Aggregation("vec", Operation.COUNT, windows=(None,)),
        Aggregation("vec", Operation.MAX, windows=(None,)),
    ))
    left = spark.table("shaped_events").select(
        "key", F.col("ts_ms").alias("qts"), F.col("i").cast("long").alias("__row_id"))
    got = pit_join.compute_group_by(spark, gb, left, row_id="__row_id",
                                    query_time_col="qts").toPandas()
    got = got.sort_values("__row_id").reset_index(drop=True)
    exp_rows = {}
    for key in ("k1", "k2"):
        sub = shaped[shaped["key"] == key]
        for _, q in sub.iterrows():
            w = sub[(sub["ts_ms"] <= q["ts_ms"])]["vec"].dropna()
            flat = [v for x in w for v in x]
            exp_rows[q["i"]] = (sum(flat) if flat else None,
                                len(flat) if flat else None,
                                max(flat) if flat else None)
    def eq(x, y):
        if (x is None or x != x) and (y is None or y != y):
            return True
        return x == y

    for _, r in got.iterrows():
        e = exp_rows[r["__row_id"]]
        assert eq(r["vec_sum"], e[0]) and eq(r["vec_count"], e[1]) and eq(r["vec_max"], e[2]), (
            r["__row_id"], tuple(r[["vec_sum", "vec_count", "vec_max"]]), e)


def test_map_input_per_key(spark, shaped):
    gb = _shaped_gb((Aggregation("m", Operation.SUM, windows=(None,)),))
    left = spark.table("shaped_events").select(
        "key", F.col("ts_ms").alias("qts"), F.col("i").cast("long").alias("__row_id"))
    got = pit_join.compute_group_by(spark, gb, left, row_id="__row_id",
                                    query_time_col="qts").toPandas()
    got = got.sort_values("__row_id").reset_index(drop=True)
    for _, r in got.iterrows():
        i = r["__row_id"]
        key = "k1" if i % 2 == 0 else "k2"
        sub = shaped[(shaped["key"] == key) & (shaped["ts_ms"] <= 1_700_000_000_000 + i * 60_000)]
        exp_a = sum(d["a"] for d in sub["m"])
        exp_b = sum(d["b"] for d in sub["m"] if "b" in d)
        m = r["m_sum"]
        assert m["a"] == exp_a, (i, m, exp_a)
        if exp_b:
            assert m["b"] == exp_b, (i, m, exp_b)
