"""Focused tests for the round-6 optimization internals: each pins an
equivalence that a performance rewrite relied on."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


def test_sorted_quantiles_matches_np_quantile_bitwise():
    """_sorted_quantiles is the exact-regime KLL finalize fast lane; it must
    reproduce np.quantile(method='linear') bit-for-bit on sorted input."""
    from zipline_chronon_spark.operators.approx_engine import _sorted_quantiles

    rng = np.random.default_rng(7)
    for trial in range(500):
        m = int(rng.integers(1, 120))
        v = np.sort(rng.normal(size=m) * (10.0 ** float(rng.integers(-3, 6))))
        qs = sorted(rng.uniform(0, 1, size=int(rng.integers(1, 4))).tolist())
        if trial % 5 == 0:
            qs = [0.0, 0.5, 0.95, 1.0]
        expect = [float(x) for x in np.quantile(v, qs)]
        got = _sorted_quantiles(v, qs)
        assert got == expect, (m, qs)
    assert all(np.isnan(x) for x in _sorted_quantiles(np.empty(0), [0.5, 0.9]))


def test_ir_plan_dedupes_by_content():
    """Windowed variants of an aggregation must share one tile-IR column
    class; the map must point every part at its representative."""
    from zipline_chronon_spark.api import (Aggregation, EventSource, GroupBy,
                                           Operation, Query, TimeUnit, Window)
    from zipline_chronon_spark.operators.approx_engine import _ir_plan

    W1, W7 = Window(1, TimeUnit.DAYS), Window(7, TimeUnit.DAYS)
    gb = GroupBy(
        name="g",
        sources=(EventSource(table="t", query=Query(time_column="ts")),),
        key_columns=("k",),
        aggregations=(
            Aggregation("v", Operation.SUM, windows=(W1, None)),
            Aggregation("v", Operation.AVERAGE, windows=(W7,)),
            Aggregation("v", Operation.COUNT, windows=(W7,)),
            Aggregation("e", Operation.APPROX_UNIQUE_COUNT, windows=(W7, None)),
            Aggregation("v", Operation.MIN, windows=(W7,)),
        ),
    )
    gb_ir, ir_map = _ir_plan(gb)
    reps = {p.output_name for p in gb_ir.parts()}
    # SUM_1d / SUM / AVG_7d / COUNT_7d collapse to one sumcnt class; both
    # AUC windows to one HLL class; MIN stays its own
    assert len(reps) == 3
    assert (ir_map["v_sum_1d"] == ir_map["v_sum"] == ir_map["v_average_7d"]
            == ir_map["v_count_7d"])
    assert ir_map["e_approx_unique_count_7d"] == ir_map["e_approx_unique_count"]
    assert set(ir_map) == {p.output_name for p in gb.parts()}
    assert set(ir_map.values()) == reps


def test_bucket_pairs_matches_self_join(spark):
    """The higher-order pair expansion must emit exactly the (a < b) pairs
    of the old band self-join, including the max_bucket cap."""
    from zipline_chronon_spark.operators.dedup import _bucket_pairs

    rng = np.random.default_rng(3)
    rows = [(int(rng.integers(0, 12)), int(i)) for i in range(200)]
    bands = spark.createDataFrame(pd.DataFrame(rows, columns=["band_key", "id"]))
    for cap in (None, 20):
        grouped = bands.groupBy("band_key").agg(
            F.sort_array(F.collect_list("id")).alias("__ids"))
        got = {(r[0], r[1]) for r in _bucket_pairs(grouped, cap).collect()}
        b = bands
        if cap is not None:
            hot = (b.groupBy("band_key").count().where(F.col("count") > cap)
                   .select("band_key"))
            b = b.join(hot, "band_key", "left_anti")
        a2, b2 = b.alias("a"), b.alias("b")
        exp = {(r[0], r[1]) for r in a2.join(
            b2, (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id"), F.col("b.id")).distinct().collect()}
        assert got == exp and len(got) > 0


def test_join_part_fusion_matches_unfused(spark):
    """compute_join fusing two compatible TEMPORAL parts must equal the
    per-part computation (column names, order and values)."""
    import pandas as pdd

    from zipline_chronon_spark.api import (Aggregation, EventSource, GroupBy,
                                           Join, JoinPart, Operation, Query,
                                           TimeUnit, Window)
    from zipline_chronon_spark.operators.join import compute_join

    rng = np.random.default_rng(5)
    n = 400
    pdf = pdd.DataFrame({
        "k": rng.integers(0, 20, size=n),
        "ts": 1_700_000_000_000 + rng.integers(0, 5 * 86_400_000, size=n),
        "v": np.round(rng.normal(size=n) * 10, 3),
        "rid": np.arange(n, dtype=np.int64),
    })
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("r06_fusion_events")
    src = EventSource(table="r06_fusion_events",
                      query=Query(selects={"k": "k", "v": "v", "rid": "rid"},
                                  time_column="ts"))
    W1 = Window(1, TimeUnit.DAYS)
    gb_a = GroupBy(name="ga", sources=(src,), key_columns=("k",),
                   aggregations=(Aggregation("v", Operation.COUNT, windows=(W1,)),
                                 Aggregation("v", Operation.SUM, windows=(W1,))),
                   tie_breaker_column="rid")
    gb_b = GroupBy(name="gb", sources=(src,), key_columns=("k",),
                   aggregations=(Aggregation("v", Operation.LAST, windows=(W1,)),),
                   tie_breaker_column="rid")

    def run(parts):
        j = Join(name="j", left=src, parts=parts, row_ids=("rid",))
        out = compute_join(spark, j)
        return out.orderBy("rid").toPandas()

    fused = run((JoinPart(gb_a), JoinPart(gb_b, prefix="p")))
    # incompatible tie-breakers block fusion -> the unfused path
    import dataclasses
    gb_b2 = dataclasses.replace(gb_b, tie_breaker_column=None)
    unfused = run((JoinPart(gb_a), JoinPart(gb_b2, prefix="p")))
    assert list(fused.columns) == list(unfused.columns)
    for c in fused.columns:
        a, b = fused[c].tolist(), unfused[c].tolist()
        assert a == pytest.approx(b, nan_ok=True), c
