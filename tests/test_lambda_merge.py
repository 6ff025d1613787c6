"""Lambda-merge parity: batch sketch state at T0 merged with post-T0
stream tiles equals the batch engine evaluated at T1 — the reference's
strongest e2e oracle (offline join == online fetch,
FetcherTestUtil.scala:245-740; SawtoothOnlineAggregator.scala:86-167
lambdaAggregateFinalized)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from zipline_chronon_spark.api import Aggregation, EventSource, GroupBy, Operation, Query
from zipline_chronon_spark.operators.pit_join import compute_key_states
from zipline_chronon_spark.streaming import lambda_merge

BASE = 1_700_000_000_000
HOP_MS = 300_000  # 5 minutes


@pytest.fixture(scope="module")
def events(spark):
    rng = np.random.default_rng(5)
    n = 4000
    pdf = pd.DataFrame({
        "k": rng.integers(0, 7, size=n).astype(str),
        "ts_ms": BASE + rng.integers(0, 2 * 86_400_000, size=n),
        "v": rng.normal(size=n).round(3),
        "cat": [f"c{int(x)}" for x in rng.integers(0, 40, size=n)],
    })
    sdf = spark.createDataFrame(pdf.astype({"ts_ms": "int64"}))
    sdf.createOrReplaceTempView("lam_events")
    return pdf


def _gb():
    return GroupBy(
        name="lam",
        sources=(EventSource(table="lam_events", query=Query(time_column="ts_ms")),),
        key_columns=("k",),
        aggregations=(
            Aggregation("cat", Operation.APPROX_UNIQUE_COUNT, windows=(None,)),
            Aggregation("v", Operation.APPROX_PERCENTILE,
                        arg_map=(("percentiles", "[0.25, 0.5, 0.9]"),), windows=(None,)),
            Aggregation("cat", Operation.APPROX_FREQUENT_K,
                        arg_map=(("k", "3"),), windows=(None,)),
        ),
    )


def test_lambda_merge_equals_batch(spark, events):
    gb = _gb()
    t0 = BASE + 86_400_000  # batch end: day 1
    t0 = (t0 // HOP_MS) * HOP_MS  # tile-aligned
    t1 = t0 + 12 * 3_600_000  # fetch point: 12h of "stream" later

    df = spark.table("lam_events")
    batch_events = df.where(F.col("ts_ms") <= t0)
    stream_events = df.where((F.col("ts_ms") > t0) & (F.col("ts_ms") <= t1))

    # offline half: tiles -> collapsed per-key batch state (GroupByUpload)
    batch_tiles = lambda_merge.sketch_tiles(batch_events, gb, HOP_MS, ts_col="ts_ms")
    batch_state = lambda_merge.collapse(batch_tiles, gb)
    # online half: post-batch hop tiles
    stream_tiles = lambda_merge.sketch_tiles(stream_events, gb, HOP_MS, ts_col="ts_ms")

    got = (lambda_merge.lambda_finalized(batch_state, stream_tiles, gb)
           .toPandas().set_index("k").sort_index())

    # oracle: the batch engine evaluated directly at t1
    exp = (compute_key_states(spark, gb, at_ts_ms=t1)
           .toPandas().set_index("k").sort_index())

    assert list(got.index) == list(exp.index)
    # sparse/exact regime -> equality, not allclose-with-slack
    assert got["cat_approx_unique_count"].tolist() == \
        exp["cat_approx_unique_count"].tolist()
    for g, e in zip(got["v_approx_percentile"], exp["v_approx_percentile"]):
        np.testing.assert_allclose(list(g), list(e), rtol=0, atol=1e-12)
    # FreqSketch exact regime (distinct <= capacity): maps equal exactly
    for g, e in zip(got["cat_approx_frequent_k"], exp["cat_approx_frequent_k"]):
        assert dict(g) == dict(e)


def _gb_windowed():
    from zipline_chronon_spark.api import TimeUnit, Window

    return GroupBy(
        name="lamw",
        sources=(EventSource(table="lam_events", query=Query(time_column="ts_ms")),),
        key_columns=("k",),
        aggregations=(
            Aggregation("cat", Operation.APPROX_UNIQUE_COUNT,
                        windows=(Window(1, TimeUnit.DAYS), None)),
            Aggregation("v", Operation.APPROX_PERCENTILE,
                        arg_map=(("percentiles", "[0.5, 0.9]"),),
                        windows=(Window(6, TimeUnit.HOURS),)),
        ),
    )


def test_windowed_lambda_merge_equals_batch(spark, events):
    """ONE entry point now covers windowed parts (round-3 missing #4):
    lambda_finalized with TILED batch state + at_ts_ms routes through the
    shared online merge (fetcher.merge_state) and equals the batch engine
    at t1 — sawtooth tails per part, not a global collapse."""
    gb = _gb_windowed()
    t0 = ((BASE + 86_400_000) // HOP_MS) * HOP_MS
    t1 = t0 + 12 * 3_600_000

    df = spark.table("lam_events")
    batch_tiles = lambda_merge.sketch_tiles(
        df.where(F.col("ts_ms") <= t0), gb, HOP_MS, ts_col="ts_ms")
    stream_tiles = lambda_merge.sketch_tiles(
        df.where((F.col("ts_ms") > t0) & (F.col("ts_ms") <= t1)),
        gb, HOP_MS, ts_col="ts_ms")

    got = (lambda_merge.lambda_finalized(batch_tiles, stream_tiles, gb,
                                         at_ts_ms=t1)
           .toPandas().set_index("k").sort_index())
    exp = (compute_key_states(spark, gb, at_ts_ms=t1)
           .toPandas().set_index("k").sort_index())
    assert list(got.index) == list(exp.index)
    for c in ["cat_approx_unique_count_1d", "cat_approx_unique_count"]:
        assert got[c].tolist() == exp[c].tolist(), c
    for g, e in zip(got["v_approx_percentile_6h"], exp["v_approx_percentile_6h"]):
        if e is None or (isinstance(e, float) and pd.isna(e)):
            assert g is None
        else:
            np.testing.assert_allclose(list(g), list(e), rtol=0, atol=1e-12)


def test_windowed_lambda_merge_guards(spark, events):
    gb = _gb_windowed()
    df = spark.table("lam_events")
    tiles = lambda_merge.sketch_tiles(df, gb, HOP_MS, ts_col="ts_ms")
    with pytest.raises(ValueError, match="at_ts_ms"):
        lambda_merge.lambda_finalized(tiles, tiles, gb)  # windowed, no T
    collapsed = lambda_merge.collapse(tiles, gb)
    with pytest.raises(ValueError, match="TILED"):
        lambda_merge.lambda_finalized(collapsed, tiles, gb,
                                      at_ts_ms=BASE + 86_400_000)


def test_lambda_merge_order_invariance(spark, events):
    """Tiles merged in any grouping give identical finalized values (the
    property that makes the IR safe for salted partials and shuffles)."""
    gb = _gb()
    df = spark.table("lam_events")
    tiles = lambda_merge.sketch_tiles(df, gb, HOP_MS, ts_col="ts_ms")
    one = lambda_merge.finalize(lambda_merge.collapse(tiles, gb), gb).toPandas()
    # split tiles by hop parity, collapse each half, merge the halves
    even = tiles.where((F.col("hop_start_ms") / HOP_MS).cast("long") % 2 == 0)
    odd = tiles.where((F.col("hop_start_ms") / HOP_MS).cast("long") % 2 == 1)
    two = lambda_merge.lambda_finalized(
        lambda_merge.collapse(even, gb), odd, gb).toPandas()
    a = one.set_index("k").sort_index()
    b = two.set_index("k").sort_index()
    assert a["cat_approx_unique_count"].tolist() == b["cat_approx_unique_count"].tolist()
    for g, e in zip(a["v_approx_percentile"], b["v_approx_percentile"]):
        np.testing.assert_allclose(list(g), list(e), rtol=0, atol=1e-12)


def test_windowed_lambda_merge_live_stream_ahead_of_fetch(spark, events):
    """A live stream's tile store can hold hops AT or AFTER the fetch
    point (round-4 advice): those tiles must not be counted, or every
    fetch in a catch-up scenario over-counts. The head is quantized to the
    hop (the tile containing at_ts_ms is kept whole) — so fetch at a
    TILE-ALIGNED t1 and feed events beyond it; the result must equal the
    batch engine at t1."""
    gb = _gb_windowed()
    t0 = ((BASE + 86_400_000) // HOP_MS) * HOP_MS
    t1 = t0 + 12 * 3_600_000  # tile-aligned (both are HOP_MS multiples)

    df = spark.table("lam_events")
    batch_tiles = lambda_merge.sketch_tiles(
        df.where(F.col("ts_ms") <= t0), gb, HOP_MS, ts_col="ts_ms")
    # stream runs PAST the fetch point: tiles exist at hops >= t1
    stream_tiles = lambda_merge.sketch_tiles(
        df.where(F.col("ts_ms") > t0), gb, HOP_MS, ts_col="ts_ms")
    assert stream_tiles.where(F.col("hop_start_ms") >= t1).count() > 0

    got = (lambda_merge.lambda_finalized(batch_tiles, stream_tiles, gb,
                                         at_ts_ms=t1 - 1)
           .toPandas().set_index("k").sort_index())
    # at_ts_ms = t1-1: kept tiles are exactly those with hop_start < t1,
    # i.e. events with ts <= t1-1... plus the rest of the head tile, which
    # is EMPTY here only if no event falls in [t1, next hop). To keep the
    # oracle exact regardless, compare against the batch engine evaluated
    # at the END of the head tile minus nothing — i.e. quantized head:
    # batch at (last kept hop end - 1) == batch over ts < t1.
    exp = (compute_key_states(spark, gb, at_ts_ms=t1 - 1)
           .toPandas().set_index("k").sort_index())
    # the head hop [t1-HOP, t1) is fully kept by both (tile whole, batch
    # ts <= t1-1), tiles at >= t1 dropped by the fix -> exact parity for
    # the unbounded parts
    assert list(got.index) == list(exp.index)
    assert (got["cat_approx_unique_count"].tolist()
            == exp["cat_approx_unique_count"].tolist())
