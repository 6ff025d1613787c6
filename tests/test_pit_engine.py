"""End-to-end: PIT engine output vs the O(n·q) naive oracle.

Mirrors the reference's golden/naive strategy (SURVEY.md §5): allclose
1e-5 on floats (Comparison.scala:96-111 tolerance), exact on the rest,
inclusive ts==T boundary, zero-leakage probe.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests import specs
from tests.naive_oracle import naive_features
from zipline_chronon_spark.operators import pit_join
from zipline_chronon_spark.sources.transcripts import generate_transcripts


def _missing(x) -> bool:
    # Spark nulls surface as NaN in pandas numeric columns; treat both as missing
    return x is None or (isinstance(x, (float, np.floating)) and math.isnan(x))


def _close(a, b) -> bool:
    if _missing(a) and _missing(b):
        return True
    if _missing(a) or _missing(b):
        return False
    if isinstance(a, dict) or isinstance(b, dict):
        if set(a) != set(b):
            return False
        return all(_close(a[k], b[k]) for k in a)
    if isinstance(a, (list, tuple, np.ndarray)) or isinstance(b, (list, tuple, np.ndarray)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
    if isinstance(a, (int, float, np.integer, np.floating)) and isinstance(
        b, (int, float, np.integer, np.floating)
    ):
        return bool(np.isclose(float(a), float(b), atol=1e-5, rtol=1e-9, equal_nan=True))
    return a == b


@pytest.fixture(scope="module")
def transcripts_pdf():
    return generate_transcripts(n_convs=25, avg_turns=30, n_days=10, seed=7)


@pytest.fixture(scope="module")
def engine_vs_naive(spark, transcripts_pdf, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("transcripts") / "t.parquet")
    sdf = spark.createDataFrame(transcripts_pdf)
    sdf.write.mode("overwrite").parquet(path)

    gb = specs.convo_features(path)
    # left = the turns themselves, each turn queries at its own ts
    left = (
        spark.read.parquet(path)
        .select("conv_id", "turn_idx", "ts")
        .withColumn("__row_id", F.monotonically_increasing_id())
        .persist()
    )
    left.count()
    res = pit_join.compute_group_by(spark, gb, left, row_id="__row_id")
    joined = left.join(res, "__row_id", "left").toPandas()

    ev = transcripts_pdf.copy()
    ev["ts_ms"] = (ev["ts"].astype("datetime64[ms]").astype("int64"))
    ev["len_text"] = ev["text"].str.len()
    q = ev[["conv_id", "turn_idx", "ts_ms"]].copy()
    expected = naive_features(ev, q, gb, tie_col="turn_idx")
    left.unpersist()
    return gb, joined, expected


def test_feature_parity_vs_naive(engine_vs_naive):
    gb, joined, expected = engine_vs_naive
    got = joined.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = expected.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for part in gb.parts():
        col = part.output_name
        bad = []
        for i in range(len(got)):
            if not _close(got[col].iloc[i], exp[col].iloc[i]):
                bad.append((i, got["conv_id"].iloc[i], got["turn_idx"].iloc[i], got[col].iloc[i], exp[col].iloc[i]))
        assert not bad, f"{col}: {len(bad)} mismatches, first 3: {bad[:3]}"


def test_inclusive_head_boundary(spark):
    """An event at exactly the query ts must be included (batch rule,
    SawtoothAggregatorTest.scala:177-216)."""
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 3,
            "turn_idx": np.array([0, 1, 2], dtype=np.int32),
            "role": ["user"] * 3,
            "text": ["a", "b", "c"],
            "tool": [None, None, None],
            "ts": pd.to_datetime([1000, 2000, 2000], unit="ms"),
            "ds": ["1970-01-01"] * 3,
        }
    )
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("boundary_events")
    gb = specs.convo_features("boundary_events")
    left = sdf.select("conv_id", "turn_idx", "ts").withColumn(
        "__row_id", F.col("turn_idx").cast("long")
    )
    res = pit_join.compute_group_by(spark, gb, left, row_id="__row_id").toPandas()
    res = res.sort_values("__row_id").reset_index(drop=True)
    # at turn 1 (ts=2000) all three events (1000, 2000, 2000) are in the 1h window
    assert res["text_count_1h"].iloc[1] == 3
    # last = first occurrence among the two ts==2000 events
    assert res["text_last"].iloc[1] == "b"
    # last_k most-recent-first, ties reversed from (ts, turn_idx) order
    assert list(res["text_last5"].iloc[1]) == ["c", "b", "a"]


def test_zero_leakage(spark):
    """Perturbing any event with ts > query_ts leaves features unchanged."""
    base = generate_transcripts(n_convs=5, avg_turns=15, n_days=3, seed=11)
    cut = base["ts"].quantile(0.5)
    future = base[base["ts"] > cut].copy()
    future["text"] = "PERTURBED " + future["text"].fillna("x") * 2
    perturbed = pd.concat([base[base["ts"] <= cut], future]).reset_index(drop=True)

    gb = specs.convo_features("leak_events")
    q = base[base["ts"] <= cut][["conv_id", "turn_idx", "ts"]]
    outs = []
    for pdf in (base, perturbed):
        spark.createDataFrame(pdf).createOrReplaceTempView("leak_events")
        left = spark.createDataFrame(q).withColumn(
            "__row_id",
            (F.xxhash64("conv_id") + F.col("turn_idx").cast("long")),
        )
        res = pit_join.compute_group_by(spark, gb, left, row_id="__row_id")
        outs.append(
            left.join(res, "__row_id").toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )
    a, b = outs
    for part in gb.parts():
        col = part.output_name
        for i in range(len(a)):
            assert _close(a[col].iloc[i], b[col].iloc[i]), (col, i, a[col].iloc[i], b[col].iloc[i])
