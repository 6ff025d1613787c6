"""Metamorphic: hot-key time-slice salting must not change any feature value
(FIXTURES.md F5.4 'salting on/off identical')."""

from __future__ import annotations

import pytest

from tests import specs
from zipline_chronon_spark.api import Aggregation, GroupBy, Operation
from zipline_chronon_spark.operators.pit_join import compute_group_by_self
from zipline_chronon_spark.sources.transcripts import generate_transcripts

ROW_ID_EXPR = "xxhash64(conv_id, turn_idx)"


def _bounded_gb(path):
    return GroupBy(
        name="salted",
        sources=(specs.transcripts_source(path),),
        key_columns=("conv_id",),
        aggregations=(
            Aggregation("text", Operation.COUNT, windows=(specs.W1H, specs.W1D)),
            Aggregation("len_text", Operation.SUM, windows=(specs.W1D,)),
            Aggregation("len_text", Operation.AVERAGE, windows=(specs.W1D,)),
            Aggregation("text", Operation.LAST, windows=(specs.W1D,)),
            Aggregation("text", Operation.LAST_K, arg_map=(("k", "3"),), windows=(specs.W1D,)),
            Aggregation("len_text", Operation.MIN, windows=(specs.W1D,)),
            # approx ops survive salting too: slice replicas carry the raw
            # events, so the query-time finalizer sees the identical set
            Aggregation("text", Operation.APPROX_UNIQUE_COUNT, windows=(specs.W1D,)),
            Aggregation("len_text", Operation.APPROX_PERCENTILE,
                        arg_map=(("percentiles", "[0.5]"),), windows=(specs.W1D,)),
            Aggregation("text", Operation.TOP_K, arg_map=(("k", "2"),), windows=(specs.W1D,)),
        ),
        tie_breaker_column="turn_idx",
    )


@pytest.fixture(scope="module")
def hot_table(spark, tmp_path_factory):
    # one conversation 60x the average length (hot key)
    pdf = generate_transcripts(n_convs=12, avg_turns=20, n_days=5, seed=9, hot_conv_factor=60)
    path = str(tmp_path_factory.mktemp("salt") / "t.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    return path, pdf


def _run(spark, path, **kw):
    out = compute_group_by_self(
        spark, _bounded_gb(path), ROW_ID_EXPR,
        passthrough={"conv_id": "conv_id", "turn_idx": "turn_idx"}, **kw)
    return (
        out.toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .drop(columns=["__row_id"])
    )


def test_salting_identical(spark, hot_table):
    path, pdf = hot_table
    plain = _run(spark, path)
    salted = _run(spark, path, salt_slice_ms=6 * 3_600_000, hot_key_threshold=100)
    assert len(plain) == len(salted) == len(pdf)
    for col in plain.columns:
        a, b = plain[col].tolist(), salted[col].tolist()
        for i in range(len(a)):
            x, y = a[i], b[i]
            import numpy as np

            if isinstance(x, (list, tuple, np.ndarray)) or isinstance(y, (list, tuple, np.ndarray)):
                xs = [] if x is None else list(x)
                ys = [] if y is None else list(y)
                assert xs == ys, (col, i, x, y)
            else:
                assert (x == y) or (x != x and y != y), (col, i, x, y)


def test_salting_explicit_hot_keys(spark, hot_table):
    path, pdf = hot_table
    plain = _run(spark, path)
    salted = _run(spark, path, salt_slice_ms=3 * 3_600_000, hot_keys=["conv_000000"])
    assert plain["text_count_1d"].tolist() == salted["text_count_1d"].tolist()


def test_salting_rejects_unbounded(spark, hot_table):
    path, _ = hot_table
    gb = GroupBy(
        name="bad", sources=_bounded_gb(path).sources, key_columns=("conv_id",),
        aggregations=(Aggregation("text", Operation.COUNT, windows=(None,)),),
    )
    with pytest.raises(ValueError, match="bounded"):
        compute_group_by_self(spark, gb, ROW_ID_EXPR, salt_slice_ms=1000, hot_keys=["x"])
