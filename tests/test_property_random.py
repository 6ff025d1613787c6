"""Hypothesis-randomized engine-vs-naive property (the reference's
randomized CStream/DataFrameGen strategy, SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests import specs
from tests.naive_oracle import naive_features
from tests.test_pit_engine import _close
from zipline_chronon_spark.api import Aggregation, EventSource, GroupBy, Operation, Query
from zipline_chronon_spark.operators.pit_join import compute_group_by

BASE = 1_700_000_000_000

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2", "k3"]),                      # key
        st.integers(min_value=0, max_value=3 * 86_400_000),       # ts offset (3 days)
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100,
                                       allow_nan=False, width=32)),  # value w/ nulls
    ),
    min_size=1, max_size=60,
)


def _gb():
    return GroupBy(
        name="prop",
        sources=(EventSource(table="prop_events", query=Query(time_column="ts_ms")),),
        key_columns=("k",),
        aggregations=(
            Aggregation("v", Operation.COUNT, windows=(specs.W5M, specs.W1H, specs.W1D, None)),
            Aggregation("v", Operation.SUM, windows=(specs.W1H,)),
            Aggregation("v", Operation.MIN, windows=(specs.W1D,)),
            Aggregation("v", Operation.MAX, windows=(specs.W1D,)),
            Aggregation("v", Operation.LAST, windows=(specs.W1H,)),
            Aggregation("v", Operation.LAST_K, arg_map=(("k", "2"),), windows=(None,)),
        ),
        tie_breaker_column="i",
    )


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_strategy)
def test_random_streams_match_naive(spark, rows):
    pdf = pd.DataFrame(
        [(k, BASE + off, v, i) for i, (k, off, v) in enumerate(rows)],
        columns=["k", "ts_ms", "v", "i"],
    )
    sdf = spark.createDataFrame(pdf.astype({"ts_ms": "int64", "i": "int64"}))
    sdf.createOrReplaceTempView("prop_events")
    gb = _gb()
    left = sdf.select("k", "ts_ms", "i").withColumn("__row_id", sdf["i"])
    got = (
        compute_group_by(spark, gb, left, row_id="__row_id", query_time_col="ts_ms")
        .toPandas().sort_values("__row_id").reset_index(drop=True)
    )
    exp = naive_features(pdf, pdf[["k", "ts_ms", "i"]].copy(), gb, tie_col="i")
    exp = exp.sort_values("i").reset_index(drop=True)
    assert len(got) == len(exp)
    for part in gb.parts():
        col = part.output_name
        for j in range(len(got)):
            assert _close(got[col].iloc[j], exp[col].iloc[j]), (
                col, j, got[col].iloc[j], exp[col].iloc[j], pdf.to_dict("records"))
