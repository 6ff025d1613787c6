"""Shared GroupBy/Join specs over the transcripts fixture (FIXTURES.md F3)."""

from __future__ import annotations

from zipline_chronon_spark.api import (
    Aggregation,
    EventSource,
    GroupBy,
    Operation,
    Query,
    TimeUnit,
    Window,
)

W5M = Window(5, TimeUnit.MINUTES)
W1H = Window(1, TimeUnit.HOURS)
W1D = Window(1, TimeUnit.DAYS)
W7D = Window(7, TimeUnit.DAYS)
W30D = Window(30, TimeUnit.DAYS)


def transcripts_source(table: str) -> EventSource:
    return EventSource(
        table=table,
        query=Query(
            selects={
                "conv_id": "conv_id",
                "turn_idx": "turn_idx",
                "role": "role",
                "text": "text",
                "tool": "tool",
                "len_text": "length(text)",
            },
            time_column="ts",
        ),
    )


def convo_features(table: str) -> GroupBy:
    """Covers: COUNT windows incl. multi-hop, SUM/AVG/VAR/MIN/MAX over a
    projected expr, recency ops, distinct ops, histogram, percentile,
    bucketing (FIXTURES.md F3.1-5 collapsed into one GroupBy)."""
    return GroupBy(
        name="convo_features",
        sources=(transcripts_source(table),),
        key_columns=("conv_id",),
        aggregations=(
            Aggregation("text", Operation.COUNT, windows=(W5M, W1H, W1D, W7D, None)),
            Aggregation("text", Operation.COUNT, windows=(W1D,), buckets=("role",)),
            Aggregation("len_text", Operation.SUM, windows=(W1H, W1D, W30D)),
            Aggregation("len_text", Operation.AVERAGE, windows=(W1D,)),
            Aggregation("len_text", Operation.VARIANCE, windows=(W1D,)),
            Aggregation("len_text", Operation.SKEW, windows=(W7D,)),
            Aggregation("len_text", Operation.KURTOSIS, windows=(W7D,)),
            Aggregation("len_text", Operation.MIN, windows=(W1D,)),
            Aggregation("len_text", Operation.MAX, windows=(W1D,)),
            Aggregation("text", Operation.LAST, windows=(None, W1D)),
            Aggregation("text", Operation.FIRST, windows=(None,)),
            Aggregation("text", Operation.LAST_K, arg_map=(("k", "5"),), windows=(None,)),
            Aggregation("text", Operation.FIRST_K, arg_map=(("k", "3"),), windows=(W1D,)),
            Aggregation("tool", Operation.HISTOGRAM, windows=(W7D,)),
            Aggregation("tool", Operation.UNIQUE_COUNT, windows=(W7D,)),
            Aggregation("tool", Operation.APPROX_UNIQUE_COUNT, windows=(W7D,)),
            Aggregation("len_text", Operation.TOP_K, arg_map=(("k", "4"),), windows=(W7D,)),
            Aggregation("len_text", Operation.BOTTOM_K, arg_map=(("k", "4"),), windows=(W7D,)),
            Aggregation(
                "len_text",
                Operation.APPROX_PERCENTILE,
                arg_map=(("percentiles", "[0.5, 0.95]"),),
                windows=(W7D,),
            ),
            Aggregation("len_text", Operation.SUM, windows=(W1D,), buckets=("role",)),
            Aggregation("tool", Operation.APPROX_FREQUENT_K, arg_map=(("k", "2"),), windows=(W7D,)),
            Aggregation("len_text", Operation.UNIQUE_TOP_K, arg_map=(("k", "3"),), windows=(W7D,)),
        ),
        tie_breaker_column="turn_idx",
    )
