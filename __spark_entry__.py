"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship: multi-part point-in-time Join over sf0.001 events.
queries()    — one entry per implemented operator family (SURVEY.md §2),
               each runs the real engine (zipline_chronon_spark) on the
               sf_dir parquet tables.
oracle_sql() — DuckDB ANSI-SQL oracles computing the same semantics naively
               (self-join + FILTER per window with the sawtooth tail rule).

Float columns are rounded to fixed decimals on BOTH sides so value-hash
comparison is robust to summation-order ulps.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zipline_chronon_spark.api import (
    Aggregation,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    TimeUnit,
    Window,
)
from zipline_chronon_spark.operators import extensions
from zipline_chronon_spark.operators.join import compute_join
from zipline_chronon_spark.operators.pit_join import compute_group_by

W1D = Window(1, TimeUnit.DAYS)
W7D = Window(7, TimeUnit.DAYS)
MS_1D = 86_400_000
MS_7D = 7 * 86_400_000
# tiny shift before rounding so engine/oracle agree when the true value sits
# exactly on a round-half boundary and 1e-12 summation-order noise would
# otherwise flip the rounded digit
ROUND_EPS = 1e-7
HOP_1H = 3_600_000  # tail hop for windows in [12h, 12d) — Resolution.scala:38-48

EVENT_SELECTS = {"user_id": "user_id", "value": "value", "event_type": "event_type",
                 "event_id": "event_id"}


def _events_source(sf_dir: str) -> EventSource:
    return EventSource(
        table=f"{sf_dir}/events.parquet",
        query=Query(selects=EVENT_SELECTS, time_column="ts"),
    )


def _events_gb(sf_dir: str, name: str, aggs: tuple) -> GroupBy:
    return GroupBy(
        name=name,
        sources=(_events_source(sf_dir),),
        key_columns=("user_id",),
        aggregations=aggs,
        tie_breaker_column="event_id",
    )


def _pit(spark: SparkSession, sf_dir: str, name: str, aggs: tuple,
         outputs: dict[str, tuple[str, int | None]]) -> DataFrame:
    """Run a GroupBy with left = the events themselves (each event queries at
    its own ts); project event_id + aliased/rounded feature columns."""
    gb = _events_gb(sf_dir, name, aggs)
    left = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", F.col("event_id").alias("__row_id"))
    )
    res = compute_group_by(spark, gb, left, row_id="__row_id")
    cols = [F.col("__row_id").alias("event_id")]
    for src, (alias, digits) in outputs.items():
        c = F.col(src)
        if digits is not None:
            c = F.round(c + F.lit(ROUND_EPS), digits)
        cols.append(c.alias(alias))
    return res.select(*cols)


# ---------------------------------------------------------------------------
# oracle SQL scaffolding (DuckDB): one self-join per user with ets <= qts,
# windows carved out via FILTER with the hop-aligned tail rule.

_ORACLE_BASE = """
WITH j AS (
  SELECT q.event_id AS event_id,
         epoch_ms(q.ts) AS qts,
         e.value AS v, e.event_type AS et,
         epoch_ms(e.ts) AS ets, e.event_id AS eid
  FROM events q LEFT JOIN events e
    ON e.user_id = q.user_id AND epoch_ms(e.ts) <= epoch_ms(q.ts)
)
SELECT event_id, {aggs}
FROM j GROUP BY event_id, qts
"""


def _tail(window_ms: int, hop_ms: int) -> str:
    return f"ets >= ((qts - {window_ms}) // {hop_ms}) * {hop_ms}"


def _oracle(aggs: str) -> str:
    return _ORACLE_BASE.format(aggs=aggs)


# ---------------------------------------------------------------------------
# queries


def q_pit_count_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pit(
        spark, sf_dir, "counts",
        (
            Aggregation("value", Operation.COUNT, windows=(W1D, W7D, None)),
            Aggregation("value", Operation.SUM, windows=(W1D, W7D, None)),
        ),
        {
            "value_count_1d": ("cnt_1d", None),
            "value_count_7d": ("cnt_7d", None),
            "value_count": ("cnt_all", None),
            "value_sum_1d": ("sum_1d", 4),
            "value_sum_7d": ("sum_7d", 4),
            "value_sum": ("sum_all", 4),
        },
    )


def o_pit_count_sum() -> str:
    t1, t7 = _tail(MS_1D, HOP_1H), _tail(MS_7D, HOP_1H)
    return _oracle(
        f"""
        CASE WHEN count(v) FILTER (WHERE {t1}) = 0 THEN NULL
             ELSE count(v) FILTER (WHERE {t1}) END AS cnt_1d,
        CASE WHEN count(v) FILTER (WHERE {t7}) = 0 THEN NULL
             ELSE count(v) FILTER (WHERE {t7}) END AS cnt_7d,
        CASE WHEN count(v) = 0 THEN NULL ELSE count(v) END AS cnt_all,
        round(sum(v) FILTER (WHERE {t1}) + 0.0000001, 4) AS sum_1d,
        round(sum(v) FILTER (WHERE {t7}) + 0.0000001, 4) AS sum_7d,
        round(sum(v) + 0.0000001, 4) AS sum_all
        """
    )


def q_pit_min_max_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pit(
        spark, sf_dir, "mma",
        (
            Aggregation("value", Operation.MIN, windows=(W1D, W7D)),
            Aggregation("value", Operation.MAX, windows=(W1D, W7D)),
            Aggregation("value", Operation.AVERAGE, windows=(W1D,)),
        ),
        {
            "value_min_1d": ("min_1d", None),
            "value_min_7d": ("min_7d", None),
            "value_max_1d": ("max_1d", None),
            "value_max_7d": ("max_7d", None),
            "value_average_1d": ("avg_1d", 4),
        },
    )


def o_pit_min_max_avg() -> str:
    t1, t7 = _tail(MS_1D, HOP_1H), _tail(MS_7D, HOP_1H)
    return _oracle(
        f"""
        min(v) FILTER (WHERE {t1}) AS min_1d,
        min(v) FILTER (WHERE {t7}) AS min_7d,
        max(v) FILTER (WHERE {t1}) AS max_1d,
        max(v) FILTER (WHERE {t7}) AS max_7d,
        round(avg(v) FILTER (WHERE {t1}) + 0.0000001, 4) AS avg_1d
        """
    )


def q_pit_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pit(
        spark, sf_dir, "recency",
        (
            Aggregation("value", Operation.FIRST, windows=(W7D,)),
            Aggregation("value", Operation.LAST, windows=(W7D,)),
            Aggregation("value", Operation.LAST_K, arg_map=(("k", "3"),), windows=(None,)),
            Aggregation("value", Operation.FIRST_K, arg_map=(("k", "2"),), windows=(W1D,)),
        ),
        {
            "value_first_7d": ("first_7d", None),
            "value_last_7d": ("last_7d", None),
            "value_last3": ("last3_all", None),
            "value_first2_1d": ("first2_1d", None),
        },
    )


def o_pit_recency() -> str:
    t1, t7 = _tail(MS_1D, HOP_1H), _tail(MS_7D, HOP_1H)
    return _oracle(
        f"""
        (list(v ORDER BY ets ASC, eid ASC) FILTER (WHERE {t7}))[1] AS first_7d,
        (list(v ORDER BY ets DESC, eid ASC) FILTER (WHERE {t7}))[1] AS last_7d,
        CASE WHEN count(v) = 0 THEN NULL
             ELSE (list(v ORDER BY ets DESC, eid DESC))[1:3] END AS last3_all,
        CASE WHEN count(v) FILTER (WHERE {t1}) = 0 THEN NULL
             ELSE (list(v ORDER BY ets ASC, eid ASC) FILTER (WHERE {t1}))[1:2] END AS first2_1d
        """
    )


def q_pit_distinct_var_pctl(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _pit(
        spark, sf_dir, "dvp",
        (
            Aggregation("event_type", Operation.UNIQUE_COUNT, windows=(W7D,)),
            Aggregation("event_type", Operation.APPROX_UNIQUE_COUNT, windows=(W7D,)),
            Aggregation("value", Operation.VARIANCE, windows=(W7D,)),
            Aggregation(
                "value", Operation.APPROX_PERCENTILE,
                arg_map=(("percentiles", "[0.5, 0.95]"),), windows=(W7D,),
            ),
        ),
        {
            "event_type_unique_count_7d": ("uniq_et_7d", None),
            "event_type_approx_unique_count_7d": ("approx_uniq_et_7d", None),
            "value_variance_7d": ("var_7d", 3),
            "value_approx_percentile_7d": ("pctl_raw", None),
        },
    )
    return df.select(
        "event_id", "uniq_et_7d", "approx_uniq_et_7d",
        F.when(F.isnan("var_7d"), None).otherwise(F.col("var_7d")).alias("var_7d"),
        F.round(F.col("pctl_raw")[0] + F.lit(ROUND_EPS), 4).alias("p50_7d"),
        F.round(F.col("pctl_raw")[1] + F.lit(ROUND_EPS), 4).alias("p95_7d"),
    )


def o_pit_distinct_var_pctl() -> str:
    t7 = _tail(MS_7D, HOP_1H)
    return _oracle(
        f"""
        count(DISTINCT et) FILTER (WHERE {t7}) AS uniq_et_7d,
        count(DISTINCT et) FILTER (WHERE {t7}) AS approx_uniq_et_7d,
        round(var_pop(v) FILTER (WHERE {t7}) + 0.0000001, 3) AS var_7d,
        round(quantile_cont(v, 0.5) FILTER (WHERE {t7}) + 0.0000001, 4) AS p50_7d,
        round(quantile_cont(v, 0.95) FILTER (WHERE {t7}) + 0.0000001, 4) AS p95_7d
        """
    )


def q_pit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pit(
        spark, sf_dir, "topk",
        (
            Aggregation("value", Operation.TOP_K, arg_map=(("k", "3"),), windows=(W7D,)),
            Aggregation("value", Operation.BOTTOM_K, arg_map=(("k", "3"),), windows=(W7D,)),
        ),
        {
            "value_top3_7d": ("top3_7d", None),
            "value_bottom3_7d": ("bottom3_7d", None),
        },
    )


def o_pit_topk() -> str:
    t7 = _tail(MS_7D, HOP_1H)
    return _oracle(
        f"""
        CASE WHEN count(v) FILTER (WHERE {t7}) = 0 THEN NULL
             ELSE (list(v ORDER BY v DESC) FILTER (WHERE {t7}))[1:3] END AS top3_7d,
        CASE WHEN count(v) FILTER (WHERE {t7}) = 0 THEN NULL
             ELSE (list(v ORDER BY v ASC) FILTER (WHERE {t7}))[1:3] END AS bottom3_7d
        """
    )


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = extensions.with_lag_lead(
        df, keys=["user_id"], order_by=["ts", "event_id"], columns=["value"], offsets=(1,)
    )
    return out.select(
        "event_id",
        F.round(F.col("value_lag1") + F.lit(ROUND_EPS), 4).alias("value_lag1"),
        F.round(F.col("value_lead1") + F.lit(ROUND_EPS), 4).alias("value_lead1"),
    )


def o_lag_lead() -> str:
    return """
    SELECT event_id,
           round(lag(value) OVER w + 0.0000001, 4) AS value_lag1,
           round(lead(value) OVER w + 0.0000001, 4) AS value_lead1
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = extensions.sessionize(
        df, keys=["user_id"], ts_col="ts", order_by=["ts", "event_id"], gap="6 hours"
    )
    return extensions.session_aggregates(s, keys=["user_id"], ts_col="ts").select(
        "user_id", "session_id", "n_turns", "session_start_ms", "session_end_ms", "duration_ms"
    )


def o_sessionize() -> str:
    return """
    WITH g AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ms,
             CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL THEN 0
                  WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 21600000 THEN 1
                  ELSE 0 END AS brk
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ms,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id, session_id, count(*) AS n_turns,
           min(ms) AS session_start_ms, max(ms) AS session_end_ms,
           max(ms) - min(ms) AS duration_ms
    FROM s GROUP BY user_id, session_id
    """


def q_join_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Join path: left + two prefixed GroupBy parts + derivation."""
    from zipline_chronon_spark.api import Derivation

    join = Join(
        name="flagship",
        left=_events_source(sf_dir),
        parts=(
            JoinPart(_events_gb(sf_dir, "cnt", (
                Aggregation("value", Operation.COUNT, windows=(W1D,)),
                Aggregation("value", Operation.SUM, windows=(W1D,)),
            ))),
            JoinPart(_events_gb(sf_dir, "rec", (
                Aggregation("value", Operation.LAST, windows=(W7D,)),
            )), prefix="r"),
        ),
        derivations=(
            Derivation("*", "*"),
            Derivation("value_over_last", "value / r_rec_value_last_7d"),
        ),
        row_ids=("event_id",),
    )
    out = compute_join(spark, join)
    return out.select(
        "event_id",
        F.col("cnt_value_count_1d").alias("cnt_1d"),
        F.round(F.col("cnt_value_sum_1d") + F.lit(ROUND_EPS), 4).alias("sum_1d"),
        F.col("r_rec_value_last_7d").alias("last_7d"),
        F.round(F.col("value_over_last") + F.lit(ROUND_EPS), 6).alias("value_over_last"),
    )


def o_join_flagship() -> str:
    t1, t7 = _tail(MS_1D, HOP_1H), _tail(MS_7D, HOP_1H)
    return f"""
    WITH j AS (
      SELECT q.event_id AS event_id, q.value AS qv,
             epoch_ms(q.ts) AS qts,
             e.value AS v, epoch_ms(e.ts) AS ets, e.event_id AS eid
      FROM events q LEFT JOIN events e
        ON e.user_id = q.user_id AND epoch_ms(e.ts) <= epoch_ms(q.ts)
    )
    SELECT event_id,
           CASE WHEN count(v) FILTER (WHERE {t1}) = 0 THEN NULL
                ELSE count(v) FILTER (WHERE {t1}) END AS cnt_1d,
           round(sum(v) FILTER (WHERE {t1}) + 0.0000001, 4) AS sum_1d,
           (list(v ORDER BY ets DESC, eid ASC) FILTER (WHERE {t7}))[1] AS last_7d,
           round(any_value(qv) / (list(v ORDER BY ets DESC, eid ASC) FILTER (WHERE {t7}))[1] + 0.0000001, 6)
               AS value_over_last
    FROM j GROUP BY event_id, qts
    """


def entry(spark: SparkSession) -> DataFrame:
    """Flagship point-in-time Join over sf0.001 (driver smoke check)."""
    return q_join_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pit_count_sum": q_pit_count_sum,
        "pit_min_max_avg": q_pit_min_max_avg,
        "pit_recency": q_pit_recency,
        "pit_distinct_var_pctl": q_pit_distinct_var_pctl,
        "pit_topk": q_pit_topk,
        "lag_lead": q_lag_lead,
        "sessionize": q_sessionize,
        "join_flagship": q_join_flagship,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pit_count_sum": o_pit_count_sum(),
        "pit_min_max_avg": o_pit_min_max_avg(),
        "pit_recency": o_pit_recency(),
        "pit_distinct_var_pctl": o_pit_distinct_var_pctl(),
        "pit_topk": o_pit_topk(),
        "lag_lead": o_lag_lead(),
        "sessionize": o_sessionize(),
        "join_flagship": o_join_flagship(),
    }
