"""Validation / dry-run analysis of specs before execution.

Reference: Analyzer.scala:143-352 (schema propagation, key-column checks),
:354-371 (join key type matching), :377-437 (data availability vs max
window), :440-505 (sampled timestamp sanity), plus heavy-hitter skew
detection. Ours leans on Catalyst: render the scans (no execution for the
schema half), propagate schemas, and report the derived output schema —
the EXPLAIN-analogue for specs. The data-backed checks (timestamps,
availability, skew) each run ONE bounded Spark action and are opt-in.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zipline_chronon_spark.api import GroupBy, Join
from zipline_chronon_spark.operators import pit_join

# valid unix-millis window for sanity checks (Analyzer.scala:454-457)
_TS_MIN_MS = 31_536_000_000  # 1971-01-01
_TS_MAX_MS = 4_102_473_599_999  # 2099-12-31


@dataclass
class AnalysisReport:
    name: str
    key_schema: dict = field(default_factory=dict)
    output_schema: dict = field(default_factory=dict)
    errors: list = field(default_factory=list)
    warnings: list = field(default_factory=list)
    hot_keys: dict = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return not self.errors


def run_timestamp_checks(df: DataFrame, ts_col: str, rep: AnalysisReport,
                         sample: int = 100) -> None:
    """Sampled ts sanity (Analyzer.runTimestampChecks:440-469): all-null or
    out-of-range epoch-millis timestamps fail fast here instead of as
    silent empty windows later. One bounded action (limit N)."""
    if ts_col not in df.columns:
        rep.errors.append(f"no timestamp column '{ts_col}' on source")
        return
    row = (
        df.limit(sample)
        .agg(
            F.sum(F.when(F.col(ts_col).isNull(), 0).otherwise(1)).alias("not_null"),
            # nulls are the all-null check's job; counting them here would
            # mislabel a partially-null column as a wrong-unit problem
            F.sum(F.when(F.col(ts_col).isNotNull()
                         & ~F.col(ts_col).between(_TS_MIN_MS, _TS_MAX_MS), 1)
                  .otherwise(0)).alias("bad_range"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
    )
    if row["n"] and not row["not_null"]:
        rep.errors.append(f"timestamp column '{ts_col}' is entirely null (sampled {row['n']})")
    elif row["bad_range"]:
        rep.warnings.append(
            f"{row['bad_range']}/{row['n']} sampled '{ts_col}' values outside "
            "[1971, 2099] epoch-millis — wrong unit (seconds vs millis)?")


def run_skew_detection(df: DataFrame, keys: list[str], rep: AnalysisReport,
                       top: int = 10) -> None:
    """Heavy-hitter keys (the reference's analyze() frequent-items pass):
    one aggregate per key column, top-N by count."""
    for k in keys:
        rows = (df.groupBy(k).agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.desc("n")).limit(top).collect())
        rep.hot_keys[k] = [(r[k], int(r["n"])) for r in rows]


def _check_derivations(spark: SparkSession, derivations, base_fields,
                       rep: AnalysisReport, scope: str = "",
                       fetch_time_cols: tuple = ()) -> None:
    """Validate derivation expressions by ANALYZING them against an empty
    frame with the real output schema (Catalyst catches unresolved columns
    and type mismatches without running anything) — the spec-time analogue
    of the reference's derivation validation (Analyzer.scala derivation
    walk). Expressions over fetch-time-only external columns can't be
    typed offline and downgrade to warnings."""
    if not derivations:
        return
    df = spark.createDataFrame([], T.StructType(list(base_fields)))
    for d in derivations:
        if d.name == "*":
            continue
        try:
            df.selectExpr(f"{d.expression} AS `{d.name}`")
        except Exception as e:
            msg = str(e).splitlines()[0]
            if any(c in d.expression for c in fetch_time_cols):
                rep.warnings.append(
                    f"{scope}derivation '{d.name}' references a fetch-time "
                    f"external column — cannot be validated offline ({msg})")
            else:
                rep.errors.append(f"{scope}derivation '{d.name}' invalid: {msg}")


def analyze_group_by(spark: SparkSession, gb: GroupBy,
                     check_data: bool = False,
                     skew_detection: bool = False) -> AnalysisReport:
    rep = AnalysisReport(name=gb.name)
    try:
        from zipline_chronon_spark.api import EntitySource

        if gb.sources and isinstance(gb.sources[0], EntitySource):
            # entity GroupBys: schema/data checks run against the rendered
            # snapshot table (the mutation feed shares its value schema)
            (src,) = gb.sources
            df = pit_join._read_table(spark, src.snapshot_table)
            for w in src.query.wheres:
                df = df.where(w)
            if src.query.selects:
                df = df.select(*[F.expr(e).alias(n)
                                 for n, e in src.query.selects.items()])
            t_expr = F.expr(src.query.time_column)
            t_dt = df.select(t_expr.alias("t")).schema[0].dataType
            ev = df.withColumn(pit_join.TS_COL,
                               pit_join._time_to_millis(t_expr, t_dt))
        else:
            ev = pit_join.events_df(spark, gb)
    except Exception as e:  # scan/selects/wheres resolution failure
        rep.errors.append(f"source resolution failed: {e}")
        return rep
    if check_data:
        run_timestamp_checks(ev, pit_join.TS_COL, rep)
    if skew_detection:
        run_skew_detection(ev, list(gb.key_columns), rep)
    schema = {f.name: f.dataType for f in ev.schema.fields}
    out_fields: list = []
    for k in gb.key_columns:
        if k not in schema:
            rep.errors.append(f"key column '{k}' not in rendered source")
        else:
            rep.key_schema[k] = schema[k].simpleString()
    for part in gb.parts():
        if part.input_column not in schema:
            rep.errors.append(f"input column '{part.input_column}' not in source")
            continue
        in_t = schema[part.input_column]
        # Date/Timestamp cannot be aggregated (ColumnAggregator.scala:213-219)
        probe = in_t
        if isinstance(probe, T.ArrayType):
            probe = probe.elementType
        if isinstance(probe, T.MapType):
            probe = probe.valueType
        if isinstance(probe, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            rep.errors.append(
                f"'{part.input_column}' is {in_t.simpleString()}: convert to long "
                "millis in selects — Date/Timestamp cannot be aggregated")
            continue
        try:
            f = pit_join.output_field(part, in_t)
            rep.output_schema[f.name] = f.dataType.simpleString()
            out_fields.append(f)
        except NotImplementedError as e:
            rep.errors.append(str(e))
    if gb.tie_breaker_column and gb.tie_breaker_column not in schema:
        rep.errors.append(f"tie breaker '{gb.tie_breaker_column}' not in source")
    rep.output_fields = out_fields  # typed fields for the join-level check
    _check_derivations(spark, gb.derivations, out_fields, rep)
    return rep


def analyze_join(spark: SparkSession, join: Join,
                 check_data: bool = False,
                 skew_detection: bool = False,
                 start_ds: Optional[str] = None) -> AnalysisReport:
    """Spec + schema validation; with ``check_data`` also sampled timestamp
    sanity and — given ``start_ds`` (the first partition to backfill) —
    data availability per part: each windowed GroupBy's source must reach
    back to start_ds − maxWindow (Analyzer.runDataAvailabilityCheck:
    377-437, EVENTS×TEMPORAL arm)."""
    rep = AnalysisReport(name=join.name)
    from zipline_chronon_spark.operators.join import render_left

    try:
        left = render_left(spark, join.left)
    except Exception as e:
        rep.errors.append(f"left resolution failed: {e}")
        return rep
    left_schema = {f.name: f.dataType for f in left.schema.fields}
    if check_data:
        run_timestamp_checks(left, pit_join.TS_COL, rep)
    prefixes = [p.full_prefix for p in join.parts]
    if len(set(prefixes)) != len(prefixes):
        rep.errors.append(f"duplicate join-part prefixes: {prefixes}")
    join_fields: list = list(left.schema.fields)
    for part in join.parts:
        sub = analyze_group_by(spark, part.group_by, check_data=check_data,
                               skew_detection=skew_detection)
        rep.errors.extend(f"[{part.full_prefix}] {e}" for e in sub.errors)
        rep.warnings.extend(f"[{part.full_prefix}] {w}" for w in sub.warnings)
        for k, hh in sub.hot_keys.items():
            rep.hot_keys[f"{part.full_prefix}.{k}"] = hh
        inv = {r: l for l, r in part.key_mapping}
        for rk in part.group_by.key_columns:
            lcol = inv.get(rk, rk)
            if lcol not in left_schema:
                rep.errors.append(
                    f"[{part.full_prefix}] left column '{lcol}' (for right key '{rk}') "
                    "missing on left")
            elif rk in sub.key_schema and \
                    left_schema[lcol].simpleString() != sub.key_schema[rk]:
                # join keys must agree in TYPE, not just name
                # (Analyzer.runSchemaValidation:366-368)
                rep.errors.append(
                    f"[{part.full_prefix}] join key '{lcol}' type mismatch: "
                    f"left {left_schema[lcol].simpleString()} vs right {sub.key_schema[rk]}")
        if check_data and start_ds is not None:
            _check_availability(spark, part, start_ds, rep)
        for name, dt in sub.output_schema.items():
            rep.output_schema[f"{part.full_prefix}_{name}"] = dt
        join_fields.extend(
            T.StructField(f"{part.full_prefix}_{f.name}", f.dataType, True)
            for f in getattr(sub, "output_fields", ()))
    # online external parts: key mappings must resolve against the left
    # even though values only materialize at fetch time — catching a bad
    # mapping at analyze time beats a None-keyed handler call in serving
    for ep in getattr(join, "online_external_parts", ()):
        inv = {r: l for l, r in ep.key_mapping}
        for k in ep.source.key_columns:
            lcol = inv.get(k, k)
            if lcol not in left_schema:
                rep.errors.append(
                    f"[ext:{ep.source.name}] external key '{k}' maps to "
                    f"missing left column '{lcol}'")
        for c in ep.source.value_columns:
            nm = ep.column_name(c)
            if nm in rep.output_schema:
                rep.errors.append(
                    f"[ext:{ep.source.name}] output column '{nm}' collides "
                    "with a join-part column")
            rep.output_schema[nm] = "external"
    ext_cols = tuple(ep.column_name(c)
                     for ep in getattr(join, "online_external_parts", ())
                     for c in ep.source.value_columns)
    _check_derivations(spark, join.derivations, join_fields, rep,
                       fetch_time_cols=ext_cols)
    return rep


def _check_availability(spark: SparkSession, part, start_ds: str,
                        rep: AnalysisReport) -> None:
    from datetime import datetime, timezone

    gb = part.group_by
    max_w = gb.max_window_millis()
    if max_w is None:
        return  # unbounded windows need full history anyway; no finite bound
    start_ms = int(datetime.strptime(start_ds, "%Y-%m-%d")
                   .replace(tzinfo=timezone.utc).timestamp() * 1000)
    expected_start = start_ms - max_w
    ev = pit_join.events_df(spark, gb)
    row = ev.agg(F.min(pit_join.TS_COL).alias("lo"),
                 F.max(pit_join.TS_COL).alias("hi")).collect()[0]
    if row["lo"] is None:
        rep.errors.append(f"[{part.full_prefix}] source has no rows")
    elif row["lo"] > expected_start:
        rep.errors.append(
            f"[{part.full_prefix}] data availability: needs history from "
            f"{expected_start} (start_ds - maxWindow) but source starts at {row['lo']}")
