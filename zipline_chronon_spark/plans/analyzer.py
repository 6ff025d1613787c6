"""Validation / dry-run analysis of specs before execution.

Reference: Analyzer.scala:143-352 (schema propagation, key-column checks,
timestamp checks) and batch/Eval.scala (sampled dry-run type checking).
Ours leans on Catalyst: render the scans (no execution), propagate schemas,
and report the derived output schema — the EXPLAIN-analogue for specs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from zipline_chronon_spark.api import GroupBy, Join
from zipline_chronon_spark.operators import pit_join


@dataclass
class AnalysisReport:
    name: str
    key_schema: dict = field(default_factory=dict)
    output_schema: dict = field(default_factory=dict)
    errors: list = field(default_factory=list)
    warnings: list = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.errors


def analyze_group_by(spark: SparkSession, gb: GroupBy) -> AnalysisReport:
    rep = AnalysisReport(name=gb.name)
    try:
        ev = pit_join.events_df(spark, gb)
    except Exception as e:  # scan/selects/wheres resolution failure
        rep.errors.append(f"source resolution failed: {e}")
        return rep
    schema = {f.name: f.dataType for f in ev.schema.fields}
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
        except NotImplementedError as e:
            rep.errors.append(str(e))
    if gb.tie_breaker_column and gb.tie_breaker_column not in schema:
        rep.errors.append(f"tie breaker '{gb.tie_breaker_column}' not in source")
    return rep


def analyze_join(spark: SparkSession, join: Join) -> AnalysisReport:
    rep = AnalysisReport(name=join.name)
    from zipline_chronon_spark.operators.join import render_left

    try:
        left = render_left(spark, join.left)
    except Exception as e:
        rep.errors.append(f"left resolution failed: {e}")
        return rep
    left_cols = set(left.columns)
    prefixes = [p.full_prefix for p in join.parts]
    if len(set(prefixes)) != len(prefixes):
        rep.errors.append(f"duplicate join-part prefixes: {prefixes}")
    for part in join.parts:
        sub = analyze_group_by(spark, part.group_by)
        rep.errors.extend(f"[{part.full_prefix}] {e}" for e in sub.errors)
        inv = {r: l for l, r in part.key_mapping}
        for rk in part.group_by.key_columns:
            lcol = inv.get(rk, rk)
            if lcol not in left_cols:
                rep.errors.append(
                    f"[{part.full_prefix}] left column '{lcol}' (for right key '{rk}') "
                    "missing on left")
        for name, dt in sub.output_schema.items():
            rep.output_schema[f"{part.full_prefix}_{name}"] = dt
    return rep
