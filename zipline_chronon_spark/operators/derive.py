"""Derivations: named Spark-SQL expressions over output columns, with "*"
wildcard (api.thrift:398-404; Extensions.scala DerivationOps
finalOutputColumn; applied at GroupBy.scala:912-917 and Join.scala:401-462).
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zipline_chronon_spark.api import Derivation


def apply_derivations(
    df: DataFrame,
    derivations: Sequence[Derivation],
    always_keep: Iterable[str] = (),
) -> DataFrame:
    """"*" keeps all base columns not overridden by a named derivation;
    without "*", only ``always_keep`` (keys/ts) plus derived columns
    survive — the reference's projection semantics."""
    if not derivations:
        return df
    named = {d.name for d in derivations if d.name != "*"}
    exprs: list = []
    if any(d.name == "*" for d in derivations):
        exprs.extend(F.col(c) for c in df.columns if c not in named)
    else:
        exprs.extend(F.col(c) for c in always_keep if c in df.columns and c not in named)
    for d in derivations:
        if d.name != "*":
            exprs.append(F.expr(d.expression).alias(d.name))
    return df.select(*exprs)


def _infer_type(v):
    """Spark type of a fetched python value (first non-None sample wins;
    an all-None column types as string — its derived value is null either
    way)."""
    from pyspark.sql import types as T

    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, (bytes, bytearray)):
        return T.BinaryType()
    if isinstance(v, tuple):
        return T.StructType([
            T.StructField(f"_{i + 1}", _infer_type(x)) for i, x in enumerate(v)])
    if isinstance(v, list):
        return T.ArrayType(_infer_type(v[0]) if v else T.StringType())
    if isinstance(v, dict):
        k = next(iter(v), None)
        if k is None:
            return T.MapType(T.StringType(), T.StringType())
        return T.MapType(_infer_type(k), _infer_type(v[k]))
    return T.StringType()


def apply_derivations_rows(
    spark,
    rows: Sequence[dict],
    derivations: Sequence[Derivation],
    always_keep: Iterable[str] = (),
    schema_hint: Optional[dict] = None,
) -> list[dict]:
    """Row-level derivation application for the ONLINE tier: lift fetched
    feature maps into a small DataFrame, run the SAME apply_derivations the
    offline merge uses (Catalyst evaluates the identical selectExpr strings),
    collect back to dicts. Offline == online for derived columns is then true
    by construction — the reference achieves the same with a dedicated
    Catalyst harness (online/.../CatalystUtil.scala:1-191; Fetcher derivation
    stage). One Spark job per CALL, not per row: batch fetches through
    JoinFetcher.fetch_join_batch to amortize."""
    from pyspark.sql import types as T

    if not derivations or not rows:
        return list(rows)
    cols: list[str] = list(dict.fromkeys(c for r in rows for c in r))
    fields = []
    hint = schema_hint or {}
    for c in cols:
        if c in hint:
            # a known feature column: its ENGINE type, so an all-None batch
            # (e.g. a key with no events in-window) still type-checks in
            # arithmetic derivations instead of falling back to string
            fields.append(T.StructField(c, hint[c], True))
            continue
        v = next((r[c] for r in rows if r.get(c) is not None), None)
        fields.append(T.StructField(c, _infer_type(v), True))
    df = spark.createDataFrame(
        [tuple(r.get(c) for c in cols) for r in rows], T.StructType(fields))
    out = apply_derivations(df, derivations, always_keep=always_keep)
    return [row.asDict() for row in out.collect()]
