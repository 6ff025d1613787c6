"""Derivations: named Spark-SQL expressions over output columns, with "*"
wildcard (api.thrift:398-404; Extensions.scala DerivationOps
finalOutputColumn; applied at GroupBy.scala:912-917 and Join.scala:401-462).
"""

from __future__ import annotations

from typing import Iterable, Sequence

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
