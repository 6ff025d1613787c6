"""StagingQuery: free-form Spark SQL with date macros.

Reference: thrift/api.thrift:69-110 (macros ``{{ start_date }}``,
``{{ end_date }}``, ``{{ latest_date }}``, ``{{ max_date(table=...) }}``),
executed by spark/.../batch/StagingQueryJob.scala with fill-what's-missing
range accounting (which our plans/backfill.py provides generically).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MAX_DATE = re.compile(r"\{\{\s*max_date\(table=([^)]+)\)\s*\}\}")


@dataclass(frozen=True)
class StagingQuery:
    name: str
    query: str
    setups: tuple[str, ...] = ()


def _max_date(spark: SparkSession, table: str, partition_col: str = "ds") -> str:
    table = table.strip().strip("'\"")
    df = spark.read.parquet(table) if "/" in table else spark.table(table)
    return str(df.agg(F.max(partition_col)).collect()[0][0])


def render(
    spark: SparkSession,
    sq: StagingQuery,
    start_date: str,
    end_date: str,
    latest_date: Optional[str] = None,
) -> str:
    q = sq.query
    q = re.sub(r"\{\{\s*start_date\s*\}\}", start_date, q)
    q = re.sub(r"\{\{\s*end_date\s*\}\}", end_date, q)
    q = re.sub(r"\{\{\s*latest_date\s*\}\}", latest_date or end_date, q)
    for m in set(_MAX_DATE.findall(q)):
        q = re.sub(r"\{\{\s*max_date\(table=" + re.escape(m) + r"\)\s*\}\}",
                   _max_date(spark, m), q)
    return q


def run(
    spark: SparkSession,
    sq: StagingQuery,
    start_date: str,
    end_date: str,
    latest_date: Optional[str] = None,
) -> DataFrame:
    for stmt in sq.setups:
        spark.sql(stmt)
    return spark.sql(render(spark, sq, start_date, end_date, latest_date))
