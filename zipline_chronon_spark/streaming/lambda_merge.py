"""Lambda-architecture merge: batch sketch states + streaming tiles.

The reference's online tier uploads per-key batch IRs (GroupByUpload.scala
:112-300) and merges them with post-batch streaming tiles at fetch time
(SawtoothOnlineAggregator.scala:86-167 lambdaAggregateFinalized). This
module is the PySpark equivalent for sketch-backed ops:

    sketch_tiles(events, gb, hop)      -> (keys, hop_start_ms, <op IR bytes>)
    collapse(tiles, gb)                -> one merged IR row per key
    finalize(states, gb)               -> per-key estimates

IRs are the mergeable numpy sketches (operators/sketches.py): HLL bytes for
APPROX_UNIQUE_COUNT, KLL bytes for APPROX_PERCENTILE. Because merge is
associative+commutative, `collapse(batch_tiles UNION stream_tiles)` equals
the batch engine evaluated at the merged watermark — the parity oracle in
tests/test_lambda_merge.py (the reference's strongest e2e shape:
offline-join == online-fetch, FetcherTestUtil.scala:245-740).

Everything runs as grouped Arrow tasks (applyInPandas); per-key state is
O(sketch), never O(distinct) — the property the exact batch kernels cannot
provide at the KV tier.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zipline_chronon_spark.api import GroupBy, Operation
from zipline_chronon_spark.operators.sketches import FreqSketch, HllSketch, KllSketch

_SKETCH_OPS = {Operation.APPROX_UNIQUE_COUNT, Operation.APPROX_PERCENTILE,
               Operation.APPROX_FREQUENT_K, Operation.APPROX_HEAVY_HITTERS_K}


def _sketch_parts(gb: GroupBy) -> list:
    parts = [p for p in gb.parts() if p.operation in _SKETCH_OPS]
    if not parts:
        raise ValueError("GroupBy has no sketch-backed aggregations")
    return parts


def _ir_col(part) -> str:
    return f"{part.output_name}_ir"


_FREQ_OPS = {Operation.APPROX_FREQUENT_K, Operation.APPROX_HEAVY_HITTERS_K}


def _new_sketch(part):
    if part.operation == Operation.APPROX_UNIQUE_COUNT:
        return HllSketch()
    if part.operation in _FREQ_OPS:
        return FreqSketch()
    return KllSketch()


def _from_bytes(part, b: bytes):
    if part.operation == Operation.APPROX_UNIQUE_COUNT:
        return HllSketch.from_bytes(b)
    if part.operation in _FREQ_OPS:
        return FreqSketch.from_bytes(b)
    return KllSketch.from_bytes(b)


def sketch_tiles(df: DataFrame, gb: GroupBy, hop_ms: int,
                 ts_col: str = "ts") -> DataFrame:
    """One row per (key, hop) with a sketch IR per approx aggregation —
    the tile granularity of the streaming half (hop_stream.py) expressed
    as IR bytes instead of finalized values."""
    parts = _sketch_parts(gb)
    keys = list(gb.key_columns)
    selects = {}
    for s in gb.sources:
        selects.update(s.query.selects or {})
    cols = [F.expr(selects.get(n, n)).alias(n)
            for n in dict.fromkeys([*keys, *(p.input_column for p in parts)])]
    p = df.select(*cols,
                  F.unix_millis(F.col(ts_col).cast("timestamp")).alias("__ts_ms"))
    p = p.withColumn("hop_start_ms", (F.col("__ts_ms") / hop_ms).cast("long") * hop_ms)

    key_fields = df.select(*[F.expr(selects.get(k, k)).alias(k) for k in keys]).schema
    schema = key_fields.add("hop_start_ms", T.LongType())
    for pt in parts:
        schema = schema.add(_ir_col(pt), T.BinaryType())

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["hop_start_ms"] = [pdf["hop_start_ms"].iloc[0]]
        for pt in parts:
            vals = pdf[pt.input_column].dropna().to_numpy()
            out[_ir_col(pt)] = [_new_sketch(pt).update(vals).to_bytes()]
        return pd.DataFrame(out)

    return p.groupBy(*keys, "hop_start_ms").applyInPandas(build, schema=schema)


def collapse(tiles: DataFrame, gb: GroupBy) -> DataFrame:
    """Merge all tiles per key into one IR row (the batch-upload state;
    also the fetch-time merge when applied to batch-state UNION stream
    tiles — merge is associative and commutative)."""
    parts = _sketch_parts(gb)
    keys = list(gb.key_columns)
    schema = tiles.drop("hop_start_ms").schema

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {k: [pdf[k].iloc[0]] for k in keys}
        for pt in parts:
            sk = None
            for b in pdf[_ir_col(pt)]:
                cur = _from_bytes(pt, bytes(b))
                sk = cur if sk is None else sk.merge(cur)
            out[_ir_col(pt)] = [sk.to_bytes()]
        return pd.DataFrame(out)

    return tiles.groupBy(*keys).applyInPandas(merge_group, schema=schema)


def finalize(states: DataFrame, gb: GroupBy) -> DataFrame:
    """IR bytes -> estimates: HLL estimate (exact in the sparse regime),
    KLL quantiles (exact in the buffer regime)."""
    parts = _sketch_parts(gb)
    keys = list(gb.key_columns)
    out_schema = states.select(*keys).schema
    for pt in parts:
        if pt.operation == Operation.APPROX_UNIQUE_COUNT:
            out_schema = out_schema.add(pt.output_name, T.LongType())
        elif pt.operation in _FREQ_OPS:
            out_schema = out_schema.add(
                pt.output_name, T.MapType(T.StringType(), T.LongType()))
        else:
            out_schema = out_schema.add(pt.output_name, T.ArrayType(T.DoubleType()))

    pcts: dict[str, list[float]] = {
        _ir_col(pt): [float(x) for x in
                      pt.args.get("percentiles", "[0.5]").strip("[] ").split(",")]
        for pt in parts if pt.operation == Operation.APPROX_PERCENTILE
    }

    def fin(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {k: pdf[k] for k in keys}
        for pt in parts:
            col = _ir_col(pt)
            if pt.operation == Operation.APPROX_UNIQUE_COUNT:
                out[pt.output_name] = [
                    int(round(HllSketch.from_bytes(bytes(b)).estimate()))
                    for b in pdf[col]]
            elif pt.operation in _FREQ_OPS:
                nfp = pt.operation == Operation.APPROX_HEAVY_HITTERS_K
                out[pt.output_name] = [
                    FreqSketch.from_bytes(bytes(b)).top_k(pt.k or 1,
                                                          no_false_positives=nfp)
                    for b in pdf[col]]
            else:
                out[pt.output_name] = [
                    KllSketch.from_bytes(bytes(b)).quantiles(pcts[col])
                    for b in pdf[col]]
        return pd.DataFrame(out)

    return states.mapInPandas(lambda it: (fin(pdf) for pdf in it), schema=out_schema)


def lambda_finalized(batch_state: DataFrame, stream_tiles: DataFrame,
                     gb: GroupBy) -> DataFrame:
    """Fetch-time merge: per-key batch IR + post-batch tiles -> estimates.
    (SawtoothOnlineAggregator.lambdaAggregateFinalized analogue for
    unbounded approx features.)"""
    keys = list(gb.key_columns)
    union = batch_state.unionByName(stream_tiles.drop("hop_start_ms"))
    return finalize(collapse(union.withColumn("hop_start_ms", F.lit(0)), gb), gb)
