"""GroupByUpload + Fetcher: the online serving tier.

Reference shape (GroupByUpload.scala:112-300 batch IR upload;
Fetcher/FetcherBase online merge; FetcherTestUtil.scala:245-740 asserts
offline join == online fetch): the batch job writes one IR row per key at
batchEndTs; the streaming job writes per-(key, hop) tile IRs; at fetch
time the two merge and finalize.

This module implements that contract for every op with a mergeable IR:

 - scalars: SUM(sum), COUNT(count), AVERAGE(sum,count), MIN, MAX,
   FIRST/LAST((ts, value) arg-extremes)
 - sketches: APPROX_UNIQUE_COUNT (HLL), APPROX_PERCENTILE (KLL),
   APPROX_FREQUENT_K / APPROX_HEAVY_HITTERS_K (Misra-Gries) — the bytes
   IRs from operators/sketches.py.

Unbounded windows only (the windowed tail-hop variant lives in the batch
engine; serving windowed features requires tile selection at fetch time —
same tiles, selection by hop_start >= round(T-w, hop)).

Upload collects IR rows to the driver before kv.put — correct for the
in-memory store; against a real KV the same rows stream out via
foreachPartition with identical bytes. The parity oracle
(tests/test_fetcher.py): fetch(keys) at T1 == compute_key_states at T1.
"""

from __future__ import annotations

import base64
import json
import math
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zipline_chronon_spark.api import GroupBy, Operation
from zipline_chronon_spark.online.kv import KvStore, key_bytes
from zipline_chronon_spark.operators.sketches import FreqSketch, HllSketch, KllSketch

SCALAR_OPS = {Operation.SUM, Operation.COUNT, Operation.AVERAGE, Operation.MIN,
              Operation.MAX, Operation.FIRST, Operation.LAST}
SKETCH_OPS = {Operation.APPROX_UNIQUE_COUNT, Operation.APPROX_PERCENTILE,
              Operation.APPROX_FREQUENT_K, Operation.APPROX_HEAVY_HITTERS_K}
_FREQ = {Operation.APPROX_FREQUENT_K, Operation.APPROX_HEAVY_HITTERS_K}


def _parts(gb: GroupBy) -> list:
    parts = [p for p in gb.parts() if p.window is None]
    bad = [p for p in parts if p.operation not in SCALAR_OPS | SKETCH_OPS]
    if bad:
        raise NotImplementedError(f"no mergeable IR for {[p.operation for p in bad]}")
    if len(parts) != len(gb.parts()):
        raise NotImplementedError("fetcher tier serves unbounded windows; "
                                  "windowed features need tile selection")
    return parts


def _events(spark: SparkSession, gb: GroupBy, lo: Optional[int], hi: int) -> DataFrame:
    from zipline_chronon_spark.operators import pit_join

    return pit_join.events_df(spark, gb, time_range_ms=(lo, hi))


def _ir_rows(df: DataFrame, gb: GroupBy, extra_group: Optional[F.Column] = None):
    """One IR row per key (x optional tile window): scalar IRs as Spark
    aggregates, sketch IRs built Arrow-side per group."""
    from zipline_chronon_spark.operators import pit_join
    from zipline_chronon_spark.streaming import lambda_merge

    parts = _parts(gb)
    keys = list(gb.key_columns)
    aggs, sketch_parts = [], []
    for p in parts:
        c, nm = F.col(p.input_column), p.output_name
        if p.operation == Operation.SUM:
            aggs.append(F.sum(c).alias(f"{nm}__sum"))
        elif p.operation == Operation.COUNT:
            aggs.append(F.count(c).alias(f"{nm}__count"))
        elif p.operation == Operation.AVERAGE:
            aggs.append(F.sum(c).alias(f"{nm}__sum"))
            aggs.append(F.count(c).alias(f"{nm}__count"))
        elif p.operation == Operation.MIN:
            aggs.append(F.min(c).alias(f"{nm}__min"))
        elif p.operation == Operation.MAX:
            aggs.append(F.max(c).alias(f"{nm}__max"))
        elif p.operation == Operation.FIRST:
            aggs.append(F.min_by(c, F.col(pit_join.TS_COL)).alias(f"{nm}__v"))
            aggs.append(F.min(F.col(pit_join.TS_COL)).alias(f"{nm}__ts"))
        elif p.operation == Operation.LAST:
            aggs.append(F.max_by(c, F.col(pit_join.TS_COL)).alias(f"{nm}__v"))
            aggs.append(F.max(F.col(pit_join.TS_COL)).alias(f"{nm}__ts"))
        else:
            sketch_parts.append(p)
    group_cols = keys + ([extra_group.alias("__tile")] if extra_group is not None else [])
    scalar_df = df.groupBy(*group_cols).agg(*aggs) if aggs else None

    sketch_df = None
    if sketch_parts:
        import pandas as pd
        from pyspark.sql import types as T

        schema = df.select(*keys).schema
        if extra_group is not None:
            schema = schema.add("__tile", T.LongType())
        for p in sketch_parts:
            schema = schema.add(f"{p.output_name}__sk", T.BinaryType())

        sp = list(sketch_parts)
        has_tile = extra_group is not None  # bool only: Columns don't pickle

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            out = {k: [pdf[k].iloc[0]] for k in keys}
            if has_tile:
                out["__tile"] = [pdf["__tile"].iloc[0]]
            for p in sp:
                vals = pdf[p.input_column].dropna().to_numpy()
                sk = (HllSketch() if p.operation == Operation.APPROX_UNIQUE_COUNT
                      else FreqSketch() if p.operation in _FREQ else KllSketch())
                out[f"{p.output_name}__sk"] = [sk.update(vals).to_bytes()]
            return pd.DataFrame(out)

        base = df if extra_group is None else df.withColumn("__tile", extra_group)
        gcols = keys + (["__tile"] if extra_group is not None else [])
        sketch_df = base.groupBy(*gcols).applyInPandas(build, schema=schema)

    if scalar_df is not None and sketch_df is not None:
        on = keys + (["__tile"] if extra_group is not None else [])
        return scalar_df.join(sketch_df, on, "full")
    return scalar_df if scalar_df is not None else sketch_df


def _encode(row: dict, parts) -> bytes:
    body = {}
    for p in parts:
        nm = p.output_name
        for suffix in ("sum", "count", "min", "max", "v", "ts"):
            col = f"{nm}__{suffix}"
            if col in row and row[col] is not None:
                body[col] = row[col]
        sk = f"{nm}__sk"
        if sk in row and row[sk] is not None:
            body[sk] = base64.b64encode(bytes(row[sk])).decode()
    return json.dumps(body, sort_keys=True, default=float).encode()


def upload_batch_state(kv: KvStore, spark: SparkSession, gb: GroupBy,
                       batch_end_ms: int) -> int:
    """GroupByUpload: one IR row per key over events <= batch_end_ms."""
    parts = _parts(gb)
    states = _ir_rows(_events(spark, gb, None, batch_end_ms), gb)
    n = 0
    for r in states.collect():  # real store: foreachPartition, same bytes
        d = r.asDict()
        kv.put(f"{gb.name}__batch", key_bytes(tuple(d[k] for k in gb.key_columns)),
               _encode(d, parts))
        n += 1
    kv.put(f"{gb.name}__meta", b"batch_end_ms", str(batch_end_ms).encode())
    return n


def upload_tiles(kv: KvStore, spark: SparkSession, gb: GroupBy,
                 lo_ms: int, hi_ms: int, hop_ms: int = 300_000) -> int:
    """Streaming half: per-(key, hop) tile IRs for events in (lo, hi]."""
    from zipline_chronon_spark.operators import pit_join

    parts = _parts(gb)
    ev = _events(spark, gb, lo_ms + 1, hi_ms)
    tile = (F.col(pit_join.TS_COL) / hop_ms).cast("long") * hop_ms
    tiles = _ir_rows(ev, gb, extra_group=tile)
    n = 0
    for r in tiles.collect():
        d = r.asDict()
        key = key_bytes(tuple(d[k] for k in gb.key_columns)) + b"|" + str(d["__tile"]).encode()
        kv.put(f"{gb.name}__tiles", key, _encode(d, parts))
        n += 1
    return n


class Fetcher:
    """Fetch-time lambda merge: batch IR + tiles -> finalized features."""

    def __init__(self, kv: KvStore, gb: GroupBy):
        self.kv = kv
        self.gb = gb
        self.parts = _parts(gb)

    def fetch(self, key_values: tuple) -> dict:
        kb = key_bytes(key_values)
        irs = []
        b = self.kv.get(f"{self.gb.name}__batch", kb)
        if b is not None:
            irs.append(json.loads(b))
        for _, v in self.kv.scan(f"{self.gb.name}__tiles", kb + b"|"):
            irs.append(json.loads(v))
        return {p.output_name: self._finalize(p, irs) for p in self.parts}

    def _finalize(self, p, irs: list[dict]):
        nm = p.output_name
        op = p.operation
        if op in SKETCH_OPS:
            sk = None
            for ir in irs:
                raw = ir.get(f"{nm}__sk")
                if raw is None:
                    continue
                cls = (HllSketch if op == Operation.APPROX_UNIQUE_COUNT
                       else FreqSketch if op in _FREQ else KllSketch)
                cur = cls.from_bytes(base64.b64decode(raw))
                sk = cur if sk is None else sk.merge(cur)
            if sk is None:
                return None
            if op == Operation.APPROX_UNIQUE_COUNT:
                return int(round(sk.estimate()))
            if op in _FREQ:
                pcts_k = p.k or 1
                return sk.top_k(pcts_k,
                                no_false_positives=op == Operation.APPROX_HEAVY_HITTERS_K)
            pcts = [float(x) for x in
                    p.args.get("percentiles", "[0.5]").strip("[] ").split(",")]
            return sk.quantiles(pcts)
        vals = [ir for ir in irs if any(k.startswith(f"{nm}__") for k in ir)]
        if not vals:
            return None
        if op == Operation.SUM:
            return sum(ir[f"{nm}__sum"] for ir in vals if f"{nm}__sum" in ir)
        if op == Operation.COUNT:
            return sum(ir[f"{nm}__count"] for ir in vals if f"{nm}__count" in ir)
        if op == Operation.AVERAGE:
            s = sum(ir[f"{nm}__sum"] for ir in vals if f"{nm}__sum" in ir)
            c = sum(ir[f"{nm}__count"] for ir in vals if f"{nm}__count" in ir)
            return s / c if c else None
        if op == Operation.MIN:
            return min(ir[f"{nm}__min"] for ir in vals if f"{nm}__min" in ir)
        if op == Operation.MAX:
            return max(ir[f"{nm}__max"] for ir in vals if f"{nm}__max" in ir)
        if op == Operation.FIRST:
            best = min((ir for ir in vals if f"{nm}__ts" in ir),
                       key=lambda ir: ir[f"{nm}__ts"], default=None)
        else:  # LAST
            best = max((ir for ir in vals if f"{nm}__ts" in ir),
                       key=lambda ir: ir[f"{nm}__ts"], default=None)
        return best[f"{nm}__v"] if best else None
