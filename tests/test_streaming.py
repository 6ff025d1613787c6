"""Streaming hop tiles == batch hop tiles (lambda-architecture parity).

The stream is driven deterministically: transcript rows land as parquet
files in a watched directory, the query drains with trigger(availableNow).
Append mode only emits tiles whose end <= final watermark (max event time −
lateness) — the comparison respects that; later tiles belong to batch."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests import specs
from zipline_chronon_spark.api import Aggregation, GroupBy, Operation
from zipline_chronon_spark.sources.transcripts import generate_transcripts
from zipline_chronon_spark.streaming import hop_stream

HOP = "5 minutes"
LATENESS = "10 minutes"


def _gb(path):
    return GroupBy(
        name="stream_tiles",
        sources=(specs.transcripts_source(path),),
        key_columns=("conv_id",),
        aggregations=(
            Aggregation("len_text", Operation.SUM, windows=(specs.W1D,)),
            Aggregation("len_text", Operation.AVERAGE, windows=(specs.W1D,)),
            Aggregation("len_text", Operation.MIN, windows=(specs.W1D,)),
            Aggregation("len_text", Operation.MAX, windows=(specs.W1D,)),
            Aggregation("text", Operation.COUNT, windows=(specs.W1D,)),
            Aggregation("text", Operation.LAST, windows=(specs.W1D,)),
        ),
        tie_breaker_column="turn_idx",
    )


def test_stream_tiles_match_batch(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")

    pdf = generate_transcripts(n_convs=8, avg_turns=25, n_days=2, seed=17)
    sdf_schema = spark.createDataFrame(pdf).schema
    # chronological arrival in 3 file batches (rows later than the watermark
    # would be DROPPED as late — that is correct streaming semantics, so the
    # test feeds time-ordered chunks like a real stream)
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    cuts = [0, len(pdf) // 3, 2 * len(pdf) // 3, len(pdf)]
    parts = [pdf.iloc[cuts[i]:cuts[i + 1]] for i in range(3)]
    import os
    import time as _time

    for i, p in enumerate(parts):
        # one part file per chunk with increasing mtime so the file source
        # replays them in event-time order (real streams arrive in order)
        spark.createDataFrame(p).coalesce(1).write.mode("overwrite").parquet(
            f"{in_dir}/batch_{i}.parquet")
        future = _time.time() + i * 10
        for root, _, files in os.walk(f"{in_dir}/batch_{i}.parquet"):
            for fn in files:
                os.utime(os.path.join(root, fn), (future, future))

    stream = (
        spark.readStream.schema(sdf_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{in_dir}/batch_*.parquet")
    )
    gb = _gb(f"{in_dir}/batch_*.parquet")
    hop_stream.run_stream_to_parquet(stream, gb, out_dir, ckpt, hop=HOP, lateness=LATENESS)

    got = spark.read.parquet(out_dir).toPandas()
    assert len(got) > 0

    batch_df = spark.read.parquet(f"{in_dir}/batch_*.parquet")
    exp_all = hop_stream.hop_tiles_batch(batch_df, gb, hop=HOP).toPandas()

    # 1) every emitted tile is exactly its batch counterpart
    key = ["conv_id", "hop_start_ms"]
    merged = got.merge(exp_all, on=key, suffixes=("_s", "_b"), how="left")
    assert len(merged) == len(got)
    for c in got.columns:
        if c in key:
            continue
        assert merged[f"{c}_s"].equals(merged[f"{c}_b"]), c  # NaN-aware

    # 2) coverage: everything sealed by the watermark of the 2nd-to-last
    #    batch must have been emitted (append-mode guarantee)
    hop_ms = 5 * 60_000
    wm2_ms = int(parts[1]["ts"].max().value // 1_000_000) - 10 * 60_000
    must_emit = exp_all[exp_all["hop_start_ms"] + hop_ms <= wm2_ms]
    emitted = set(zip(got["conv_id"], got["hop_start_ms"]))
    missing = [t for t in zip(must_emit["conv_id"], must_emit["hop_start_ms"])
               if t not in emitted]
    assert not missing, f"{len(missing)} sealed tiles not emitted: {missing[:5]}"


def test_unsupported_op_raises(spark, tmp_path_factory):
    gb = GroupBy(
        name="bad",
        sources=(specs.transcripts_source("x"),),
        key_columns=("conv_id",),
        aggregations=(Aggregation("text", Operation.LAST_K, arg_map=(("k", "2"),)),),
    )
    with pytest.raises(NotImplementedError):
        hop_stream.tile_aggregates(gb)


def test_hll_tiles_merge_to_distinct(spark, tmp_path_factory):
    """APPROX_UNIQUE_COUNT tiles carry mergeable HLL IRs: merging all tiles
    of a key reproduces its global distinct count (within HLL error)."""
    from zipline_chronon_spark.sources.transcripts import generate_transcripts

    pdf = generate_transcripts(n_convs=6, avg_turns=40, n_days=2, seed=23)
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("hll_events")
    gb = GroupBy(
        name="hll_tiles",
        sources=(specs.transcripts_source("hll_events"),),
        key_columns=("conv_id",),
        aggregations=(Aggregation("text", Operation.APPROX_UNIQUE_COUNT,
                                  windows=(specs.W1D,)),),
    )
    tiles = hop_stream.hop_tiles_batch(df, gb, hop="1 hour")
    merged = hop_stream.merge_tile_sketches(tiles, gb).toPandas()
    exact = {r["conv_id"]: r["d"] for r in df.where("text is not null")
             .groupBy("conv_id").agg(F.countDistinct("text").alias("d")).collect()}
    assert len(merged) == len(exact)
    for _, r in merged.iterrows():
        est, true = r["hll_text_estimate"], exact[r["conv_id"]]
        assert abs(est - true) <= max(2, 0.1 * true), (r["conv_id"], est, true)
