"""StagingQuery macro rendering + multimodal binary plumbing."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from zipline_chronon_spark.operators import multimodal
from zipline_chronon_spark.plans.staging import StagingQuery, render, run


def test_staging_macros(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("sq") / "t.parquet")
    spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-05", 2)], "ds string, v int"
    ).write.mode("overwrite").parquet(p)
    sq = StagingQuery(
        name="demo",
        query=f"""
        SELECT '{{{{ start_date }}}}' AS s, '{{{{ end_date }}}}' AS e,
               '{{{{ latest_date }}}}' AS l,
               '{{{{ max_date(table={p}) }}}}' AS m,
               count(*) AS n
        FROM parquet.`{p}` WHERE ds BETWEEN '{{{{ start_date }}}}' AND '{{{{ end_date }}}}'
        """,
    )
    rendered = render(spark, sq, "2024-01-01", "2024-01-03")
    assert "{{" not in rendered
    row = run(spark, sq, "2024-01-01", "2024-01-03").collect()[0]
    assert (row["s"], row["e"], row["l"], row["m"], row["n"]) == (
        "2024-01-01", "2024-01-03", "2024-01-03", "2024-01-05", 1)


def test_staging_job_resume_and_spec_change(spark, tmp_path_factory):
    """StagingQueryJob fills only missing partitions (kill-resume), and a
    changed query archives + recomputes (StagingQueryJob.scala
    fill-what's-missing; round-3 missing #5)."""
    from zipline_chronon_spark.plans.staging import StagingQueryJob

    base = tmp_path_factory.mktemp("sqj")
    src = str(base / "src.parquet")
    rows = [(f"2024-02-{d:02d}", i, float(i * d)) for d in range(1, 7)
            for i in range(5)]
    spark.createDataFrame(rows, "ds string, id int, v double").write.mode(
        "overwrite").parquet(src)
    sq = StagingQuery(
        name="sqj",
        query=f"""SELECT ds, id, v, v * 2 AS v2 FROM parquet.`{src}`
                  WHERE ds BETWEEN '{{{{ start_date }}}}' AND '{{{{ end_date }}}}'""",
    )
    out = str(base / "out")

    job = StagingQueryJob(spark, sq, out)
    r1 = job.run("2024-02-01", "2024-02-03", step_days=2)
    assert sum(len(c["partitions"]) for c in r1["computed_chunks"]) == 3

    # "killed after day 3": a second run over the wider range fills ONLY
    # the missing days
    r2 = StagingQueryJob(spark, sq, out).run("2024-02-01", "2024-02-06")
    filled = [ds for c in r2["computed_chunks"] for ds in c["partitions"]]
    assert filled == ["2024-02-04", "2024-02-05", "2024-02-06"]
    assert r2["skipped"] == 3
    got = spark.read.parquet(out)
    assert got.count() == 30 and got.where("v2 <> v * 2").count() == 0

    # changed SQL -> archive + full recompute under the new hash
    sq2 = StagingQuery(name="sqj", query=sq.query.replace("v * 2", "v * 3"))
    r3 = StagingQueryJob(spark, sq2, out).run("2024-02-01", "2024-02-06")
    assert r3["archived"] is not None
    assert sum(len(c["partitions"]) for c in r3["computed_chunks"]) == 6
    assert spark.read.parquet(out).where("v2 <> v * 3").count() == 0

    # missing partition column -> named error
    bad = StagingQuery(name="bad", query="SELECT 1 AS x")
    with pytest.raises(ValueError, match="partition column"):
        StagingQueryJob(spark, bad, str(base / "bad")).run(
            "2024-02-01", "2024-02-01")


@pytest.fixture()
def media_df(spark):
    rows = [(i, f"payload-{i}".encode() * (i + 1)) for i in range(20)]
    rows.append((99, None))
    return spark.createDataFrame(rows, "doc_id long, media binary")


def test_media_metadata(media_df):
    out = multimodal.extract_media_metadata(media_df).toPandas()
    assert len(out) == 21
    ok = out[out["doc_id"] != 99].sort_values("doc_id").reset_index(drop=True)
    assert (ok["media_bytes"] == [len(f"payload-{i}".encode() * (i + 1)) for i in range(20)]).all()
    assert ok["sha256"].str.len().eq(64).all()
    assert (ok["width"] >= 16).all()
    null_row = out[out["doc_id"] == 99].iloc[0]
    assert pd.isna(null_row["sha256"])
    # determinism: same payload -> same metadata
    out2 = multimodal.extract_media_metadata(media_df).toPandas()
    assert out.sort_values("doc_id")["sha256"].tolist() == \
        out2.sort_values("doc_id")["sha256"].tolist()


def test_frame_sampling(media_df):
    frames = multimodal.frame_sample_stub(media_df, every_n=2).toPandas()
    assert (frames["frame_idx"] % 2 == 0).all()
    one = frames[frames["doc_id"] == 1]
    assert len(one) >= 1 and one["frame_idx"].tolist() == sorted(one["frame_idx"].tolist())
