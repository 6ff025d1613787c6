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
