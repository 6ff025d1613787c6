"""onlineExternalParts (fetch-time handler routing, api.thrift:419-421) and
ModelTransforms sources (model-enriched rows feeding a GroupBy,
api.thrift:606-617)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zipline_chronon_spark.api import (
    Aggregation,
    EventSource,
    ExternalPart,
    ExternalSource,
    GroupBy,
    Join,
    JoinPart,
    Model,
    ModelTransforms,
    Operation,
    Query,
    TimeUnit,
    Window,
)
from zipline_chronon_spark.operators.pit_join import compute_group_by

BASE = 1_700_000_000_000


@pytest.fixture(scope="module")
def events(spark):
    rng = np.random.default_rng(31)
    n = 800
    pdf = pd.DataFrame({
        "k": rng.integers(0, 4, n).astype(str),
        "ts_ms": BASE + rng.integers(0, 86_400_000, n),
        "v": rng.normal(5, 2, n).round(3),
    }).astype({"ts_ms": "int64"})
    spark.createDataFrame(pdf).createOrReplaceTempView("xm_events")
    return pdf


def _score(pdf: pd.DataFrame) -> pd.DataFrame:
    # stand-in for vectorized model inference: same callable contract as an
    # ONNX/torch session wrapper (pandas in -> pandas out)
    return pd.DataFrame({"score": pdf["v"].to_numpy() * 2.0 + 1.0})


def test_model_transform_source_feeds_groupby(spark, events):
    mt = ModelTransforms(
        sources=(EventSource(table="xm_events", query=Query(time_column="ts_ms")),),
        models=(Model(name="scorer", output_columns=("score",), transform=_score),),
        passthrough_fields=("k", "ts_ms"),
        query=Query(time_column="ts_ms"),
    )
    gb = GroupBy(
        name="mt",
        sources=(mt,),
        key_columns=("k",),
        aggregations=(Aggregation("score", Operation.SUM,
                                  windows=(Window(1, TimeUnit.DAYS),)),),
    )
    q = spark.createDataFrame(pd.DataFrame({
        "k": ["0", "1", "2", "3"],
        "ts_ms": [BASE + 86_400_000] * 4,
        "__row_id": np.arange(4, dtype=np.int64),
    }))
    got = (compute_group_by(spark, gb, q, row_id="__row_id", query_time_col="ts_ms")
           .toPandas().set_index("__row_id"))
    # oracle: same aggregation over a pre-scored frame
    pdf = events.copy()
    pdf["score"] = pdf["v"] * 2.0 + 1.0
    T = BASE + 86_400_000
    for i, k in enumerate(["0", "1", "2", "3"]):
        m = pdf[(pdf.k == k) & (pdf.ts_ms <= T)]
        exp = m["score"].sum()
        assert abs(got.loc[i, "score_sum_1d"] - exp) < 1e-6, k


def test_join_fetcher_external_parts(spark, events):
    from zipline_chronon_spark.online.fetcher import (JoinFetcher,
                                                      upload_batch_state)
    from zipline_chronon_spark.online.kv import InMemoryKv

    gb = GroupBy(
        name="fx2",
        sources=(EventSource(table="xm_events", query=Query(time_column="ts_ms")),),
        key_columns=("k",),
        aggregations=(Aggregation("v", Operation.SUM, windows=(None,)),),
    )
    ext = ExternalSource(name="risk_api", key_columns=("user",),
                         value_columns=("risk", "segment"))
    join = Join(
        name="xj",
        left=EventSource(table="xm_events", query=Query(time_column="ts_ms")),
        parts=(JoinPart(group_by=gb),),
        online_external_parts=(
            ExternalPart(source=ext, key_mapping=(("k", "user"),)),),
    )

    kv = InMemoryKv()
    upload_batch_state(kv, spark, gb, BASE + 86_400_000)

    calls = []

    def handler(req: dict) -> dict:
        calls.append(req)
        return {"risk": float(len(req["user"])) / 10, "segment": f"s{req['user']}"}

    # missing handler must fail at construction, not at fetch time
    with pytest.raises(ValueError, match="risk_api"):
        JoinFetcher(kv, join)

    jf = JoinFetcher(kv, join, external_handlers={"risk_api": handler})
    out = jf.fetch_join({"k": "2"}, at_ts_ms=BASE + 86_400_000)
    assert calls == [{"user": "2"}]
    exp_sum = events[events.k == "2"]["v"].sum()
    assert abs(out["fx2_v_sum"] - exp_sum) < 1e-6
    assert out["ext_risk_api_risk"] == 0.1
    assert out["ext_risk_api_segment"] == "s2"
    # unseen key: part features null, external handler still consulted
    out2 = jf.fetch_join({"k": "zzz"}, at_ts_ms=BASE + 86_400_000)
    assert out2["fx2_v_sum"] is None
    assert out2["ext_risk_api_segment"] == "szzz"


def test_model_transform_on_streaming_df(spark, events, tmp_path_factory):
    """apply_models runs UNCHANGED on a streaming DataFrame — the online
    enrichment path uses the exact batch callables (no train/serve skew)."""
    from zipline_chronon_spark.operators.pit_join import apply_models

    base = tmp_path_factory.mktemp("mstream")
    in_dir, out_dir, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    sdf = spark.table("xm_events")
    sdf.write.mode("overwrite").parquet(in_dir)

    mt = ModelTransforms(
        sources=(EventSource(table="xm_events", query=Query(time_column="ts_ms")),),
        models=(Model(name="scorer", output_columns=("score",), transform=_score),),
        passthrough_fields=("k", "ts_ms"),
    )
    stream = spark.readStream.schema(sdf.schema).parquet(in_dir)
    enriched = apply_models(stream, mt)
    assert enriched.isStreaming
    q = (enriched.writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).toPandas().sort_values(
        ["k", "ts_ms", "score"]).reset_index(drop=True)
    exp = events.copy()
    exp["score"] = exp["v"] * 2.0 + 1.0
    exp = exp[["k", "ts_ms", "score"]].sort_values(
        ["k", "ts_ms", "score"]).reset_index(drop=True)
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["score"], exp["score"], atol=1e-9)
