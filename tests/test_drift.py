"""Drift job: summarize partitions -> compare windows (Summarizer.scala /
DriftMetrics shape). A synthetically shifted partition must light up PSI on
the shifted column and stay ~0 on the stable one."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zipline_chronon_spark.plans.drift import drift_series, summarize_partitions


@pytest.fixture(scope="module")
def drift_table(spark, tmp_path_factory):
    rng = np.random.default_rng(21)
    frames = []
    for i, ds in enumerate(["2024-05-01", "2024-05-02", "2024-05-03"]):
        n = 2000
        shift = 8.0 if i == 2 else 0.0  # day 3: drifted mean on `x`
        frames.append(pd.DataFrame({
            "ds": ds,
            "x": rng.normal(10 + shift, 2, n),
            "stable": rng.normal(0, 1, n),
            "cat": rng.choice(["a", "b", "c"], n,
                              p=[0.6, 0.3, 0.1] if i < 2 else [0.1, 0.3, 0.6]),
        }))
    pdf = pd.concat(frames, ignore_index=True)
    path = str(tmp_path_factory.mktemp("drift") / "t.parquet")
    spark.createDataFrame(pdf).write.partitionBy("ds").mode("overwrite").parquet(path)
    return path


def test_summarize_partitions(spark, drift_table):
    s = summarize_partitions(spark, drift_table).toPandas()
    assert set(s["ds"]) == {"2024-05-01", "2024-05-02", "2024-05-03"}
    assert set(s["column"]) == {"x", "stable", "cat"}
    row = s[(s.ds == "2024-05-01") & (s.column == "x")].iloc[0]
    assert row.total == 2000 and row.nulls == 0
    assert abs(row["mean"] - 10.0) < 0.2
    assert sum(row.bin_counts.values()) == 2000
    # histograms share global bin edges: the drifted day occupies HIGHER
    # bins than day 1 for x
    d3 = s[(s.ds == "2024-05-03") & (s.column == "x")].iloc[0].bin_counts
    top_bin_d3 = max(int(b) for b in d3)
    top_bin_d1 = max(int(b) for b in row.bin_counts)
    assert top_bin_d3 > top_bin_d1 - 3


def test_drift_series_flags_shift(spark, drift_table):
    s = summarize_partitions(spark, drift_table)
    d = drift_series(s, metric="psi").toPandas().set_index(["ds", "column"])
    # day2 vs day1: everything stable
    assert d.loc[("2024-05-02", "x"), "psi"] < 0.1
    assert d.loc[("2024-05-02", "cat"), "psi"] < 0.1
    # day3 vs day2: x and cat drifted, stable did not
    assert d.loc[("2024-05-03", "x"), "psi"] > 1.0
    assert d.loc[("2024-05-03", "cat"), "psi"] > 0.3
    assert d.loc[("2024-05-03", "stable"), "psi"] < 0.1
    # js metric agrees on the ordering
    j = drift_series(s, metric="js").toPandas().set_index(["ds", "column"])
    assert j.loc[("2024-05-03", "x"), "js"] > j.loc[("2024-05-03", "stable"), "js"]
