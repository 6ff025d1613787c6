"""Every queries() entry must match its DuckDB oracle (the driver's gate)."""

from __future__ import annotations

import os

import pytest

from tests import mini_driver

SF_DIR = os.environ.get("ZCS_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "event_id" in df.columns


def test_all_queries_match_oracles(spark):
    results = mini_driver.run_all(spark, SF_DIR)
    failures = {
        n: {k: v for k, v in r.items() if k != "ok"}
        for n, r in results.items()
        if not r["ok"]
    }
    assert not failures, failures
