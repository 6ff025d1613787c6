"""DirKv prefix-bucketed scans (spark-free): a component-aligned prefix
scan reads ONE bucket; unaligned/empty prefixes fall back to a correct
full walk; overwrites are in-place."""

from __future__ import annotations

import os

from zipline_chronon_spark.online.kv import DirKv


def test_bucketed_prefix_scan(tmp_path):
    kv = DirKv(str(tmp_path))
    kv.put("ds", b'["a"]|100|1', b"v1")
    kv.put("ds", b'["a"]|200|1', b"v2")
    kv.put("ds", b'["b"]|100|1', b"v3")
    kv.put("ds", b'["a"]', b"v0")

    assert kv.get("ds", b'["a"]|100|1') == b"v1"
    assert kv.get("ds", b'["a"]') == b"v0"
    assert sorted(v for _, v in kv.scan("ds", b'["a"]|')) == [b"v1", b"v2"]
    assert sorted(v for _, v in kv.scan("ds")) == [b"v0", b"v1", b"v2", b"v3"]
    # non-component-aligned prefix: full walk, still correct
    assert sorted(v for _, v in kv.scan("ds", b'["a"]')) == [b"v0", b"v1", b"v2"]

    kv.put("ds", b'["a"]|100|1', b"v1b")  # overwrite lands in place
    assert kv.get("ds", b'["a"]|100|1') == b"v1b"
    assert len(list(kv.scan("ds", b'["a"]|'))) == 2

    # the index actually restricts IO: exactly one bucket dir touched by an
    # aligned scan, and the dataset has one bucket per distinct key part
    buckets = os.listdir(tmp_path / "ds")
    assert len(buckets) == 2  # ["a"]* share a bucket; ["b"] has its own
