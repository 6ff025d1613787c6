"""Sketch IR contracts: exact small regimes, bounded error at scale,
merge associativity/commutativity, bytes round-trip (no Spark needed).

Error bounds mirror the reference's ApproxPercentilesTest /
ApproxDistinctTest shape (aggregator/src/test)."""

from __future__ import annotations

import numpy as np
import pytest

from zipline_chronon_spark.operators.sketches import HllSketch, KllSketch, hash64

rng = np.random.default_rng(42)


def test_hll_sparse_is_exact():
    vals = rng.integers(0, 10**12, size=3000)
    sk = HllSketch(sparse_limit=4096).update(vals)
    assert sk.estimate() == len(np.unique(vals))
    rt = HllSketch.from_bytes(sk.to_bytes())
    assert rt.estimate() == sk.estimate()


def test_hll_dense_error_bound():
    n = 200_000
    vals = rng.integers(0, 10**15, size=n)
    true = len(np.unique(vals))
    sk = HllSketch(lg_k=12, sparse_limit=1024).update(vals)
    assert sk.sparse is None  # degraded to dense
    rel = abs(sk.estimate() - true) / true
    assert rel < 0.05, (sk.estimate(), true, rel)  # ~1.04/sqrt(4096) = 1.6%
    rt = HllSketch.from_bytes(sk.to_bytes())
    assert rt.estimate() == sk.estimate()


def test_hll_merge_equals_union():
    a_vals = rng.integers(0, 10**6, size=50_000)
    b_vals = rng.integers(5 * 10**5, 1.5 * 10**6, size=50_000)
    both = HllSketch(lg_k=12, sparse_limit=512).update(np.concatenate([a_vals, b_vals]))
    a = HllSketch(lg_k=12, sparse_limit=512).update(a_vals)
    b = HllSketch(lg_k=12, sparse_limit=512).update(b_vals)
    ab = HllSketch.from_bytes(a.to_bytes()).merge(HllSketch.from_bytes(b.to_bytes()))
    ba = HllSketch.from_bytes(b.to_bytes()).merge(HllSketch.from_bytes(a.to_bytes()))
    # dense register states are identical regardless of merge order or
    # whether the stream was ever split
    assert ab.estimate() == ba.estimate() == both.estimate()


def test_hll_sparse_dense_mixed_merge():
    big = HllSketch(lg_k=10, sparse_limit=256).update(rng.integers(0, 10**9, size=10_000))
    small = HllSketch(lg_k=10, sparse_limit=256).update(np.arange(50))
    m = HllSketch.from_bytes(big.to_bytes()).merge(small)
    assert m.sparse is None
    assert m.estimate() >= big.estimate() * 0.95


def test_hll_string_hashing_deterministic():
    words = np.array([f"tok{i % 500}" for i in range(5000)], dtype=object)
    h1, h2 = hash64(words), hash64(words.copy())
    assert (h1 == h2).all()
    sk = HllSketch().update(words)
    assert sk.estimate() == 500


def test_kll_exact_regime_matches_np_quantile():
    vals = rng.normal(size=3000)
    sk = KllSketch(cap=4096).update(vals)
    got = sk.quantiles([0.1, 0.5, 0.99])
    exp = np.quantile(vals, [0.1, 0.5, 0.99])
    np.testing.assert_allclose(got, exp, rtol=0, atol=0)
    rt = KllSketch.from_bytes(sk.to_bytes())
    np.testing.assert_allclose(rt.quantiles([0.5]), sk.quantiles([0.5]))


@pytest.mark.parametrize("dist", ["normal", "lognormal", "uniform"])
def test_kll_rank_error_bound(dist):
    n = 300_000
    vals = getattr(rng, dist)(size=n)
    sk = KllSketch(cap=4096)
    for chunk in np.array_split(vals, 30):  # streaming updates
        sk.update(chunk)
    sorted_vals = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = sk.quantiles([q])[0]
        # rank error: where the estimate actually sits in the true CDF
        rank = np.searchsorted(sorted_vals, est) / n
        assert abs(rank - q) < 0.02, (dist, q, rank)


def test_kll_merge_error_bound():
    a = KllSketch(cap=2048).update(rng.normal(size=100_000))
    b = KllSketch(cap=2048).update(rng.normal(loc=3.0, size=100_000))
    m = KllSketch.from_bytes(a.to_bytes()).merge(KllSketch.from_bytes(b.to_bytes()))
    assert m.n == 200_000
    all_vals = None  # recompute truth
    # merged median must sit near the true pooled median
    est = m.quantiles([0.5])[0]
    # pooled distribution: mixture of N(0,1) and N(3,1) -> median = 1.5
    assert abs(est - 1.5) < 0.15, est


def test_freq_sketch_exact_regime_and_policies():
    from zipline_chronon_spark.operators.sketches import FreqSketch

    vals = ["a"] * 50 + ["b"] * 30 + ["c"] * 5 + ["d"] * 2
    sk = FreqSketch(capacity=16).update(vals)
    assert sk.error == 0  # exact: distinct <= capacity
    assert sk.top_k(2) == {"a": 50, "b": 30}
    assert sk.top_k(2, no_false_positives=True) == {"a": 50, "b": 30}
    rt = FreqSketch.from_bytes(sk.to_bytes())
    assert rt.top_k(3) == sk.top_k(3)


def test_freq_sketch_eviction_bounds():
    from zipline_chronon_spark.operators.sketches import FreqSketch

    rng2 = np.random.default_rng(9)
    # heavy items + a long tail that forces evictions
    stream = (["hot1"] * 5000 + ["hot2"] * 3000
              + [f"t{int(x)}" for x in rng2.integers(0, 50_000, size=40_000)])
    rng2.shuffle(stream)
    sk = FreqSketch(capacity=256)
    for chunk in np.array_split(np.array(stream, dtype=object), 20):
        sk.update(chunk)
    assert sk.error > 0
    # NO_FALSE_NEGATIVES: the true heavies are always present
    top = sk.top_k(10)
    assert "hot1" in top and "hot2" in top
    # upper bound >= true count >= lower bound
    assert top["hot1"] >= 5000 >= sk.counts["hot1"]
    # NO_FALSE_POSITIVES: everything reported truly exceeds the error floor
    for key, v in sk.top_k(10, no_false_positives=True).items():
        assert sk.counts[key] > sk.error


def test_freq_sketch_merge_matches_single_stream():
    from zipline_chronon_spark.operators.sketches import FreqSketch

    vals = [f"k{i % 40}" for i in range(4000)]
    one = FreqSketch(capacity=64).update(vals)
    a = FreqSketch(capacity=64).update(vals[:1500])
    b = FreqSketch(capacity=64).update(vals[1500:])
    m = FreqSketch.from_bytes(a.to_bytes()).merge(b)
    assert m.top_k(5) == one.top_k(5)  # exact regime: merge == replay
