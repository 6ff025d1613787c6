"""Properties of the training-data pipeline operators (dedup / similarity)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zipline_chronon_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup
        (3, "completely different words entirely here now"),
        (4, "spark window aggregation engine benchmark test"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(docs):
    out = {r["doc_id"]: r for r in dedup.exact_dup_groups(docs).collect()}
    assert out[0]["group_size"] == 2 and out[1]["group_size"] == 2
    assert out[1]["is_duplicate"] and not out[0]["is_duplicate"]
    assert out[1]["canonical_id"] == 0
    assert out[2]["group_size"] == 1


def test_minhash_identical_docs_identical_sig(docs):
    sigs = {r["doc_id"]: tuple(r["minhash"]) for r in dedup.minhash_signature(docs).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[3]


def test_simhash_hamming(docs):
    s = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(docs).collect()}
    assert s[0] == s[1]  # identical text -> identical simhash
    near = bin(s[0] ^ s[2]).count("1")
    far = bin(s[0] ^ s[3]).count("1")
    assert near < far  # one-word change closer than unrelated text


def test_ngram_jaccard_ordering(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] > pairs.get((0, 3), 0.0)


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_lsh_vs_brute_force(embeddings):
    brute = dedup_pairs = similarity.brute_force_topk(embeddings, k=3).toPandas()
    lsh = similarity.lsh_bucketed_topk(embeddings, k=3, n_planes=3).toPandas()
    # 1) every LSH-scored pair carries the exact cosine (same scorer)
    bmap = {(r.vec_id, r.neighbor_id): r.sim for r in brute.itertuples()}
    checked = 0
    for r in lsh.itertuples():
        if (r.vec_id, r.neighbor_id) in bmap:
            assert abs(bmap[(r.vec_id, r.neighbor_id)] - r.sim) < 1e-9
            checked += 1
    assert checked > 0
    # 2) recall@3 is meaningfully above random (3 planes -> 8 buckets)
    bset = set(zip(brute.vec_id, brute.neighbor_id))
    lset = set(zip(lsh.vec_id, lsh.neighbor_id))
    recall = len(bset & lset) / len(bset)
    n = embeddings.count()
    random_recall = 3 / (n - 1)
    assert recall > 5 * random_recall, (recall, random_recall)


def test_bpe_token_count(spark):
    """BPE-ish pretokenizer counts: contractions split off, letter/digit/
    punct runs each one token, leading spaces absorbed into the next run."""
    from zipline_chronon_spark.operators.text import bpe_token_count

    rows = [
        (0, "don't stop"),         # don | 't | _stop            -> 3
        (1, "hello world"),        # hello | _world              -> 2
        (2, "a1b2"),               # a | 1 | b | 2               -> 4
        (3, "wait... what?!"),     # wait | ... | _what | ?!     -> 4
        (4, ""),                   # empty                       -> 0
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r.doc_id: r.n for r in
           df.select("doc_id", bpe_token_count("text").alias("n")).collect()}
    assert got == {0: 3, 1: 2, 2: 4, 3: 4, 4: 0}, got


def test_ivf_vs_brute_force(embeddings):
    brute = similarity.brute_force_topk(embeddings, k=3).toPandas()
    ivf = similarity.ivf_topk(embeddings, k=3, n_cells=8, nprobe=3).toPandas()
    # 1) every IVF-scored pair carries the exact cosine (same scorer)
    bmap = {(r.vec_id, r.neighbor_id): r.sim for r in brute.itertuples()}
    checked = 0
    for r in ivf.itertuples():
        if (r.vec_id, r.neighbor_id) in bmap:
            assert abs(bmap[(r.vec_id, r.neighbor_id)] - r.sim) < 1e-9
            checked += 1
    assert checked > 0
    # 2) probing 3 of 8 cells must beat random-candidate recall clearly
    bset = set(zip(brute.vec_id, brute.neighbor_id))
    iset = set(zip(ivf.vec_id, ivf.neighbor_id))
    recall = len(bset & iset) / len(bset)
    n = embeddings.count()
    random_recall = 3 / (n - 1)
    assert recall > 5 * random_recall, (recall, random_recall)
    # 3) every vector still gets neighbors (probed cells are never empty:
    # a query's own cell is always among its nprobe nearest)
    assert ivf.vec_id.nunique() == n


def test_duplicate_groups_components(spark):
    """Connected components over a pair list: chains collapse to one
    min-labeled group, singletons label themselves, and propagation
    converges past diameter > 1 (the label must travel hops)."""
    import pandas as pd

    from zipline_chronon_spark.operators.dedup import duplicate_groups

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(10))}))
    # chain 0-1-2-3-4 (diameter 4), pair (6,7), singletons 5, 8, 9
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [0, 1, 2, 3, 6], "id_b": [1, 2, 3, 4, 7]}))
    got = {r["doc_id"]: r["group_id"]
           for r in duplicate_groups(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 6, 7: 6, 8: 8, 9: 9}


def test_duplicate_groups_adversarial_chain_and_star(spark):
    """Pins the convergence claims before anyone trusts them on a real
    pair graph (round-4 verdict #6): a long CHAIN (diameter ~= the
    iteration budget) must still produce exact labels, a giant STAR
    (diameter 2) must converge in a couple of rounds regardless of fan-out,
    and a chain LONGER than max_iters must raise, not return split
    components."""
    import pandas as pd

    from zipline_chronon_spark.operators.dedup import duplicate_groups

    # chain of 41 nodes: min-label propagation moves the 0 label one hop
    # per iteration -> needs 40 < default max_iters = 50 iterations
    n = 41
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(n))}))
    pairs = spark.createDataFrame(pd.DataFrame(
        {"id_a": list(range(n - 1)), "id_b": list(range(1, n))}))
    got = {r["doc_id"]: r["group_id"]
           for r in duplicate_groups(docs, pairs).collect()}
    assert got == {i: 0 for i in range(n)}

    # giant star: hub 0 with 500 leaves — diameter 2, must converge fast
    leaves = list(range(1, 501))
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0] + leaves}))
    pairs = spark.createDataFrame(pd.DataFrame(
        {"id_a": [0] * len(leaves), "id_b": leaves}))
    got = {r["doc_id"]: r["group_id"]
           for r in duplicate_groups(docs, pairs, max_iters=4).collect()}
    assert set(got.values()) == {0} and len(got) == 501

    # chain deeper than the cap: must raise, never silently split
    n = 8
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(n))}))
    pairs = spark.createDataFrame(pd.DataFrame(
        {"id_a": list(range(n - 1)), "id_b": list(range(1, n))}))
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_groups(docs, pairs, max_iters=3)


def test_embedding_near_dup_pairs(spark):
    """Planted near-dups (tiny perturbations of a base vector) must pair
    with the exact sequential-fold cosine; orthogonal vectors must not;
    the hot-bucket cap bounds cell cost deterministically."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=16)
    rows = []
    for i in range(4):  # cluster: 4 near-identical vectors -> same buckets
        rows.append((i, list(base + 1e-3 * rng.normal(size=16))))
    for i in range(4, 12):  # noise: random directions
        rows.append((i, list(rng.normal(size=16))))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    out = dedup.embedding_near_dup_pairs(df, threshold=0.99).toPandas()
    got = set(zip(out.id_a, out.id_b))
    want = {(a, b) for a in range(4) for b in range(a + 1, 4)}
    assert got == want, (got, want)
    # sim is the exact cosine of the double-cast vectors
    vecs = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
    for r in out.itertuples():
        a, b = vecs[r.id_a], vecs[r.id_b]
        exact = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.sim - exact) < 1e-12, (r.id_a, r.id_b, r.sim, exact)
    # hot-bucket cap: identical vectors all land in one cell; a cap of 4
    # stride-subsamples it, so pair count drops but never errors
    many = spark.createDataFrame(pd.DataFrame(
        [(i, list(base)) for i in range(40)], columns=["vec_id", "embedding"]))
    capped = dedup.embedding_near_dup_pairs(many, threshold=0.99,
                                            max_bucket=4).toPandas()
    full_pairs = 40 * 39 // 2
    assert 0 < len(capped) < full_pairs
