"""Deduplication operators for training-data pipelines.

Five families, each scale-shaped for 100 TB (documented per function):
 - exact:      hash-groupBy on md5(text) — one shuffle on the hash
 - ngram Jaccard: explode distinct shingles → self-join on shingle →
                count-share / union — exact pairwise, bounded by shared
                shingles (the exactness baseline for LSH)
 - MinHash:    k independent permutations approximated by md5(i || shingle);
               signature is k lexicographic mins — embarrassingly parallel
 - MinHash LSH: band the signature, group by band value → candidate pairs
               only within buckets (the 100 TB path: no all-pairs)
 - SimHash:    64-bit sign-aggregated token hashes (near-dup by hamming)

Determinism: every hash is md5 (standardized), so the DuckDB oracle can
replay signatures and pairs bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zipline_chronon_spark.operators.text import char_ngrams


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per doc: content hash, size of its exact-duplicate group, canonical
    (min id) representative. Scale: one shuffle keyed by the 128-bit hash."""
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
    groups = h.groupBy("content_hash").agg(
        F.count(F.lit(1)).alias("group_size"), F.min(id_col).alias("canonical_id")
    )
    return h.join(groups, "content_hash").select(
        id_col, "content_hash", "group_size", "canonical_id",
        (F.col(id_col) != F.col("canonical_id")).alias("is_duplicate"),
    )


def distinct_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(char_ngrams(text_col, n))).alias("shingle"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    df_cap: float | None = None,
) -> DataFrame:
    """Exact pairwise Jaccard over distinct char n-grams, emitted for pairs
    sharing >= 1 shingle and J >= threshold, id_a < id_b.

    Scale: the self-join is keyed by shingle — cost is sum over shingles of
    (docs-per-shingle)^2, i.e. proportional to true near-dup density, not
    |docs|^2. ``df_cap`` drops shingles whose document frequency exceeds
    that fraction of the corpus (stopword shingles dominate the self-join
    and carry no near-dup signal) — the standard cost knob; None = exact
    semantics. LSH (below) is the sub-linear path."""
    sh = distinct_shingles(df, id_col, text_col, n)
    if df_cap is not None:
        n_docs = df.count()
        hot = (sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
               .where(F.col("df") > n_docs * df_cap).select("shingle"))
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
        .withColumn("jaccard", F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """k-permutation MinHash: permutation i is md5(i:shingle); the signature
    element is the lexicographic min. Per-row map-only — no shuffle."""
    grams = F.array_distinct(char_ngrams(text_col, n))

    def perm_min(i: int) -> F.Column:
        prefix = f"{i}:"
        # NB: single-arg lambda only — pyspark binds a second lambda arg to
        # the array INDEX, which would shadow the permutation id
        return F.array_min(F.transform(grams, lambda g: F.md5(F.concat(F.lit(prefix), g))))

    sig = F.array(*[perm_min(i) for i in range(num_hashes)])
    return df.select(F.col(id_col), sig.alias("minhash"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """LSH candidate pairs: signature split into bands of ``band_size``;
    docs sharing any full band collide. Distinct (id_a < id_b) pairs.

    Scale: groupBy(band_key) — candidates generated per bucket only; with
    b bands of r rows, collision prob = 1-(1-J^r)^b (tunable knee)."""
    sig = minhash_signature(df, id_col, text_col, n, num_hashes)
    bands = sig.select(
        id_col,
        F.explode(F.array(*[
            F.concat_ws("|", F.lit(str(bi)),
                        *[F.col("minhash")[bi * band_size + j] for j in range(band_size)])
            for bi in range(num_hashes // band_size)
        ])).alias("band_key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens: bit j of the hash is the sign
    of sum over tokens of (bit j of xxhash64(token)). Map-only.

    Near-dup = small hamming distance between simhash values (pytest covers
    the property; pairing is a bit_count(a ^ b) <= t self-join)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # bit masks must be literals (shift-by-column is unsupported); bit 63 is
    # the sign bit in two's complement
    masks = [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]
    # per token: xxhash64 -> for each bit, +1/-1; aggregate componentwise
    bit_votes = F.aggregate(
        toks,
        F.array(*[F.lit(0).cast("long") for _ in range(64)]),
        lambda acc, t: F.zip_with(
            acc,
            F.array(*[
                F.when(F.xxhash64(t).bitwiseAND(F.lit(m)) != 0, F.lit(1))
                .otherwise(F.lit(-1)).cast("long")
                for m in masks
            ]),
            lambda x, y: x + y,
        ),
    )
    # materialize votes once (a projection boundary so the 64 bit reads
    # don't each re-inline the whole token aggregate)
    voted = df.select(F.col(id_col), bit_votes.alias("__votes"))
    sim = F.lit(0).cast("long")
    for j, m in enumerate(masks):
        sim = sim.bitwiseOR(
            F.when(F.element_at("__votes", j + 1) > 0, F.lit(m)).otherwise(F.lit(0)).cast("long")
        )
    return voted.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       max_hamming: int = 8) -> DataFrame:
    """All pairs with hamming(simhash_a, simhash_b) <= max_hamming. Bucketed
    by the top 16 bits first (scale path: near-dups almost always share the
    high band; exactness traded for no all-pairs join)."""
    s = simhash64(df, id_col, text_col).withColumn(
        "band", F.shiftright("simhash", 48))
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .withColumn("hamming", F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))))
        .where(F.col("hamming") <= max_hamming)
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"), "hamming")
    )
