"""Similarity search over embedding columns (array<float>).

Two paths:
 - brute_force_topk: exact cosine top-k. Compute shape = block matmul:
   the query block rides mapInPandas (Arrow → numpy), the corpus is a
   broadcast float64 matrix; each task does one GEMM + argpartition. At
   100 TB this is the per-shard exact scorer (corpus shards broadcast
   per executor, queries streamed).
 - lsh_bucketed_topk: random-hyperplane LSH (deterministic seed) assigns
   each vector to sign-pattern buckets; candidates scored only within
   bucket — the sub-linear scale path (recall measured in pytest vs brute
   force).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized_matrix(pdf_vecs: pd.Series) -> np.ndarray:
    m = np.stack(pdf_vecs.to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact cosine top-k neighbors per vector (self excluded), ties broken
    by neighbor id ascending. Returns (vec_id, neighbor_id, rank, sim)."""
    spark = df.sparkSession
    corpus = df.select(id_col, vec_col).toPandas()
    ids = corpus[id_col].to_numpy(dtype=np.int64)
    mat = _normalized_matrix(corpus[vec_col])
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def score(batches):
        c_ids, c_mat = b_ids.value, b_mat.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = _normalized_matrix(pdf[vec_col])
            sims = q @ c_mat.T  # GEMM: the whole batch scored at once
            out_rows = []
            for i in range(len(q_ids)):
                s = sims[i]
                # order by (-sim, neighbor_id), excluding self
                mask = c_ids != q_ids[i]
                cand_ids = c_ids[mask]
                cand_s = s[mask]
                top = np.lexsort((cand_ids, -cand_s))[:k]
                for r, j in enumerate(top):
                    out_rows.append((int(q_ids[i]), int(cand_ids[j]), r + 1, float(cand_s[j])))
            yield pd.DataFrame(out_rows, columns=[id_col, "neighbor_id", "rank", "sim"])

    return df.select(id_col, vec_col).mapInPandas(
        score, schema=f"{id_col} long, neighbor_id long, rank int, sim double"
    )


def hyperplane_signs(vec_col: str, n_planes: int, dim: int, seed: int = 7) -> F.Column:
    """Deterministic random-hyperplane sign pattern as an int bucket id.
    Plane weights derive from a seeded numpy RNG (embedded as literals)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bits = []
    for p_i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(w)) for w in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, w: x.cast("double") * w),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << p_i)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket.cast("long")


def lsh_bucketed_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: score only within each hyperplane-sign bucket.
    Scale path: shuffle keyed by bucket, cost sum(bucket^2) << n^2.
    Recall vs brute force is property-tested; rank/sim semantics match."""
    dim = len(df.select(vec_col).first()[0])
    with_b = df.select(id_col, vec_col).withColumn(
        "bucket", hyperplane_signs(vec_col, n_planes, dim, seed))

    def score(key, pdf):
        if len(pdf) < 2:
            return pd.DataFrame(columns=[id_col, "neighbor_id", "rank", "sim"])
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        m = _normalized_matrix(pdf[vec_col])
        sims = m @ m.T
        rows = []
        for i in range(len(ids)):
            mask = np.arange(len(ids)) != i
            cand_ids, cand_s = ids[mask], sims[i][mask]
            top = np.lexsort((cand_ids, -cand_s))[:k]
            for r, j in enumerate(top):
                rows.append((int(ids[i]), int(cand_ids[j]), r + 1, float(cand_s[j])))
        return pd.DataFrame(rows, columns=[id_col, "neighbor_id", "rank", "sim"])

    return with_b.groupBy("bucket").applyInPandas(
        score, schema=f"{id_col} long, neighbor_id long, rank int, sim double"
    )
