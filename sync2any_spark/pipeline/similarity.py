"""Similarity search over embedding columns (array<float>).

- ``cosine_topk`` — brute-force exact baseline: JVM-side ``zip_with`` +
  ``aggregate`` dot products (no Python), ORDER BY LIMIT k
  (TakeOrderedAndProject — no global sort).
- ``rp_lsh_buckets`` / ``rp_lsh_topk`` — the scale path: deterministic
  random-hyperplane LSH. Planes are a pure function of (seed, dim), so the
  bucketing is reproducible across runs/executors; candidates come from the
  query's bucket (plus multiprobe neighbors), scored exactly. Recall vs the
  brute-force baseline is asserted in tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_scores(df: DataFrame, id_col: str, vec_col: str, query_vec: list[float]) -> DataFrame:
    """(id, cos) for every row vs a literal query vector — exact, JVM-side."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    return df.select(F.col(id_col), F.round(cos, 6).alias("cos"))


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Brute-force exact top-k by cosine (ties broken by id asc)."""
    return (
        cosine_scores(df, id_col, vec_col, query_vec)
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """(id_a, id_b, cos) embedding near-duplicate pairs above threshold.
    O(n²) cross form — at scale, feed LSH candidate pairs instead."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cos, 6))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def _planes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def rp_lsh_buckets(
    df: DataFrame, id_col: str, vec_col: str, dim: int, n_planes: int = 12, seed: int = 7
) -> DataFrame:
    """(id, bucket) — sign pattern vs n_planes fixed hyperplanes.

    The plane matrix is a broadcast literal folded into the plan: bucket =
    Σ_j (dot(v, plane_j) > 0) << j, all JVM expressions.
    """
    planes = _planes(dim, n_planes, seed)
    bucket = None
    for j in range(n_planes):
        pj = F.array(*[F.lit(float(x)) for x in planes[j]])
        bit = F.when(_dot(F.col(vec_col), pj) > 0, F.lit(2**j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.select(F.col(id_col), bucket.cast("long").alias("bucket"))


def rp_lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 7,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN top-k: score only rows whose bucket is within ``multiprobe``
    bit-flips of the query's bucket (Hamming-ball multiprobe), exactly."""
    planes = _planes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbits = (planes @ qv > 0).astype(np.int64)
    qbucket = int((qbits << np.arange(n_planes)).sum())
    probes = {qbucket}
    if multiprobe >= 1:
        for j in range(n_planes):
            probes.add(qbucket ^ (1 << j))
    if multiprobe >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qbucket ^ (1 << i) ^ (1 << j))
    buckets = rp_lsh_buckets(df, id_col, vec_col, dim, n_planes, seed)
    cand = df.join(
        buckets.where(F.col("bucket").isin(sorted(probes))).select(id_col),
        id_col,
        "left_semi",
    )
    return cosine_topk(cand, id_col, vec_col, query_vec, k)
