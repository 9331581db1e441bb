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


def rp_lsh_band_keys(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    bands: int = 128,
    rows_per_band: int = 12,
    seed: int = 7,
) -> DataFrame:
    """(id, band, key) — banded sign-LSH over random hyperplanes.

    bands × rows_per_band planes; band key = the rows_per_band sign bits
    packed into an int64. Computed as ONE numpy matmul per Arrow batch
    (mapInPandas) — at 1536 planes the per-plane JVM-expression spelling of
    ``rp_lsh_buckets`` would blow up codegen, while the matrix kernel is a
    single BLAS call. Planes are a pure function of (seed, dim): every
    executor regenerates them identically, nothing is shipped.
    """
    n_planes = bands * rows_per_band
    import pandas as pd

    def kern(batches):
        planes = _planes(dim, n_planes, seed)
        weights = 1 << np.arange(rows_per_band, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ planes.T) > 0  # n × (bands·rows)
            keys = bits.reshape(len(pdf), bands, rows_per_band) @ weights
            ids = np.repeat(pdf[id_col].to_numpy(), bands)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "band": np.tile(np.arange(bands, dtype=np.int32), len(pdf)),
                    "key": keys.reshape(-1).astype(np.int64),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        kern, schema="id long, band int, key long"
    ).withColumnRenamed("id", id_col)


def neardup_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.9,
    bands: int = 128,
    rows_per_band: int = 12,
    seed: int = 7,
    max_band_size: int = 10_000,
    min_recall: float = 0.9,
) -> DataFrame:
    """(id_a, id_b, cos) near-duplicate pairs ≥ threshold — the scale shape:
    banded LSH proposes candidate pairs (join on (band, key), skew-capped
    like the MinHash path), exact cosine disposes. No crossJoin anywhere.

    Recall is 1-(1-p^r)^b with p = 1-θ/π; at real near-dup thresholds
    (cos ≥ 0.85) the default 128×12 gives recall ≈ 1. Recall guard
    (round-2 What's-wrong #4): the call REFUSES (threshold, bands, rows)
    combinations whose recall falls below ``min_recall`` — pass
    ``min_recall=0.0`` to accept the loss explicitly. The exact crossJoin
    form (``neardup_pairs``) is retained as the test oracle, and tests
    assert equality on the reference dataset.
    """
    import math

    p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    recall = 1.0 - (1.0 - p**rows_per_band) ** bands
    if recall < min_recall:
        raise ValueError(
            f"neardup_pairs_lsh: sign-LSH ({bands} bands × {rows_per_band} "
            f"rows) has recall {recall:.4f} at cos ≥ {threshold} < required "
            f"{min_recall} — use more bands / fewer rows per band, raise "
            f"the threshold, or pass min_recall=0.0 to accept the loss."
        )
    keys = rp_lsh_band_keys(df, id_col, vec_col, dim, bands, rows_per_band, seed)
    sizes = keys.groupBy("band", "key").agg(F.count("*").alias("sz"))
    bounded = keys.join(
        sizes.where(F.col("sz") <= max_band_size), ["band", "key"]
    )
    a = bounded.select("band", "key", F.col(id_col).alias("id_a"))
    b = bounded.select("band", "key", F.col(id_col).alias("id_b"))
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", F.round(cos, 6))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


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


def ivf_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_centroids: int = 16,
    n_iters: int = 5,
    seed: int = 11,
) -> np.ndarray:
    """IVF coarse quantizer: Lloyd's k-means over the embedding column.

    Iterative-algorithm shape done Spark-first: assignment is a vectorized
    ``mapInPandas`` matrix multiply (Arrow batch × centroid matrix — never
    per-row Python), the update step is a per-cluster pandas mean, and only
    the C×dim centroid matrix moves through the driver between iterations
    (broadcast into the next assignment's closure). Init is a seeded sample
    (deterministic given the data)."""
    sample = (
        df.select(id_col, vec_col)
        .orderBy(F.pmod(F.xxhash64(id_col), F.lit(997)), F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    centroids = np.array([list(r[1]) for r in sample], dtype=np.float64)

    for _ in range(n_iters):
        cents = centroids  # closure copy for this iteration

        def assign(batches):
            import pandas as pd

            for pdf in batches:
                mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                # cosine assignment: normalize then argmax dot
                mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
                cn = cents / np.maximum(
                    np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
                )
                cl = np.argmax(mn @ cn.T, axis=1)
                yield pd.DataFrame({"cluster": cl.astype(np.int32), "vec": list(mat)})

        assigned = df.select(id_col, vec_col).mapInPandas(
            assign, schema="cluster int, vec array<double>"
        )

        def mean_of(key, pdf):
            import pandas as pd

            m = np.stack(pdf["vec"].to_numpy()).mean(axis=0)
            return pd.DataFrame({"cluster": [int(key[0])], "centroid": [list(m)]})

        rows = (
            assigned.groupBy("cluster")
            .applyInPandas(mean_of, schema="cluster int, centroid array<double>")
            .collect()
        )
        new = centroids.copy()  # empty clusters keep their previous centroid
        for r in rows:
            new[r.cluster] = np.array(r.centroid)
        centroids = new
    return centroids


def ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray
) -> DataFrame:
    """(id, cluster) under the fitted coarse quantizer."""
    cents = centroids

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
            cl = np.argmax(mn @ cn.T, axis=1)
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(), "cluster": cl.astype(np.int32)})

    import pandas as pd  # noqa: F401  (kernel import, kept local above)

    return df.mapInPandas(assign, schema="id long, cluster int").withColumnRenamed(
        "id", id_col
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: "list[float]",
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """ANN top-k: score only the rows whose IVF cell is among the query's
    ``n_probe`` nearest centroids — at scale the assignment is precomputed
    and the posting-list-per-cell layout prunes the scan exactly like the
    term buckets do."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = qv / max(np.linalg.norm(qv), 1e-12)
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    # stable sort → ties broken by lowest centroid id, matching the SQL
    # oracle's (cos DESC, cid ASC)
    probes = np.argsort(-(cn @ qn), kind="stable")[:n_probe].tolist()
    assigned = ivf_assign(df, id_col, vec_col, centroids)
    cand = df.join(
        assigned.where(F.col("cluster").isin(probes)).select(id_col),
        id_col,
        "left_semi",
    )
    return cosine_topk(cand, id_col, vec_col, query_vec, k)


def ivf_fit_sample(
    vectors: np.ndarray, n_centroids: int = 8, n_iters: int = 4
) -> np.ndarray:
    """Deterministic pure-numpy Lloyd k-means over a driver-side sample —
    the standard way an IVF coarse quantizer is fitted at corpus scale
    (fit on a bounded sample, assign the full corpus distributed via
    ``ivf_assign``). Init = the first ``n_centroids`` sample rows (callers
    pass vectors in a deterministic order, e.g. sorted by id); assignment
    is cosine argmax with first-max (lowest centroid) tie-break; an empty
    cluster keeps its previous centroid — the same rules as the
    distributed ``ivf_fit``, so both quantizers are interchangeable. Being
    a pure function of the sample bytes, a SQL oracle can carry the fitted
    centroids as literals and replay the whole ANN search exactly
    (``ann_ivf_kmeans`` contract row)."""
    vecs = np.asarray(vectors, dtype=np.float64)
    centroids = vecs[:n_centroids].copy()
    vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    for _ in range(n_iters):
        cn = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
        cl = np.argmax(vn @ cn.T, axis=1)
        new = centroids.copy()
        for c in range(n_centroids):
            members = vecs[cl == c]
            if len(members):
                new[c] = members.mean(axis=0)
        centroids = new
    return centroids


def ivf_topk_flat(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: "list[float]",
    n_centroids: int = 8,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """IVF ANN with a deterministic flat quantizer: centroids are the
    ``n_centroids`` lowest-id vectors — a pure function of the data that a
    SQL oracle can recompute verbatim (the contract-gate variant; the
    kmeans-fitted quantizer is ``ivf_fit``/``ivf_topk``, recall-tested in
    pytest)."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    centroids = np.array([list(r[1]) for r in rows], dtype=np.float64)
    return ivf_topk(df, id_col, vec_col, query_vec, centroids, k, n_probe)


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
