"""Deduplication operators for training-data pipelines — Spark-first.

All hashing is md5-based so every operator has a bit-identical DuckDB
oracle (md5 is the one hash both engines share); everything below stays in
whole-stage codegen — no Python in any plan.

Scale notes (the point of each design):
- exact: one groupBy on a 32-hex key — map-side combined, no skew beyond
  genuine duplicate mass.
- MinHash/LSH: signatures are h independent min-aggregates over the shingle
  explode (one shuffle); banding turns near-dup search from O(n²) into a
  self-join on band keys (shuffle join on short keys). Band-key groups are
  the classic skew point — a boilerplate-heavy corpus needs a band-size cap
  (``max_band_size``) which we enforce before the pair join.
- n-gram Jaccard: exact verification for candidate pairs (or small corpora)
  via shingle self-join + count algebra.
- SimHash: 32-bit signature from per-term md5 bits, weighted by tf — one
  explode + one groupBy with 32 conditional sums, all codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..query.algebra import SPARK_TOKEN_RE


def _tokens(text_col: str):
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(SPARK_TOKEN_RE), 0)


def shingles(df: DataFrame, id_col: str, text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) — distinct word n-grams (space-joined token windows)."""
    toks = _tokens(text_col)
    sh = F.when(
        F.size(toks) >= n,
        F.expr(
            f"transform(sequence(1, size(__toks) - {n - 1}), "
            f"i -> array_join(slice(__toks, i, {n}), ' '))"
        ),
    ).otherwise(F.array())
    return (
        df.withColumn("__toks", toks)
        .select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: groups with >1 member.
    Returns (text_hash, n_dups, keep_id) — keep the smallest id (the
    deterministic survivor)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3, h: int = 12
) -> DataFrame:
    """(id, h0..h{h-1}) — MinHash over word shingles; hash j of a shingle is
    md5('j:' || shingle) and the signature component is the lexicographic
    min (strings order exactly like the underlying 128-bit value)."""
    sh = shingles(df, id_col, text_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"h{j}")
        for j in range(h)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str,
    h: int = 12,
    bands: int = 4,
    max_band_size: int = 1000,
) -> DataFrame:
    """(id_a, id_b) candidate pairs sharing ≥1 LSH band (rows = h/bands).

    ``max_band_size`` drops degenerate band keys (boilerplate text) before
    the self-join — the skew guard that keeps the join from exploding on
    near-constant content at corpus scale.
    """
    rows = h // bands
    band_cols = []
    for b_i in range(bands):
        cols = [F.col(f"h{j}") for j in range(b_i * rows, (b_i + 1) * rows)]
        band_cols.append(
            F.struct(F.lit(b_i).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("key"))
        )
    exploded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    sizes = exploded.groupBy("band", "key").agg(F.count("*").alias("sz"))
    bounded = exploded.join(
        sizes.where(F.col("sz") <= max_band_size), ["band", "key"]
    )
    a = bounded.select(F.col("band"), F.col("key"), F.col(id_col).alias("id_a"))
    b = bounded.select(F.col("band"), F.col("key"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_recall(threshold: float, bands: int, rows: int) -> float:
    """P(a pair at exactly Jaccard = ``threshold`` shares ≥1 LSH band) =
    1 − (1 − t^r)^b — the standard banding S-curve. Pairs ABOVE the
    threshold are caught with higher probability; this is the worst case
    over the accepted range."""
    return 1.0 - (1.0 - threshold**rows) ** bands


def check_candidate_recall(
    threshold: float, bands: int, rows: int, min_recall: float, kind: str
) -> float:
    """Refuse propose-then-verify configurations that silently lose pairs
    (round-2 What's-wrong #4): if the banding's recall at the requested
    threshold is below ``min_recall``, raise with the actual number — the
    caller must either coarsen the banding or lower the threshold (or pass
    ``min_recall=0.0`` to explicitly accept the loss, e.g. when the corpus
    is known to contain only far-above-threshold pairs)."""
    r = lsh_recall(threshold, bands, rows)
    if r < min_recall:
        raise ValueError(
            f"{kind}: LSH banding ({bands} bands × {rows} rows) has recall "
            f"{r:.4f} at threshold {threshold} < required {min_recall} — "
            f"pairs near the threshold would be silently dropped. Use more "
            f"bands / fewer rows, raise the threshold, or pass "
            f"min_recall=0.0 to accept the loss explicitly."
        )
    return r


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    candidates: "DataFrame | None" = None,
    candidate_bands: "int | None" = None,
    candidate_rows: "int | None" = None,
    min_recall: float = 0.9,
) -> DataFrame:
    """(id_a, id_b, jaccard) — exact n-gram Jaccard ≥ threshold.

    With ``candidates`` (an (id_a, id_b) relation, e.g. from
    ``lsh_candidate_pairs``) the exact verification touches ONLY candidate
    pairs: shingles are joined per candidate side, so the work is
    O(Σ candidate-pair shingles), never the raw shingle self-join. This is
    the scale shape — MinHash banding proposes, exact Jaccard disposes.
    Recall guard: pass the banding that produced the candidates
    (``candidate_bands``/``candidate_rows``) and the call REFUSES
    configurations whose recall at ``threshold`` is below ``min_recall``
    (round-2 What's-wrong #4: threshold 0.2 over 4×3 banding has ~3%
    recall — silently wrong); omitting the banding warns that recall is
    unverifiable. Without ``candidates`` the raw self-join runs (exact,
    kept as the small-corpus / test-oracle form).
    """
    if candidates is not None:
        if candidate_bands is not None and candidate_rows is not None:
            check_candidate_recall(
                threshold, candidate_bands, candidate_rows, min_recall,
                "ngram_jaccard_pairs",
            )
        else:
            import warnings

            warnings.warn(
                "ngram_jaccard_pairs: candidates given without "
                "candidate_bands/candidate_rows — recall at the requested "
                "threshold cannot be verified; pairs may be silently missing",
                stacklevel=2,
            )
    sh = shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    if candidates is not None:
        sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
        sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            candidates.join(sh_a, "id_a")
            .join(sh_b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        a = sh.select(F.col(id_col).alias("id_a"), "shingle")
        b = sh.select(F.col(id_col).alias("id_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str = "text", bits: int = 32) -> DataFrame:
    """(id, simhash) — tf-weighted sign aggregation of per-term md5 bits."""
    toks = _tokens(text_col)
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    hv = F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
    tf = tf.withColumn("hv", hv)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("hv"), j).bitwiseAND(1) == 1, F.col("tf"))
            .otherwise(-F.col("tf"))
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    agg = tf.groupBy(id_col).agg(*bit_sums)
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select(F.col(id_col), sig.cast("long").alias("simhash"))
