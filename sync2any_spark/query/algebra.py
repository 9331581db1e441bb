"""BM25 in pure DataFrame algebra — the engine's slow/reference path.

SURVEY.md §4.3: BM25 is expressible as scan → tokenize → explode → join →
groupBy → sum → ORDER BY LIMIT k, all Catalyst built-ins. This path exists to

1. cross-check the compressed SPIMI/WAND fast path bit-for-bit, and
2. back the driver's DuckDB oracle_sql gate (same algebra in ANSI SQL).

Tokenization here is **JVM-side** (``lower`` + ``regexp_extract_all`` inside
whole-stage codegen — zero Python in the plan). tests/test_algebra.py proves
it agrees token-for-token with the canonical Python tokenizer used by the
pandas-UDF fast path (sync2any_spark.tokenize).

Formula (exact Lucene BM25Similarity, ES 7.x default — SURVEY.md §2.B B7):
    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q,d) = Σ_t idf(t) · tf / (tf + k1·(1 − b + b·dl/avgdl))
k1 = 1.2, b = 0.75, float64, ties broken by doc key ascending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import B, K1
from ..tokenize import tokenize

# Java-regex spelling of tokenize.TOKEN_RE (same codepoint ranges).
SPARK_TOKEN_RE = "[a-z0-9]+|[一-鿿぀-ヿ가-힯]"


def tokens(df: DataFrame, id_cols: list[str], text_col: str = "text") -> DataFrame:
    """(id_cols…, term) — one row per token occurrence, JVM-side."""
    return df.select(
        *id_cols,
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(SPARK_TOKEN_RE), 0)
        ).alias("term"),
    )


def doc_lengths(df: DataFrame, id_cols: list[str], text_col: str = "text") -> DataFrame:
    """(id_cols…, dl) — token count per doc, including empty docs (dl=0)."""
    return df.select(
        *id_cols,
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(SPARK_TOKEN_RE), 0)
        ).alias("dl"),
    )


def term_freqs(df: DataFrame, id_cols: list[str], text_col: str = "text") -> DataFrame:
    """(id_cols…, term, tf)."""
    return tokens(df, id_cols, text_col).groupBy(*id_cols, "term").agg(
        F.count("*").alias("tf")
    )


def term_stats(df: DataFrame, id_cols: list[str], text_col: str = "text") -> DataFrame:
    """(term, df, cf) — document frequency and collection frequency."""
    tf = term_freqs(df, id_cols, text_col)
    return tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int,
    id_cols: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Exact BM25 top-k for one query string, pure DataFrame algebra.

    Plan shape (all JVM, no Python): two aggregations over the exploded
    token stream (per-doc tf and per-term df — both map-side combined),
    one global stats aggregate, a broadcast join of the tiny query-term
    list against the tf stream (Catalyst broadcasts it automatically),
    then groupBy(doc) + ORDER BY LIMIT k (TakeOrderedAndProject).
    """
    qterms = list(dict.fromkeys(tokenize(query)))
    spark = df.sparkSession
    if not qterms:
        schema = ", ".join(f"`{c}` string" for c in id_cols)
        return spark.createDataFrame([], schema=f"{schema}, score double")

    dl = doc_lengths(df, id_cols, text_col)
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = term_freqs(df, id_cols, text_col).where(F.col("term").isin(qterms))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_cols)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            / (
                F.col("tf")
                + F.lit(K1)
                * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(*id_cols)
        .agg(F.sum("contrib").alias("score"))
    )
    order = [F.col("score").desc()] + [F.col(c).asc() for c in id_cols]
    return scored.orderBy(*order).limit(k)
