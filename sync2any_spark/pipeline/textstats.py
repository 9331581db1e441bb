"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure DataFrame algebra (codegen, SQL-oracle-able).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..query.algebra import SPARK_TOKEN_RE

# tiny per-language stopword profiles for the n-gram/stopword heuristic;
# deliberately short and fixed so the oracle SQL can inline them
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une", "dans", "que"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic tie-break


def _tokens(text_col: str):
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(SPARK_TOKEN_RE), 0)


def token_counts(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(id, n_ws_tokens, n_tokens) — whitespace split vs analyzer tokens."""
    ws = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    )
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("n_ws_tokens"),
        F.size(_tokens(text_col)).cast("long").alias("n_tokens"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars, punct_ratio, stopword_ratio, digit_ratio,
    quality) — length/punctuation/stopword heuristics.

    quality = clamp01(n_tokens/100)·0.4 + stopword_ratio·0.4 + (1−punct_ratio)·0.2
    (a fixed, documented formula — the value is the *pipeline op*, not the
    constants)."""
    toks = _tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"), 0)
    )
    sw = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(sw)))
    n_digit = F.size(F.regexp_extract_all(F.col(text_col), F.lit("[0-9]"), 0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0))
    quality = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.4
        + (F.lit(1.0) - punct_ratio) * 0.2
    )
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(id, lang_pred) — stopword-profile argmax with deterministic
    tie-break (LANG_ORDER, then 'und' when no profile matches)."""
    toks = _tokens(text_col)
    out = df.select(F.col(id_col), toks.alias("__toks"))
    for lang in LANG_ORDER:
        sw = STOPWORDS[lang]
        out = out.withColumn(
            f"__n_{lang}", F.size(F.filter(F.col("__toks"), lambda t: t.isin(sw)))
        )
    best = F.lit("und")
    best_n = F.lit(0)
    # LANG_ORDER processing with strict '>' ⇒ earlier languages win ties
    for lang in LANG_ORDER:
        n = F.col(f"__n_{lang}")
        take = n > best_n
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_n = F.when(take, n).otherwise(best_n)
    return out.select(F.col(id_col), best.alias("lang_pred"))


def fingerprints(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 3, w: int = 4
) -> DataFrame:
    """(id, fp) — winnowing: k-gram shingle hashes, minimum per sliding
    window of w, distinct mins = the document fingerprint set
    (Schleimer/Wilkerson/Aiken MOSS scheme, public)."""
    toks = _tokens(text_col)
    sh = F.when(
        F.size(toks) >= k,
        F.expr(
            f"transform(sequence(1, size(__toks) - {k - 1}), "
            f"i -> array_join(slice(__toks, i, {k}), ' '))"
        ),
    ).otherwise(F.array())
    pos = (
        df.withColumn("__toks", toks)
        .select(F.col(id_col), F.posexplode(sh).alias("pos", "shingle"))
        .withColumn(
            "hv", F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
        )
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        pos.withColumn("fp", F.min("hv").over(win))
        .select(F.col(id_col), "fp")
        .distinct()
    )
