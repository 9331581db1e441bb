"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure DataFrame algebra (codegen, SQL-oracle-able).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..query.algebra import SPARK_TOKEN_RE

# per-language function-word profiles (fixed literals so the oracle SQL can
# inline them; ~40 of the highest-frequency function words each — the
# classic stopword-profile vote, script detection handles non-Latin)
STOPWORDS = {
    "en": [
        "the", "and", "of", "to", "a", "in", "is", "it", "you", "that",
        "was", "for", "on", "are", "with", "as", "his", "they", "be", "at",
        "have", "this", "from", "or", "had", "by", "not", "but", "what",
        "were", "we", "when", "your", "can", "there", "an", "which", "their",
        "if", "will",
    ],
    "es": [
        "el", "la", "de", "que", "y", "en", "un", "los", "se", "no",
        "por", "con", "una", "su", "para", "es", "las", "lo", "como", "del",
        "al", "le", "mas", "pero", "sus", "me", "hay", "fue", "este", "ha",
        "si", "porque", "esta", "entre", "cuando", "muy", "sobre", "tambien",
        "hasta", "donde",
    ],
    "de": [
        "der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu",
        "den", "von", "sie", "im", "dem", "auf", "auch", "es", "an", "als",
        "nach", "wie", "eine", "aber", "aus", "bei", "er", "hat", "wenn",
        "nur", "war", "noch", "werden", "einer", "um", "am", "sind", "oder",
        "wird", "sein", "einen",
    ],
    "fr": [
        "le", "la", "et", "les", "des", "est", "pas", "une", "dans", "que",
        "en", "du", "pour", "qui", "sur", "se", "plus", "ne", "par", "il",
        "au", "avec", "son", "ce", "mais", "ou", "nous", "comme", "ses",
        "sont", "aux", "cette", "ont", "tout", "fait", "elle", "deux",
        "entre", "sans", "leur",
    ],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic tie-break

# unicode script ranges — the SAME ranges the analyzer pins (tokenize.py),
# with proven-identical Spark/Python and DuckDB-RE2 spellings
SCRIPT_RE = {
    "han": ("[一-鿿]", r"[\x{4e00}-\x{9fff}]"),
    "kana": ("[぀-ヿ]", r"[\x{3040}-\x{30ff}]"),
    "hangul": ("[가-힯]", r"[\x{ac00}-\x{d7af}]"),
}


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
    sw = STOPWORDS["en"][:10]  # quality uses the short core list (fixed)
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
    """(id, lang_pred) — two-stage language ID, all codegen:

    1. **script detection** (decisive for non-Latin scripts): any kana →
       'ja' (kana is unique to Japanese); else any hangul → 'ko'; else any
       Han ideograph → 'zh' (Han without kana reads as Chinese — the
       standard script-first heuristic);
    2. **function-word profile vote** over ~40 stopwords per Latin language
       (en/es/de/fr), deterministic tie-break by LANG_ORDER, 'und' when no
       profile matches.

    Every branch is SQL-expressible, so the DuckDB oracle replays the exact
    decision procedure."""
    toks = _tokens(text_col)
    out = df.select(F.col(id_col), F.col(text_col).alias("__text"), toks.alias("__toks"))
    for name, (spark_re, _duck_re) in SCRIPT_RE.items():
        out = out.withColumn(
            f"__s_{name}",
            F.size(F.regexp_extract_all(F.col("__text"), F.lit(spark_re), 0)),
        )
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
    pred = (
        F.when(F.col("__s_kana") > 0, F.lit("ja"))
        .when(F.col("__s_hangul") > 0, F.lit("ko"))
        .when(F.col("__s_han") > 0, F.lit("zh"))
        .otherwise(best)
    )
    return out.select(F.col(id_col), pred.alias("lang_pred"))


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
