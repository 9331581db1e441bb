"""Canonical analyzer — the engine's analog of ES's ``standard`` analyzer.

The reference creates every text column with the ``standard`` analyzer for
both index and search (``load/impl/EsLoadServiceImpl.java:249-258``). The
standard analyzer does Unicode word segmentation + lowercase; for CJK it
emits one token per ideograph. We pin a deterministic, regex-definable
subset of that behavior so the exact same tokenization is computable in

1. Python (this module — used by the pandas UDFs AND the pytest oracle), and
2. DuckDB RE2 (``DUCKDB_TOKEN_RE`` — used by the driver's oracle_sql gate),

guaranteeing bit-identical df/tf/BM25 statistics across engine and oracle.

Token = maximal run of ``[a-z0-9]`` over the lowercased text, or a single
CJK/kana/hangul codepoint. Everything else is a separator. Accented Latin
letters act as separators in both engines (Python ``str.lower`` and DuckDB
``lower`` agree on the characters this pattern keeps).
"""

from __future__ import annotations

import re

# Python (re) and DuckDB (RE2) spellings of the same token pattern.
_CJK = "一-鿿぀-ヿ가-힯"
TOKEN_RE = re.compile(rf"[a-z0-9]+|[{_CJK}]")
DUCKDB_TOKEN_RE = (
    r"[a-z0-9]+|[\x{4e00}-\x{9fff}\x{3040}-\x{30ff}\x{ac00}-\x{d7af}]"
)


def tokenize(text: str | None) -> list[str]:
    """Analyze one text into its token list (duplicates preserved, in order)."""
    if not text:
        return []
    return TOKEN_RE.findall(text.lower())


def tokenize_series(texts) -> "list[list[str]]":
    """Vectorized-batch form used inside Arrow/pandas UDFs.

    Accepts a pandas Series of strings (possibly with None), returns a list
    of token lists. The per-element regex runs inside one Arrow batch — this
    is the engine's only Python-side text work (SURVEY.md §2.B B1).
    """
    findall = TOKEN_RE.findall
    return [findall(t.lower()) if t else [] for t in texts]
