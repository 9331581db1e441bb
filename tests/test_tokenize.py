"""Tokenizer goldens (SURVEY.md §5.2(1)): CJK, punctuation, empty, parity."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sync2any_spark.tokenize import DUCKDB_TOKEN_RE, tokenize, tokenize_series

GOLDEN = [
    ("Hello, World!", ["hello", "world"]),
    ("a  b\tc\nd", ["a", "b", "c", "d"]),
    ("中文测试", ["中", "文", "测", "试"]),
    ('{"status": "done", "n": 42}', ["status", "done", "n", "42"]),
    ("", []),
    (None, []),
    ("UPPER lower MiXeD", ["upper", "lower", "mixed"]),
    ("café", ["caf"]),  # accented letter is a separator (pinned behavior)
    ("x1y2z3", ["x1y2z3"]),
    ("こんにちは world", ["こ", "ん", "に", "ち", "は", "world"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden(text, expected):
    assert tokenize(text) == expected


def test_series_matches_scalar():
    texts = pd.Series([t for t, _ in GOLDEN])
    assert tokenize_series(texts) == [e for _, e in GOLDEN]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_duckdb_parity(text):
    """The DuckDB RE2 spelling must tokenize identically to Python —
    this is what makes the driver's oracle_sql gate meaningful."""
    py = tokenize(text)
    dd = duckdb.sql(
        "select regexp_extract_all(lower(?), ?)", params=[text, DUCKDB_TOKEN_RE]
    ).fetchone()[0]
    assert py == dd
