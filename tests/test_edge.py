"""Degenerate-corpus hardening: single doc, all-empty texts, one token."""

from __future__ import annotations

import datetime

import pytest

from sync2any_spark.index.builder import build_index
from sync2any_spark.oracle import BM25Oracle
from sync2any_spark.query import algebra
from sync2any_spark.query.wand import IndexSearcher

TS = datetime.datetime(2026, 1, 1)
SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def _build(spark, rows, tmp_path):
    df = spark.createDataFrame(rows, SCHEMA)
    d = str(tmp_path)
    build_index(spark, df, d, n_partitions=4, n_buckets=4, n_salts=2,
                heavy_df_threshold=10)
    return df, d


def test_single_doc_corpus(spark, tmp_path):
    df, d = _build(spark, [("c1", 0, "user", "hello world hello", "", TS)], tmp_path)
    s = IndexSearcher(spark, d)
    oracle = BM25Oracle([(0, "hello world hello")])
    for q in ["hello", "world", "missing"]:
        got = s.search(q, 10)
        want = oracle.topk(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)


def test_all_empty_texts(spark, tmp_path):
    rows = [("c1", i, "user", "", "", TS) for i in range(5)]
    df, d = _build(spark, rows, tmp_path)
    s = IndexSearcher(spark, d)
    assert s.n_docs == 5 and s.avgdl == 0.0
    assert s.search("anything", 10) == []
    # algebra path agrees
    assert algebra.bm25_topk(df, "anything", 10, ["conv_id", "turn_idx"]).count() == 0


def test_mixed_empty_and_real(spark, tmp_path):
    rows = [
        ("c1", 0, "user", "", "", TS),
        ("c1", 1, "user", "alpha beta", "", TS),
        ("c2", 0, "user", "alpha", "", TS),
    ]
    df, d = _build(spark, rows, tmp_path)
    s = IndexSearcher(spark, d)
    pdf = df.orderBy("conv_id", "turn_idx").toPandas()
    oracle = BM25Oracle(list(enumerate(pdf["text"])))
    for q in ["alpha", "beta", "alpha beta"]:
        got = s.search(q, 10)
        want = oracle.topk(q, 10)
        assert [g[0] for g in got] == [w[0] for w in want], q


def test_identical_docs_tiebreak(spark, tmp_path):
    rows = [(f"c{i}", 0, "user", "same text here", "", TS) for i in range(6)]
    df, d = _build(spark, rows, tmp_path)
    s = IndexSearcher(spark, d)
    got = s.search("same", 3)
    # perfect ties → lowest doc ids win, ascending
    assert [g[0] for g in got] == [0, 1, 2]
    bmw = s.search("same", 3, engine="bmw")
    assert bmw == got
