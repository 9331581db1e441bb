"""Corpus generator invariants (FIXTURES.md F1/F2)."""

from __future__ import annotations

import numpy as np

from sync2any_spark.generator import generate_queries, generate_transcripts
from sync2any_spark.tokenize import tokenize


def test_deterministic():
    a = generate_transcripts("sf0.001")
    b = generate_transcripts("sf0.001")
    assert a.equals(b)


def test_schema_and_pk():
    t = generate_transcripts("sf0.001").to_pandas()
    assert list(t.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # composite PK unique (reference mandatory-PK contract)
    assert not t.duplicated(["conv_id", "turn_idx"]).any()
    # ts strictly increasing within conversation
    for _, g in t.groupby("conv_id"):
        assert g.sort_values("turn_idx")["ts"].is_monotonic_increasing


def test_skew_and_edges():
    t = generate_transcripts("sf0.001").to_pandas()
    has_hot = t["text"].str.contains(r"\bok\b", regex=True).mean()
    assert 0.2 < has_hot < 0.4  # pathological term in ~30% of turns
    assert (t["text"] == "").sum() > 0  # empties
    assert t["text"].str.contains("中文").any()  # CJK spans
    sizes = t.groupby("conv_id").size()
    assert sizes.min() == 1 and sizes.max() == 500  # edge conversations


def test_queries_cover_cases():
    q = generate_queries().to_pandas()
    assert len(q) == 50
    assert q["query_id"].is_unique
    assert (q["k"].isin([1, 10, 100])).all()
    assert (q["query_text"] == "ok").any()
    assert (q["query_text"] == "zzzzmissing").any()
    assert any("中" in s for s in q["query_text"])
    assert all(len(tokenize(s)) >= 1 for s in q["query_text"])


def test_turn_lengths():
    t = generate_transcripts("sf0.001").to_pandas()
    dls = np.array([len(tokenize(s)) for s in t["text"]])
    assert dls.max() <= 140 and (dls > 0).mean() > 0.98
