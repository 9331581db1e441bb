"""Phrase queries (match_phrase capability): algebra path + index-pruned
path, both rank-identical to the Lucene-PhraseQuery-semantics oracle."""

from __future__ import annotations

import pytest

from sync2any_spark.index.builder import build_index
from sync2any_spark.oracle import BM25Oracle
from sync2any_spark.query.phrase import phrase_topk, phrase_topk_indexed
from sync2any_spark.query.wand import IndexSearcher


@pytest.fixture(scope="module")
def corpus(spark, transcripts_sf0001):
    pdf = (
        transcripts_sf0001.orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    oracle = BM25Oracle(list(enumerate(pdf["text"])))
    key_of = {
        i: (r.conv_id, r.turn_idx) for i, r in enumerate(pdf.itertuples(index=False))
    }
    return transcripts_sf0001, oracle, key_of


@pytest.fixture(scope="module")
def phrases(corpus):
    """Real bigrams/trigram from the corpus + edge cases."""
    _, oracle, _ = corpus
    toks = next(t for t in oracle.tokens.values() if len(t) >= 10)
    bigram = f"{toks[3]} {toks[4]}"
    trigram = f"{toks[3]} {toks[4]} {toks[5]}"
    return [
        bigram,
        trigram,
        "中 文",               # CJK adjacency (from the injected spans)
        "ok ok",               # repeated-term phrase (usually rare/absent)
        "w0000 zzzzmissing",   # absent term → empty
        "status done",         # from the JSON-brace spans
    ]


def test_phrase_algebra_matches_oracle(corpus, phrases):
    df, oracle, key_of = corpus
    matched_any = 0
    for phrase in phrases:
        got = [
            ((r.conv_id, r.turn_idx), r.score)
            for r in phrase_topk(df, phrase, 10, ["conv_id", "turn_idx"]).collect()
        ]
        want = [(key_of[d], s) for d, s in oracle.phrase_topk(phrase, 10)]
        assert [g[0] for g in got] == [w[0] for w in want], phrase
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9), phrase
        matched_any += bool(want)
    assert matched_any >= 3  # the corpus-derived phrases genuinely match


@pytest.fixture(scope="module")
def index_dir(spark, transcripts_sf0001, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_phrase"))
    build_index(
        spark, transcripts_sf0001, d,
        n_partitions=8, n_buckets=8, n_salts=4, heavy_df_threshold=500,
    )
    return d


def test_phrase_indexed_matches_oracle(spark, corpus, phrases, index_dir):
    _, oracle, key_of = corpus
    searcher = IndexSearcher(spark, index_dir)
    for phrase in phrases:
        got = phrase_topk_indexed(searcher, phrase, 10)
        want = oracle.phrase_topk(phrase, 10)
        assert [key_of[g[0]] for g in got] == [key_of[w[0]] for w in want], phrase
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9), phrase
