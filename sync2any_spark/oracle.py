"""Pure-Python/numpy BM25 oracle — ground truth for every engine path.

Implements the exact Lucene BM25Similarity formula the reference's ES 7.x
target uses by default on ``standard``-analyzed text fields
(``load/impl/EsLoadServiceImpl.java:249-258``; SURVEY.md §2.B B7):

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q,d) = Σ_t idf(t) · tf / (tf + k1 · (1 - b + b·dl/avgdl))

with k1=1.2, b=0.75, float64, ties broken by doc_id ascending. Unlike real
Lucene we do NOT quantize dl into a 1-byte norm (SURVEY.md §7.3) — the
engine and this oracle share the exact formula bit-for-bit.

The oracle is deliberately single-node and dictionary-based: it exists to
check the distributed paths, not to be fast.
"""

from __future__ import annotations

import math
from collections import Counter

from .tokenize import tokenize

K1 = 1.2
B = 0.75


class BM25Oracle:
    def __init__(self, docs: "list[tuple[int, str]]") -> None:
        """docs: [(doc_id, text)] — doc_id dense, any order."""
        self.dl: dict[int, int] = {}
        self.postings: dict[str, dict[int, int]] = {}
        self.tokens: dict[int, list[str]] = {}
        for doc_id, text in docs:
            toks = tokenize(text)
            self.tokens[doc_id] = toks
            self.dl[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(self.dl)
        self.avgdl = (sum(self.dl.values()) / self.n_docs) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score(self, query: str, doc_id: int) -> float:
        qterms = tokenize(query)
        s = 0.0
        dl = self.dl[doc_id]
        for term in dict.fromkeys(qterms):  # unique, order-preserving
            plist = self.postings.get(term)
            if not plist or doc_id not in plist:
                continue
            tf = plist[doc_id]
            norm = tf + K1 * (1.0 - B + B * dl / self.avgdl)
            s += self.idf(term) * tf / norm
        return s

    def topk(self, query: str, k: int = 10) -> "list[tuple[int, float]]":
        """[(doc_id, score)] — score desc, ties doc_id asc; zero-score docs excluded."""
        qterms = [t for t in dict.fromkeys(tokenize(query)) if t in self.postings]
        if not qterms:
            return []
        scores: dict[int, float] = {}
        for term in qterms:
            idf = self.idf(term)
            for doc_id, tf in self.postings[term].items():
                dl = self.dl[doc_id]
                norm = tf + K1 * (1.0 - B + B * dl / self.avgdl)
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * tf / norm
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def phrase_topk(self, phrase: str, k: int = 10) -> "list[tuple[int, float]]":
        """Lucene PhraseQuery semantics: ptf (exact occurrence count of the
        term sequence) as tf, summed idf of the phrase terms as weight."""
        terms = tokenize(phrase)
        if not terms:
            return []
        uniq = list(dict.fromkeys(terms))
        if any(t not in self.postings for t in uniq):
            return []
        idf_sum = sum(self.idf(t) for t in uniq)
        n = len(terms)
        scores: dict[int, float] = {}
        for doc_id, toks in self.tokens.items():
            ptf = sum(
                1
                for i in range(len(toks) - n + 1)
                if toks[i : i + n] == terms
            )
            if ptf:
                dl = self.dl[doc_id]
                norm = ptf + K1 * (1.0 - B + B * dl / self.avgdl)
                scores[doc_id] = idf_sum * ptf / norm
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
