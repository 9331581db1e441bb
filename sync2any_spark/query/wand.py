"""Top-k retrieval over the compressed index — block-max WAND + distributed path.

Two physical strategies for the same logical operator (B6), mirroring how
ES picks between query phases:

- ``IndexSearcher.search`` — low-latency path. The query's term list is tiny,
  so ``bucket IN (…) AND term IN (…)`` prunes postings partitions and pushes
  predicates into the parquet scan; the surviving blocks (only the query
  terms' postings) come to the driver where numpy block-max WAND prunes
  blocks by upper bound and exact-scores survivors. This is the path a
  search tier would serve QPS from.
- ``search_distributed`` — scale path for huge candidate sets: the same
  pruned scan feeds ``mapInPandas`` (vectorized per-block exact scoring →
  (doc_id, contrib) partials) → ``groupBy(doc_id).sum`` →
  ``ORDER BY score DESC LIMIT k`` (TakeOrderedAndProject — no global sort).

Both return exactly the same ranking as the BM25 oracle: exact Lucene
formula, float64, ties by doc_id ascending.

A term's postings may be split across several salted sub-streams (builder
B3). Each doc lives in exactly one sub-stream, so WAND treats every
(term, salt) stream as an independent cursor carrying the term's idf — the
disjoint union scores identically to one merged list.
"""

from __future__ import annotations

import heapq
import math
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import B, K1
from ..index.codec import decode_doc_ids, decode_tfs
from ..tokenize import tokenize


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_contrib(w, tfs: np.ndarray, dls: np.ndarray, avgdl: float) -> np.ndarray:
    """Per-posting BM25 contribution ``w · tf/(tf + k1·(1−b+b·dl/avgdl))``
    with the constants folded — 4 ufunc passes instead of 7 on the hot
    arrays, int→float upcast inside the loops (no astype copy). ``w`` may
    be a scalar (one term) or a per-posting array. This is THE scoring
    kernel: every vectorized path (driver arrow, driver pandas,
    distributed mapInPandas, serving tier) calls it, so cross-path
    rankings are bit-identical, not merely approx-equal."""
    c1 = K1 * (1.0 - B)
    c2 = K1 * B / avgdl
    denom = c2 * dls
    denom += c1
    denom += tfs
    out = w * tfs
    out /= denom
    return out


@dataclass
class _Cursor:
    """One (term, salt) posting stream: doc-ordered blocks, decoded lazily.

    Block upper bounds are recomputed from the stored (max_tf, min_dl) with
    the LIVE avgdl — tf/(tf+k1·norm) is increasing in tf and decreasing in
    dl, so the pair bounds every posting in the block even after increments
    shift avgdl away from its build-time value.
    """

    weight: float  # idf of the term
    blocks: list  # sorted by min_doc: (min_doc, max_doc, ids, tfs, dls, max_tf, min_dl)
    max_ub: float  # weight * max block bound — WAND global upper bound
    avgdl: float = 1.0
    b_idx: int = 0
    off: int = 0
    _ids: np.ndarray | None = field(default=None, repr=False)
    _tfs: np.ndarray | None = field(default=None, repr=False)
    _dls: np.ndarray | None = field(default=None, repr=False)

    def _load(self) -> None:
        blk = self.blocks[self.b_idx]
        self._ids = decode_doc_ids(blk[2])
        self._tfs = decode_tfs(blk[3])
        self._dls = decode_tfs(blk[4])

    @property
    def exhausted(self) -> bool:
        return self.b_idx >= len(self.blocks)

    @property
    def doc(self) -> int:
        if self._ids is None:
            self._load()
        return int(self._ids[self.off])

    def block_ub(self) -> float:
        blk = self.blocks[self.b_idx]
        mt, mdl = float(blk[5]), float(blk[6])
        return self.weight * mt / (mt + K1 * (1.0 - B + B * mdl / self.avgdl))

    def block_max_doc(self) -> int:
        return self.blocks[self.b_idx][1]

    def next_geq(self, target: int) -> None:
        """Advance to the first posting with doc >= target (block-skipping)."""
        while not self.exhausted and self.blocks[self.b_idx][1] < target:
            self.b_idx += 1
            self.off = 0
            self._ids = None
        if self.exhausted:
            return
        if self._ids is None:
            self._load()
        # in-block binary search from the current offset
        pos = int(np.searchsorted(self._ids[self.off :], target, side="left"))
        self.off += pos
        if self.off >= len(self._ids):  # target falls in a gap past this block
            self.b_idx += 1
            self.off = 0
            self._ids = None
            self.next_geq(target)

    def advance(self) -> None:
        self.off += 1
        if self._ids is not None and self.off >= len(self._ids):
            self.b_idx += 1
            self.off = 0
            self._ids = None

    def score_current(self, avgdl: float) -> float:
        tf = float(self._tfs[self.off])
        dl = float(self._dls[self.off])
        return self.weight * tf / (tf + K1 * (1.0 - B + B * dl / avgdl))


def _is_deleted(deleted: "np.ndarray | None", doc: int) -> bool:
    """Membership in the sorted tombstone array (binary search — the
    compact live-docs representation; 8 bytes per deleted doc, sharded with
    the index at scale)."""
    if deleted is None or deleted.size == 0:
        return False
    i = int(np.searchsorted(deleted, doc))
    return i < deleted.size and int(deleted[i]) == doc


def _alive_mask(deleted: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Vectorized not-in-sorted-array test (O(n log m), no set / no isin
    hash build)."""
    idx = np.searchsorted(deleted, ids)
    idx_c = np.minimum(idx, deleted.size - 1)
    return ~((idx < deleted.size) & (deleted[idx_c] == ids))


def _group_sum(ids: np.ndarray, contrib: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """(unique doc ids ascending, per-doc contribution sums) with allocation
    proportional to the MATCH count, never the doc-id space.

    Replaces the former unconditional ``np.bincount(ids, …,
    minlength=max(ids)+1)`` whose dense accumulator scaled with the global
    doc-id space (8 GB per query on a 10^9-doc shard even for a two-match
    query — round-2 What's-wrong #2). Adaptive, allocation always
    O(matches): when the OBSERVED id span is within 4× the match count a
    span-offset bincount runs (C-speed scatter-add, accumulator ≤ 32
    bytes/match); otherwise a stable sort + ``np.add.reduceat``. Per-doc
    sums agree across the variants to the last ulp or so (float-sum
    reassociation) — far inside the 1e-9 tolerance every cross-engine
    ranking test and the 6-dp contract rounding use."""
    lo = int(ids.min())
    span = int(ids.max()) - lo + 1
    if span <= 4 * ids.size:
        full = np.bincount(ids - lo, weights=contrib, minlength=span)
        uniq = np.flatnonzero(full)
        return uniq + lo, full[uniq]
    order = np.argsort(ids, kind="stable")
    sids = ids[order]
    svals = contrib[order]
    change = np.concatenate(([True], sids[1:] != sids[:-1]))
    starts = np.flatnonzero(change)
    return sids[starts], np.add.reduceat(svals, starts)


def _bmw_topk(
    cursors: list[_Cursor],
    k: int,
    avgdl: float,
    deleted: "np.ndarray | None" = None,
) -> list[tuple[int, float]]:
    """Block-max WAND over disjoint posting streams → [(doc_id, score)].

    Docs are fully scored in ascending doc order; the heap replaces only on
    strictly-greater score, so ties resolve to the lowest doc_id — the same
    deterministic tie-break the oracle pins (SURVEY.md §7.3). Tombstoned
    docs (``deleted``, a SORTED doc-id array) are advanced past without
    scoring — the Lucene live-docs analog for pre-compaction queries.
    """
    heap: list[tuple[float, int]] = []  # min-heap of (score, -doc) — size ≤ k
    theta = 0.0

    live = [c for c in cursors if not c.exhausted]
    while live:
        live.sort(key=lambda c: c.doc)
        # find pivot: smallest prefix whose summed global UBs reach theta
        acc = 0.0
        pivot_i = -1
        for i, c in enumerate(live):
            acc += c.max_ub
            if acc > theta or (len(heap) < k and acc > 0.0):
                pivot_i = i
                break
        if pivot_i < 0:
            break  # no prefix can beat theta — done
        pivot_doc = live[pivot_i].doc

        if live[0].doc == pivot_doc:
            # block-max check: refine with per-block bounds at pivot_doc
            block_acc = 0.0
            for c in live:
                if c.doc > pivot_doc:
                    break
                block_acc += c.block_ub()
            if len(heap) >= k and block_acc <= theta:
                # Skip (Ding & Suel GetNewCandidate): jump the pivot-group
                # cursors past the minimal current-block boundary, clamped
                # by the next non-group cursor's doc — docs in between can
                # only be matched by the group's current blocks, whose
                # summed bounds just failed the theta test.
                adv = [c for c in live if c.doc <= pivot_doc]
                rest = [c for c in live if c.doc > pivot_doc]
                target = min(c.block_max_doc() for c in adv) + 1
                if rest:
                    target = min(target, min(c.doc for c in rest))
                if target <= pivot_doc:
                    target = pivot_doc + 1
                for c in adv:
                    c.next_geq(target)
            elif _is_deleted(deleted, pivot_doc):
                for c in live:
                    if not c.exhausted and c.doc == pivot_doc:
                        c.advance()
            else:
                score = 0.0
                for c in live:
                    if not c.exhausted and c.doc == pivot_doc:
                        score += c.score_current(avgdl)
                for c in live:
                    if not c.exhausted and c.doc == pivot_doc:
                        c.advance()
                if len(heap) < k:
                    heapq.heappush(heap, (score, -pivot_doc))
                    if len(heap) == k:
                        theta = heap[0][0]
                elif score > heap[0][0]:
                    heapq.heapreplace(heap, (score, -pivot_doc))
                    theta = heap[0][0]
            live = [c for c in live if not c.exhausted]
        else:
            # advance all cursors before the pivot up to pivot_doc
            for c in live[:pivot_i]:
                c.next_geq(pivot_doc)
            live = [c for c in live if not c.exhausted]

    out = sorted(heap, key=lambda t: (-t[0], -t[1]))
    return [(-nd, s) for s, nd in out]


def _load_deletes(dirs: "list[str]") -> np.ndarray:
    """Union of tombstone tables as one sorted int64 array (pyarrow read —
    driver-side but never a Spark collect)."""
    if not dirs:
        return np.array([], dtype=np.int64)
    import pyarrow.dataset as ds

    parts = [
        ds.dataset(d).to_table(columns=["doc_id"])["doc_id"].to_numpy()
        for d in dirs
    ]
    return np.unique(np.concatenate(parts).astype(np.int64))


# a query whose terms' summed live df exceeds this routes to the
# distributed execution instead of reading pruned blocks driver-side
# (round-2 What's-wrong #1: a stop-word term's postings are TBs at 10^12
# docs — the driver path is only valid for selective terms). The number is
# postings: 10^7 postings ≈ ~25 MB of compressed blocks — a bounded,
# sub-second pyarrow fetch; anything larger belongs on the cluster.
ROUTE_BUDGET = int(os.environ.get("SPARK_GRAFT_ROUTE_BUDGET", 10_000_000))

# slice-parallel scoring kicks in above this many blocks (~256k postings —
# below it thread fan-out overhead beats the win); numpy ufunc loops release
# the GIL, so a small driver-side pool gives near-linear speedup on the
# decode+score passes of hot-term queries
_PARALLEL_BLOCKS = 2048
_SCORE_THREADS = int(os.environ.get("SPARK_GRAFT_SCORE_THREADS", "4"))


def topk_sorted(
    uniq: np.ndarray, scores: np.ndarray, k: int
) -> "list[tuple[int, float]]":
    """Exact top-k with the engine-wide tie-break (score desc, doc_id
    asc); ``uniq`` need not be sorted but must be duplicate-free."""
    if k < len(uniq):
        kth = np.partition(scores, len(scores) - k)[len(scores) - k]
        cand = np.flatnonzero(scores >= kth)  # boundary ties included
    else:
        cand = np.arange(len(uniq))
    order = cand[np.lexsort((uniq[cand], -scores[cand]))][:k]
    return [(int(uniq[i]), float(scores[i])) for i in order]


def topk_dense(full: np.ndarray, lo: int, k: int) -> "list[tuple[int, float]]":
    """Top-k straight off a DENSE span-offset score array (the
    span-bincount merge output): one partition over the span finds the
    kth score, one comparison collects candidates — no full
    flatnonzero + gather of every matched doc (a hot 2-term query
    matches ~80% of the corpus; materializing those ids cost two extra
    span-sized passes). BM25 contributions are strictly positive, so a
    zero cell is "no match" and the kth-score cut can only be crossed
    by real matches; a zero kth (fewer than k matches) falls back to
    the sparse path."""
    n = full.size
    if n == 0:
        return []
    if k < n:
        kth = np.partition(full, n - k)[n - k]
        if kth > 0.0:
            cand = np.flatnonzero(full >= kth)
            return topk_sorted(cand + lo, full[cand], k)
    uniq = np.flatnonzero(full)
    return topk_sorted(uniq + lo, full[uniq], k)
_SCORE_POOL = None


def _score_pool():
    global _SCORE_POOL
    if _SCORE_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _SCORE_POOL = ThreadPoolExecutor(_SCORE_THREADS)
    return _SCORE_POOL


class IndexSearcher:
    """Query-side handle on an index directory built by index.builder.

    **Self-dispatching planner**: every query's cost is known BEFORE any
    scan — Σ df of its terms, read from the driver-resident term dictionary
    (the terms table, loaded once via pyarrow: the same in-memory term
    dictionary every search engine holds; ``buckets=[...]`` restricts a
    sharded node to its buckets' rows — see ``_term_dfs``). At or below ``route_budget`` postings the
    low-latency driver path runs (pruned scan → collect → numpy); above it
    the query routes to ``search_distributed``, whose shuffle carries only
    (doc_id, contrib) partials — so a hot-term query can never pull an
    unbounded posting list across the driver (round-2 What's-wrong #1).

    The driver path issues ZERO Spark jobs by default: bucket list driver-
    side (md5, no job), df from the term dictionary, N/avgdl from meta.json
    at init, and the pruned blocks fetched by a direct pyarrow read
    (``scan="pyarrow"`` — bucket partitions + term row-group pruning, any
    pyarrow filesystem). ``scan="spark"`` keeps the Spark scan; with
    ``cache=True`` that relation is pinned in executor memory — the "warm
    index" a serving tier would hold.
    """

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        cache: bool = False,
        route_budget: int = ROUTE_BUDGET,
        buckets: "list[int] | None" = None,
    ) -> None:
        from ..index.builder import (
            deletes_sources,
            docs_sources,
            postings_sources,
            read_index_meta,
            IndexPaths,
        )

        self.spark = spark
        self.index_dir = index_dir
        self.route_budget = route_budget
        self.meta = read_index_meta(index_dir)
        self.n_buckets = int(self.meta["n_buckets"])
        # a sharded query tier gives each node a bucket subset: the node's
        # term dictionary loads ONLY those buckets' rows (at 10^12 docs the
        # full vocabulary is 10^8-10^9 terms — tens of GB; a bucket's slice
        # is 1/n_buckets of that), mirroring ES's per-shard term dictionary
        self.buckets = sorted(buckets) if buckets is not None else None
        paths = IndexPaths(index_dir)
        tv = int(self.meta.get("terms_version", 0))
        self._terms_path = paths.terms_v(tv)
        self._df_map: "pd.Series | None" = None  # lazy term dictionary
        # lazy pyarrow handles, one per (segment root, bucket) partition dir
        # — a query opens only its terms' buckets (fragment work stays
        # O(query), not O(index)); remote (non-local-path) roots fall back
        # to whole-root hive datasets
        self._bucket_datasets: dict = {}
        self._root_datasets: dict = {}
        # live corpus stats from the committed stats version (increments
        # commit a new version atomically via meta.json)
        st = spark.read.parquet(paths.stats_v(tv)).first()
        self.n_docs = int(st.n_docs)
        self.avgdl = float(st.avgdl)
        pdirs = postings_sources(index_dir, self.meta)
        if pdirs:
            # each segment dir is its own hive-partitioned table root —
            # union them (Spark refuses multi-root partition discovery)
            from functools import reduce

            parts = [spark.read.parquet(d) for d in pdirs]
            self._postings = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)
        else:
            # an all-empty corpus writes no postings files — valid index
            from ..index.builder import BLOCK_SCHEMA

            self._postings = spark.createDataFrame([], BLOCK_SCHEMA)
        self._block_cols = [
            "term", "salt", "block_id", "min_doc", "max_doc",
            "doc_ids", "tfs", "dls", "max_tf", "min_dl", "n_docs",
        ]
        # positional reads (match_phrase) go through the UNCACHED relation:
        # the serving cache pins only the scoring columns, so the pos
        # column stays on disk until a phrase query prunes-and-reads it
        self._postings_full = self._postings
        # with a pinned relation the Spark scan is the path that benefits —
        # make it the default so callers don't pay cache materialization
        # for a cache the pyarrow path would never touch
        self._default_scan = "spark" if cache else "pyarrow"
        if cache:
            self._postings = self._postings.select(*self._block_cols, "bucket").cache()
            self._postings.count()  # materialize
        self._terms = spark.read.parquet(paths.terms_v(tv))
        ddirs = docs_sources(index_dir, self.meta)
        if ddirs:
            from functools import reduce

            dparts = [spark.read.parquet(d) for d in ddirs]
            self._docs = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dparts)
        else:
            from ..index.builder import DOCS_SCHEMA

            self._docs = spark.createDataFrame([], DOCS_SCHEMA)
        # tombstones (Lucene live-docs analog): a SORTED numpy doc-id array
        # loaded via pyarrow (no Spark job, no Python set) — 8 bytes per
        # deleted doc, sharded alongside the index at serving scale;
        # membership is a binary search
        self.deleted = _load_deletes(deletes_sources(index_dir, self.meta))

    # -- helpers ---------------------------------------------------------
    def _qterms(self, query: str) -> list[str]:
        return list(dict.fromkeys(tokenize(query)))

    def _term_dfs(self, terms: "list[str]") -> "dict[str, int]":
        """Exact LIVE df per term from the driver-resident term dictionary
        (terms table, pyarrow-loaded once — no Spark job; the table is
        maintained exactly across increments, so this is always the live
        df). With ``buckets`` set, ONLY those buckets' rows load — the
        sharded-deployment memory bound (a term outside the shard's buckets
        maps to 0, same as an absent term: that shard never owns its
        postings). Absent terms map to 0."""
        if self._df_map is None:
            import pyarrow.dataset as ds

            bucket_filter = (
                ds.field("bucket").isin(self.buckets)
                if self.buckets is not None
                else None
            )
            tbl = ds.dataset(self._terms_path).to_table(
                columns=["term", "df"], filter=bucket_filter
            )
            self._df_map = pd.Series(
                tbl.column("df").to_numpy(zero_copy_only=False).astype(np.int64),
                index=tbl.column("term").to_numpy(zero_copy_only=False),
            )
        m = self._df_map
        return {t: int(m.get(t, 0)) for t in terms}

    def _pruned_blocks(self, qterms: list[str]) -> DataFrame:
        from ..index.bucketing import bucket_of

        buckets = sorted({bucket_of(t, self.n_buckets) for t in qterms})
        return self._postings.where(
            F.col("bucket").isin(buckets) & F.col("term").isin(qterms)
        )

    def _pruned_blocks_arrow(self, qterms: "list[str]", with_pos: bool = False):
        """Pruned blocks fetched with a DIRECT pyarrow read — no Spark job,
        no JVM→Python serialization, and (returned as an Arrow table) no
        Python ``bytes`` materialization either: the scoring path decodes
        straight off the Arrow binary buffers. The same pruning the Spark
        scan gets: ``bucket=`` hive partitions limit the files touched, the
        term predicate prunes row groups via parquet column stats (merge
        output is term-sorted within each file, so the stats are tight).
        This is metadata-scale I/O — only the query terms' blocks are read —
        and works against any pyarrow filesystem (local, S3, GCS). Bounded
        by the route budget: above it the query never takes this path."""
        import pyarrow as pa
        import pyarrow.dataset as ds

        from ..index.builder import postings_sources
        from ..index.bucketing import bucket_of

        cols = self._block_cols + (["pos"] if with_pos else [])
        buckets = sorted({bucket_of(t, self.n_buckets) for t in qterms})
        # one lazily-cached dataset PER (segment root, bucket) dir: the
        # query only ever opens its terms' buckets, so per-call fragment
        # work is O(files in those buckets), not O(files in the index) —
        # a light query's fetch is a handful of footer-pruned row groups
        filt = ds.field("term").isin(qterms)
        reads = []  # (dataset, filter) pairs, resolved on this thread
        for root in postings_sources(self.index_dir, self.meta):
            if "://" in root:
                # remote root: one hive dataset over the whole root (the
                # partition expression prunes buckets; no local listdir)
                if root not in self._root_datasets:
                    self._root_datasets[root] = ds.dataset(root, partitioning="hive")
                reads.append(
                    (
                        self._root_datasets[root],
                        ds.field("bucket").isin(buckets) & filt,
                    )
                )
                continue
            for b in buckets:
                key = (root, b)
                if key not in self._bucket_datasets:
                    p = os.path.join(root, f"bucket={b}")
                    self._bucket_datasets[key] = (
                        ds.dataset(p) if os.path.isdir(p) else None
                    )
                d = self._bucket_datasets[key]
                if d is not None:
                    reads.append((d, filt))
        if not reads:
            return pa.table({c: [] for c in cols})
        if len(reads) == 1:
            return reads[0][0].to_table(columns=cols, filter=reads[0][1])
        # fan the per-(root, bucket) pruned reads out on the score pool —
        # each is an independent footer-pruned C++ read that releases the
        # GIL, and multi-term/multi-segment fetches were serialized on
        # this loop (guide §2.6 applied driver-side)
        futs = [
            _score_pool().submit(d.to_table, columns=cols, filter=f)
            for d, f in reads
        ]
        parts = [f.result() for f in futs]
        return pa.concat_tables(parts, promote_options="permissive")

    def _pruned_blocks_pandas(
        self, qterms: "list[str]", with_pos: bool = False
    ) -> pd.DataFrame:
        """Pandas spelling of ``_pruned_blocks_arrow`` (the BMW-engine and
        positional-phrase driver legs group per term in pandas)."""
        return self._pruned_blocks_arrow(qterms, with_pos=with_pos).to_pandas()

    # -- low-latency path -------------------------------------------------
    def search(
        self, query: str, k: int = 10, engine: str = "vectorized",
        route: str = "auto", scan: "str | None" = None,
    ) -> list[tuple[int, float]]:
        """Top-k → [(doc_id, score)] rank-ordered, self-dispatching.

        ``route="auto"`` (default): the term dictionary prices the query as
        Σ df over its terms (driver-side, no scan); at or below
        ``route_budget`` postings the driver path runs, above it the query
        executes distributed (identical ranking — contract-gated) and only
        k rows reach the driver. ``route="driver"``/``"distributed"`` force
        a path (tests, diagnostics).

        Driver path scan: ``scan=None`` picks the searcher's default —
        ``"pyarrow"`` normally, ``"spark"`` when the searcher was built with
        ``cache=True`` (otherwise the pinned relation would never be
        touched). ``scan="pyarrow"`` reads the pruned blocks directly
        (bucket partitions + term row-group pruning, C++ reader, no Spark
        job — the budget-bounded fetch is a few MB) and the vectorized
        engine scores straight off the Arrow buffers (no Python bytes);
        ``scan="spark"`` keeps the Spark scan (the cached-relation path).
        Engines: ``engine="vectorized"`` (default) decodes every pruned
        block and scores with numpy — optimal when the blocks were fetched
        anyway. ``engine="bmw"``: block-max WAND with block skipping — the
        algorithm a serving tier runs when block metadata lets it avoid
        *fetching* blocks. All paths return identical rankings (tested).
        """
        qterms = self._qterms(query)
        if not qterms:
            return []
        dfs = self._term_dfs(qterms)
        qterms = [t for t in qterms if dfs[t] > 0]
        if not qterms:
            return []
        if route == "distributed" or (
            route == "auto" and sum(dfs[t] for t in qterms) > self.route_budget
        ):
            rows = self.search_distributed(query, k).collect()
            return [(int(r.doc_id), float(r.score)) for r in rows]
        if scan is None:
            scan = self._default_scan
        if scan == "pyarrow":
            if engine == "vectorized":
                tbl = self._pruned_blocks_arrow(qterms)
                if tbl.num_rows == 0:
                    return []
                return self._vectorized_topk_arrow(tbl, qterms, dfs, k)
            pdf = self._pruned_blocks_pandas(qterms)
        else:
            pdf = self._pruned_blocks(qterms).select(*self._block_cols).toPandas()
        if pdf.empty:
            return []
        if engine == "vectorized":
            return self._vectorized_topk(pdf, dfs, k)
        cursors: list[_Cursor] = []
        for (term, _salt), g in pdf.groupby(["term", "salt"], sort=True):
            if dfs.get(term, 0) <= 0:
                continue  # every posting of the term is tombstoned
            g = g.sort_values("min_doc")
            w = idf(self.n_docs, dfs[term])
            blocks = [
                (r.min_doc, r.max_doc, r.doc_ids, r.tfs, r.dls, r.max_tf, r.min_dl)
                for r in g.itertuples(index=False)
            ]
            cur = _Cursor(weight=w, blocks=blocks, max_ub=0.0, avgdl=self.avgdl)
            cur.max_ub = max(
                cur.weight
                * float(b[5])
                / (float(b[5]) + K1 * (1.0 - B + B * float(b[6]) / self.avgdl))
                for b in blocks
            )
            cursors.append(cur)
        return _bmw_topk(
            cursors, k, self.avgdl,
            deleted=self.deleted if self.deleted.size else None,
        )

    def _topk_from_postings(
        self, ids: np.ndarray, contrib: np.ndarray, single_term: bool, k: int
    ) -> list[tuple[int, float]]:
        """Shared tail of the vectorized engines: tombstone drop → per-doc
        sum → exact top-k with the engine-wide tie-break (score desc,
        doc_id asc). ``single_term`` skips the merge pass (one posting per
        doc — salted sub-streams are doc-disjoint)."""
        if self.deleted.size:
            alive = _alive_mask(self.deleted, ids)
            ids, contrib = ids[alive], contrib[alive]
        return self._topk_postsums(ids, contrib, single_term, k)

    def _pruned_single_arrow(
        self, tbl, w: float, k: int
    ) -> "list[tuple[int, float]] | None":
        """Block-max pruned leg for SINGLE-term hot queries on the arrow
        driver path (the serving tier's `_vectorized_pruned` reshaped for
        the Arrow block table; r5 VERDICT Next #3). Exact: a single-term
        doc lives in exactly one block, the drift-safe (max_tf, min_dl)
        bound dominates every score in its block, and θ is the k-th best
        of REAL seed scores (θ ≤ true k-th best), so every dropped block
        (ub < θ − ε) holds only docs that cannot enter the top-k; boundary
        ties survive via the ε slack. Returns None when pruning keeps too
        much (near-uniform block maxima) — callers fall back to the
        exhaustive scorer. Multi-term queries stay exhaustive here: on the
        bench's stop-word pairs the feasibility floor keeps ≈100% of
        postings (PLANS.md §10), so the seed pass would be pure
        overhead."""
        from ..index.codec import decode_block_batch_arrow

        mtf = tbl.column("max_tf").to_numpy().astype(np.float64)
        mdl = tbl.column("min_dl").to_numpy().astype(np.float64)
        ub = w * mtf / (mtf + K1 * (1.0 - B + B * mdl / self.avgdl))
        nd = tbl.column("n_docs").to_numpy().astype(np.int64)
        tot = int(nd.sum())
        order = np.argsort(-ub)
        budget = max(4000, min(50_000, tot // 50))
        m = int(np.searchsorted(np.cumsum(nd[order]), budget)) + 1
        seed_idx = np.sort(order[:m])
        seed = tbl.take(seed_idx)
        ids, tfs, dls = decode_block_batch_arrow(seed)
        contrib = bm25_contrib(w, tfs, dls, self.avgdl)
        if self.deleted.size:
            alive = _alive_mask(self.deleted, ids)
            contrib = contrib[alive]
        if contrib.size < k:
            return None
        theta = float(np.partition(contrib, contrib.size - k)[contrib.size - k])
        if theta <= 0.0:
            return None
        keep = ub >= theta - 1e-9
        if int(nd[keep].sum()) > tot // 2:
            return None
        sub = tbl.filter(keep)
        if self.deleted.size == 0:
            fast = self._single_term_topk_arrow(sub, w, k)
            if fast is not None:
                return fast
        idsk, tfsk, dlsk = decode_block_batch_arrow(sub)
        contribk = bm25_contrib(w, tfsk, dlsk, self.avgdl)
        if self.deleted.size:
            alivek = _alive_mask(self.deleted, idsk)
            idsk, contribk = idsk[alivek], contribk[alivek]
        return self._topk_postsums(idsk, contribk, True, k)

    def _single_term_topk_arrow(
        self, tbl, w: float, k: int
    ) -> "list[tuple[int, float]] | None":
        """Single-term exhaustive scorer that never decodes the doc-id
        column for non-candidates: scores depend only on (tf, dl), so the
        k-th contribution threshold is found from two column decodes, and
        doc ids decode ONLY for the blocks holding candidate postings
        (ids were ~40% of the single-term decode cost, plus the per-posting
        weight array disappears — w is a scalar). Valid only with no
        tombstones (alive filtering needs every id); returns None when
        boundary ties make the candidate set so large that the full path
        is cheaper. Rank- and score-identical: candidates are exactly the
        postings with contribution ≥ the k-th best, and the shared
        ``topk_sorted`` applies the engine tie-break."""
        from ..index.codec import (
            _decode_pool,
            arrow_binary_bytes,
            decode_block_batch_arrow,
            vb_decode,
        )

        f_tf = _decode_pool().submit(
            lambda: vb_decode(arrow_binary_bytes(tbl.column("tfs")))
        )
        dls = vb_decode(arrow_binary_bytes(tbl.column("dls")))
        tfs = f_tf.result()
        contrib = bm25_contrib(w, tfs, dls, self.avgdl)
        n = contrib.size
        if n == 0:
            return []
        kk = min(k, n)
        tau = np.partition(contrib, n - kk)[n - kk]
        cand = np.flatnonzero(contrib >= tau)
        if cand.size > max(4 * k, n // 4):
            return None  # massive score ties — full decode is cheaper
        counts = tbl.column("n_docs").to_numpy().astype(np.int64)
        bounds = np.concatenate(([0], np.cumsum(counts)))
        blk = np.searchsorted(bounds, cand, side="right") - 1
        ublk = np.unique(blk)
        ids_sub, _tf, _dl = decode_block_batch_arrow(
            tbl.take(ublk), parallel=False
        )
        sub_bounds = np.concatenate(([0], np.cumsum(counts[ublk])))
        sub_pos = (
            sub_bounds[np.searchsorted(ublk, blk)] + (cand - bounds[blk])
        )
        return self._topk_sorted(ids_sub[sub_pos], contrib[cand], k)

    def _vectorized_topk_arrow(
        self, tbl, qterms: "list[str]", dfs: dict[str, int], k: int
    ) -> list[tuple[int, float]]:
        """Exhaustive scoring straight off the Arrow block table — the
        default driver leg. ONE segmented varbyte decode per column over
        zero-copy views of the Arrow binary buffers (no per-block Python
        bytes, no join copy — the round-3 q8 fetch cost), per-block idf
        weights assigned with arrow-compute equality masks (no per-block
        Python string ever materializes), then spread per-posting by one
        ``np.repeat``. Hot-term queries (≥ ``_PARALLEL_BLOCKS`` blocks)
        score SLICE-PARALLEL: the table splits into zero-copy row slices,
        each thread decodes + scores its slice (numpy releases the GIL in
        the ufunc loops), and the per-doc sums merge via per-thread
        span-bincounts — allocation still O(matches + observed span).
        Caller guarantees every fetched block's term is in ``qterms`` with
        live df > 0 (search() drops dead terms before the fetch). Ranking
        is identical to ``_vectorized_topk`` (exact BM25, same
        tie-break)."""
        import pyarrow.compute as pc

        from ..index.codec import decode_block_batch_arrow

        term_col = tbl.column("term")
        w_block = np.zeros(tbl.num_rows, dtype=np.float64)
        for t in qterms:
            m = pc.equal(term_col, t).to_numpy(zero_copy_only=False)
            w_block[m] = idf(self.n_docs, dfs[t])
        deleted = self.deleted if self.deleted.size else None

        def score_slice(sl, w_block_sl):
            """(ids, contrib) of one row slice — runs GIL-light."""
            ids, tfs, dls = decode_block_batch_arrow(sl, parallel=False)
            counts = sl.column("n_docs").to_numpy().astype(np.int64)
            w_post = np.repeat(w_block_sl, counts)
            contrib = bm25_contrib(w_post, tfs, dls, self.avgdl)
            if deleted is not None:
                alive = _alive_mask(deleted, ids)
                ids, contrib = ids[alive], contrib[alive]
            return ids, contrib

        single = len(qterms) == 1
        if single and tbl.num_rows >= _PARALLEL_BLOCKS:
            w1 = idf(self.n_docs, dfs[qterms[0]])
            pruned = self._pruned_single_arrow(tbl, w1, k)
            if pruned is not None:
                return pruned
            if deleted is None:
                fast = self._single_term_topk_arrow(tbl, w1, k)
                if fast is not None:
                    return fast
        if tbl.num_rows < _PARALLEL_BLOCKS:
            ids, contrib = score_slice(tbl, w_block)
            return self._topk_postsums(ids, contrib, single, k)
        nrows = tbl.num_rows
        T = _SCORE_THREADS
        cuts = [i * nrows // T for i in range(T + 1)]
        futs = [
            _score_pool().submit(
                score_slice,
                tbl.slice(cuts[i], cuts[i + 1] - cuts[i]),
                w_block[cuts[i] : cuts[i + 1]],
            )
            for i in range(T)
        ]
        parts = [f.result() for f in futs]
        parts = [(i, c) for i, c in parts if i.size]
        if not parts:
            return []
        if single:
            # one posting per doc (salted sub-streams are doc-disjoint) —
            # no cross-slice merge needed
            ids = np.concatenate([p[0] for p in parts])
            return self._topk_sorted(ids, np.concatenate([p[1] for p in parts]), k)
        lo = min(int(p[0].min()) for p in parts)
        hi = max(int(p[0].max()) for p in parts)
        span = hi - lo + 1
        total = sum(p[0].size for p in parts)
        if span <= 4 * total:
            # per-thread span-offset bincounts, summed — the merge is T-1
            # adds over the observed span, never the global doc-id space
            futs = [
                _score_pool().submit(
                    np.bincount, p[0] - lo, weights=p[1], minlength=span
                )
                for p in parts
            ]
            full = futs[0].result()
            for f in futs[1:]:
                full += f.result()
            return self._topk_dense(full, lo, k)
        ids = np.concatenate([p[0] for p in parts])
        contrib = np.concatenate([p[1] for p in parts])
        uniq, scores = _group_sum(ids, contrib)
        return self._topk_sorted(uniq, scores, k)

    def _topk_postsums(
        self, ids: np.ndarray, contrib: np.ndarray, single: bool, k: int
    ) -> list[tuple[int, float]]:
        """Per-doc sum (skipped for single-term) + top-k over ALREADY
        tombstone-filtered postings."""
        if ids.size == 0:
            return []
        if single:
            uniq, scores = ids, contrib
        else:
            uniq, scores = _group_sum(ids, contrib)
        return self._topk_sorted(uniq, scores, k)

    def _topk_dense(
        self, full: np.ndarray, lo: int, k: int
    ) -> list[tuple[int, float]]:
        return topk_dense(full, lo, k)

    def _topk_sorted(
        self, uniq: np.ndarray, scores: np.ndarray, k: int
    ) -> list[tuple[int, float]]:
        return topk_sorted(uniq, scores, k)

    def _vectorized_topk(
        self, pdf, dfs: dict[str, int], k: int
    ) -> list[tuple[int, float]]:
        """Exhaustive numpy scoring of the collected blocks (exact BM25)."""
        from ..index.codec import decode_block_batch

        ids_all, contrib_all = [], []
        for term, g in pdf.groupby("term", sort=True):
            if dfs.get(term, 0) <= 0:
                continue
            w = idf(self.n_docs, dfs[term])
            ids, tfs, dls = decode_block_batch(
                g["doc_ids"], g["tfs"], g["dls"], g["n_docs"].to_numpy()
            )
            ids_all.append(ids)
            contrib_all.append(bm25_contrib(w, tfs, dls, self.avgdl))
        if not ids_all:
            return []
        ids = np.concatenate(ids_all)
        contrib = np.concatenate(contrib_all)
        return self._topk_from_postings(ids, contrib, len(ids_all) == 1, k)

    # -- distributed path --------------------------------------------------
    def search_distributed(self, query: str, k: int = 10) -> DataFrame:
        """Cluster-side scoring: pruned scan → vectorized partial scores →
        groupBy(doc_id).sum → TakeOrderedAndProject(k). Term weights come
        from the driver term dictionary — the whole query is ONE job."""
        qterms = self._qterms(query)
        spark = self.spark
        empty = spark.createDataFrame([], "doc_id long, score double")
        if not qterms:
            return empty
        dfs = self._term_dfs(qterms)
        qterms = [t for t in qterms if dfs.get(t, 0) > 0]
        if not qterms:
            return empty
        n_docs, avgdl = self.n_docs, self.avgdl
        weights = {t: idf(n_docs, dfs[t]) for t in qterms}
        # tombstones ride a real Spark broadcast (one copy per executor,
        # not per task closure)
        dead_bc = spark.sparkContext.broadcast(self.deleted)

        def score_blocks(batches):
            dead = dead_bc.value
            for pdf in batches:
                outs_d, outs_s = [], []
                for r in pdf.itertuples(index=False):
                    ids = decode_doc_ids(r.doc_ids)
                    tfs = decode_tfs(r.tfs)
                    dls = decode_tfs(r.dls)
                    if dead.size:
                        alive = _alive_mask(dead, ids)
                        ids, tfs, dls = ids[alive], tfs[alive], dls[alive]
                    if ids.size == 0:
                        continue
                    w = weights[r.term]
                    outs_d.append(ids)
                    outs_s.append(bm25_contrib(w, tfs, dls, avgdl))
                if outs_d:
                    yield pd.DataFrame(
                        {
                            "doc_id": np.concatenate(outs_d),
                            "contrib": np.concatenate(outs_s),
                        }
                    )

        # scoring needs 4 columns — projecting BEFORE the kernel keeps the
        # pos column (comparable in bytes to the postings themselves on a
        # positional index) and the block metadata out of the scan entirely
        partials = (
            self._pruned_blocks(qterms)
            .select("term", "doc_ids", "tfs", "dls")
            .mapInPandas(score_blocks, schema="doc_id long, contrib double")
        )
        scored = partials.groupBy("doc_id").agg(F.sum("contrib").alias("score"))
        return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)

    def fetch(self, hits: list[tuple[int, float]]) -> DataFrame:
        """Resolve winners to their source rows (B8 doc-store get)."""
        empty_schema = (
            "doc_id long, score double, conv_id string, turn_idx int, "
            "role string, text string"
        )
        if not hits:
            return self.spark.createDataFrame([], empty_schema)
        live = [h for h in hits if not _is_deleted(self.deleted, h[0])]
        if not live:
            return self.spark.createDataFrame([], empty_schema)
        hit_df = self.spark.createDataFrame(live, "doc_id long, score double")
        return self._docs.join(F.broadcast(hit_df), "doc_id").select(
            "doc_id", "score", "conv_id", "turn_idx", "role", "text"
        )
