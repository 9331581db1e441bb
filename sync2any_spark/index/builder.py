"""Distributed inverted-index build — SPIMI per partition, resumable.

Pipeline (SURVEY.md §7.1 M2/M3, north-rule core):

1. **Stable doc ids** — ``doc_id`` = global rank of ``(conv_id, turn_idx)``,
   computed with a scalable two-level prefix sum over per-conversation turn
   counts (no single-partition window, no ``monotonically_increasing_id`` —
   the id is a pure function of the data, never of task scheduling;
   SURVEY.md §7.3). Mirrors the reference's composite-PK doc identity
   (``transform/RecordsTransform.java:110-125``).
2. **Docs store** — transcripts + ``doc_id`` + ``dl`` (token count). The doc
   *is* the row, as in the reference's parameter projection
   (``transform/RecordsTransform.java:54-76``); per-turn text equality vs the
   source is asserted in tests.
3. **SPIMI chunks** — ``groupBy(part_id).applyInPandas``: each partition
   (hash of ``conv_id`` — stable across runs, which makes resume sound)
   tokenizes its turns with the canonical Python analyzer and builds an
   in-memory ``term → (doc_ids, tfs, dls)`` map, written as one
   varbyte-compressed parquet chunk **directly from the task** with an
   atomic tmp→rename plus a per-partition manifest JSON. A re-run skips
   completed partitions (the analog of the reference's offset-reset /
   checkpoint-ack recovery, ``extract/KafkaMsgListener.java:76-79,312-330``).
4. **Term stats** — ``groupBy(term)`` over chunk rows (map-side combined;
   hot terms are sums of few-hundred-byte rows, not row explosions).
5. **Salted compaction merge** — chunks of a term are concatenated in doc-id
   order and re-cut into 128-posting blocks with exact per-block max-score
   bounds. Terms with df above a threshold are salted into ``n_salts``
   disjoint sub-streams (a doc lives in exactly one stream, so BM25 sums
   stay exact) to keep the merge balanced under Zipf skew (B3).
6. **Postings layout** — parquet partitioned by ``bucket = xxhash64(term) %
   n_buckets`` so a query's ``bucket IN … AND term IN …`` filter prunes
   partitions and pushes predicates into the scan.

Scale posture: every stage is one shuffle or less; nothing collects more
than per-partition counts (ints) to the driver. Knobs: ``n_partitions``
(SPIMI group size ≈ corpus/n_partitions must fit an executor),
``n_buckets`` (query-side pruning granularity), ``n_salts`` ×
``heavy_df_threshold`` (merge-group upper bound ≈ heavy-term df / n_salts).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import B, BLOCK_SIZE, K1
from ..query.algebra import SPARK_TOKEN_RE
from ..tokenize import tokenize_series
from .codec import encode_doc_ids, encode_tfs

# groups per bucket in the compaction merge — parallelism knob, independent
# of the bucket count (a term always lands in exactly one (bucket, sub))
MERGE_SUBSPLIT = 8

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("min_doc", T.LongType()),
        T.StructField("max_doc", T.LongType()),
        T.StructField("n_docs", T.IntegerType()),
        T.StructField("cf", T.LongType()),
        T.StructField("doc_ids", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("dls", T.BinaryType()),
    ]
)

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("rows", T.LongType()),
        T.StructField("n_terms", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
        T.StructField("attempt", T.IntegerType()),
    ]
)

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("block_id", T.IntegerType()),
        T.StructField("min_doc", T.LongType()),
        T.StructField("max_doc", T.LongType()),
        T.StructField("n_docs", T.IntegerType()),
        T.StructField("doc_ids", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("dls", T.BinaryType()),
        T.StructField("block_max_score", T.DoubleType()),
        T.StructField("max_tf", T.IntegerType()),
        T.StructField("min_dl", T.IntegerType()),
    ]
)


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def chunks(self) -> str:
        return os.path.join(self.root, "chunks")

    @property
    def terms(self) -> str:
        return os.path.join(self.root, "terms")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats")

    @property
    def metrics(self) -> str:
        return os.path.join(self.root, "metrics")

    @property
    def deletes(self) -> str:
        return os.path.join(self.root, "deletes")


def assign_doc_ids(
    transcripts: DataFrame, n_range_parts: int = 64
) -> DataFrame:
    """transcripts + dense stable ``doc_id`` (global (conv_id, turn_idx) rank).

    Two-level prefix sum: per-conversation turn counts are range-partitioned
    by ``conv_id``; partition subtotals (one long per partition) come to the
    driver and go back as broadcast offsets. Inside a partition a window
    cumsum finishes the conversation offset; inside a conversation a
    ``row_number`` over ``turn_idx`` finishes the doc id. No global window,
    no skew (conversations are small), deterministic under re-runs.
    """
    spark = transcripts.sparkSession
    convs = (
        transcripts.groupBy("conv_id")
        .agg(F.count("*").alias("n_turns"))
        .repartitionByRange(n_range_parts, "conv_id")
        .sortWithinPartitions("conv_id")
        .withColumn("part_id", F.spark_partition_id())
        .persist()
    )
    subtotals = {
        r.part_id: r.s
        for r in convs.groupBy("part_id").agg(F.sum("n_turns").alias("s")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(subtotals):
        offsets.append((pid, acc))
        acc += subtotals[pid]
    off_df = spark.createDataFrame(offsets, "part_id int, part_offset long")
    w_part = (
        Window.partitionBy("part_id")
        .orderBy("conv_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    conv_offsets = (
        convs.join(F.broadcast(off_df), "part_id")
        .withColumn(
            "conv_offset",
            F.col("part_offset") + F.coalesce(F.sum("n_turns").over(w_part), F.lit(0)),
        )
        .select("conv_id", "conv_offset")
    )
    w_turn = Window.partitionBy("conv_id").orderBy("turn_idx")
    out = transcripts.join(conv_offsets, "conv_id").withColumn(
        "doc_id", (F.col("conv_offset") + F.row_number().over(w_turn) - 1).cast("long")
    )
    return out.drop("conv_offset")


def build_docs(transcripts: DataFrame) -> DataFrame:
    """Docs store: source row + doc_id + dl (JVM-side token count)."""
    with_ids = assign_doc_ids(transcripts)
    return with_ids.withColumn(
        "dl",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(SPARK_TOKEN_RE), 0)
        ),
    ).select("doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts", "dl")


def _chunk_builder(chunks_dir: str, prefix: str = ""):
    """applyInPandas kernel: one SPIMI chunk per stable partition id.

    Writes its own parquet + manifest with tmp→rename so a killed job leaves
    only complete partitions behind; returns the manifest row.
    """

    import pyarrow as pa
    import pyarrow.parquet as pq

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        part_id = int(pdf["part_id"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        inv: dict[str, list[list[int]]] = {}
        for i, toks in enumerate(tokenize_series(pdf["text"])):
            if not toks:
                continue
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            d, dl = int(doc_ids[i]), int(dls[i])
            for term, tf in counts.items():
                e = inv.get(term)
                if e is None:
                    inv[term] = [[d], [tf], [dl]]
                else:
                    e[0].append(d)
                    e[1].append(tf)
                    e[2].append(dl)

        terms = sorted(inv)
        rows = {
            "term": terms,
            "part_id": [part_id] * len(terms),
            "min_doc": [],
            "max_doc": [],
            "n_docs": [],
            "cf": [],
            "doc_ids": [],
            "tfs": [],
            "dls": [],
        }
        for term in terms:
            ds, tfs, ds_dl = inv[term]
            d = np.asarray(ds, dtype=np.int64)  # ascending: input doc-sorted
            rows["min_doc"].append(int(d[0]))
            rows["max_doc"].append(int(d[-1]))
            rows["n_docs"].append(len(d))
            rows["cf"].append(int(sum(tfs)))
            rows["doc_ids"].append(encode_doc_ids(d))
            rows["tfs"].append(encode_tfs(np.asarray(tfs, dtype=np.int64)))
            rows["dls"].append(encode_tfs(np.asarray(ds_dl, dtype=np.int64)))

        os.makedirs(chunks_dir, exist_ok=True)
        path = os.path.join(chunks_dir, f"{prefix}part-{part_id:05d}.parquet")
        tmp = path + f".tmp-{os.getpid()}"
        table = pa.table(
            rows,
            schema=pa.schema(
                [
                    ("term", pa.string()),
                    ("part_id", pa.int32()),
                    ("min_doc", pa.int64()),
                    ("max_doc", pa.int64()),
                    ("n_docs", pa.int32()),
                    ("cf", pa.int64()),
                    ("doc_ids", pa.binary()),
                    ("tfs", pa.binary()),
                    ("dls", pa.binary()),
                ]
            ),
        )
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, path)
        manifest = {
            "partition_id": part_id,
            "status": "done",
            "rows": int(len(pdf)),
            "n_terms": int(len(terms)),
            "wall_ms": int((time.time() - t0) * 1000),
            "attempt": 1,
        }
        mpath = os.path.join(chunks_dir, f"{prefix}part-{part_id:05d}.manifest.json")
        mtmp = mpath + f".tmp-{os.getpid()}"
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, mpath)
        return pd.DataFrame([manifest])

    return build


def completed_partitions(chunks_dir: str, prefix: str = "") -> set[int]:
    if not os.path.isdir(chunks_dir):
        return set()
    done = set()
    for name in os.listdir(chunks_dir):
        if name.startswith(f"{prefix}part-") and name.endswith(".manifest.json"):
            with open(os.path.join(chunks_dir, name)) as f:
                m = json.load(f)
            if m.get("status") == "done":
                done.add(int(m["partition_id"]))
    return done


def _chunk_builder_tf(chunks_dir: str, prefix: str = ""):
    """applyInPandas kernel over pre-counted (doc_id, dl, term, tf) rows.

    Tokenization and tf-counting happened JVM-side (whole-stage codegen);
    this kernel only sorts (pandas C sort), slices term runs, and varbyte-
    encodes — vectorized numpy throughout, no per-token Python. Writes the
    same chunk + manifest files as the python-tokenizer kernel.
    """

    import pyarrow as pa
    import pyarrow.parquet as pq

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        part_id = int(pdf["part_id"].iloc[0])
        n_rows_docs = int(pdf["doc_id"].nunique())
        pdf = pdf.sort_values(["term", "doc_id"], kind="stable")
        terms_arr = pdf["term"].to_numpy()
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        n = len(terms_arr)
        if n == 0:
            starts = np.array([], dtype=np.int64)
        else:
            change = np.concatenate(
                ([True], terms_arr[1:] != terms_arr[:-1])
            )
            starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        bounds = np.append(starts, n)

        # all-segments-at-once encoding (one vectorized pass per column)
        from .codec import encode_doc_id_segments, vb_encode_segments

        enc_ids = encode_doc_id_segments(ids, bounds)
        enc_tfs = vb_encode_segments(tfs, bounds)
        enc_dls = vb_encode_segments(dls, bounds)
        seg_cf = np.add.reduceat(tfs, starts) if n else np.array([], dtype=np.int64)

        rows = {
            "term": terms_arr[starts],
            "part_id": np.full(len(starts), part_id, dtype=np.int32),
            "min_doc": ids[starts],
            "max_doc": ids[ends - 1],
            "n_docs": (ends - starts).astype(np.int32),
            "cf": seg_cf.astype(np.int64),
            "doc_ids": enc_ids,
            "tfs": enc_tfs,
            "dls": enc_dls,
        }

        os.makedirs(chunks_dir, exist_ok=True)
        path = os.path.join(chunks_dir, f"{prefix}part-{part_id:05d}.parquet")
        tmp = path + f".tmp-{os.getpid()}"
        table = pa.table(
            rows,
            schema=pa.schema(
                [
                    ("term", pa.string()),
                    ("part_id", pa.int32()),
                    ("min_doc", pa.int64()),
                    ("max_doc", pa.int64()),
                    ("n_docs", pa.int32()),
                    ("cf", pa.int64()),
                    ("doc_ids", pa.binary()),
                    ("tfs", pa.binary()),
                    ("dls", pa.binary()),
                ]
            ),
        )
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, path)
        manifest = {
            "partition_id": part_id,
            "status": "done",
            "rows": n_rows_docs,
            "n_terms": int(len(starts)),
            "wall_ms": int((time.time() - t0) * 1000),
            "attempt": 1,
        }
        mpath = os.path.join(chunks_dir, f"{prefix}part-{part_id:05d}.manifest.json")
        mtmp = mpath + f".tmp-{os.getpid()}"
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, mpath)
        return pd.DataFrame([manifest])

    return build


def build_chunks(
    docs: DataFrame,
    chunks_dir: str,
    n_partitions: int,
    resume: bool = True,
    prefix: str = "",
    tokenizer: str = "jvm",
) -> DataFrame:
    """SPIMI pass. Returns the manifest DataFrame (one row per partition built).

    ``part_id = xxhash64(conv_id) % n_partitions`` is a pure function of the
    data, so a resumed run regenerates exactly the missing partitions.

    Two equivalent kernels (tests assert identical output):

    - ``tokenizer="jvm"`` (default): ``lower`` + ``regexp_extract_all`` +
      ``explode`` + ``groupBy(doc, term)`` run inside whole-stage codegen;
      the pandas kernel only slices and varbyte-encodes. Python never sees
      a token — this is the path that scales with cores.
    - ``tokenizer="python"``: the canonical Python analyzer inside the
      kernel (the pandas/Arrow-UDF spelling; same tokens by construction,
      proven by tests/test_algebra.py).
    """
    part = F.pmod(F.xxhash64("conv_id"), F.lit(n_partitions)).cast("int")
    done = completed_partitions(chunks_dir, prefix) if resume else set()

    if tokenizer == "python":
        src = docs.select(
            "doc_id", "conv_id", "text", "dl", part.alias("part_id")
        )
        if done:
            src = src.where(~F.col("part_id").isin([int(x) for x in done]))
        return src.groupBy("part_id").applyInPandas(
            _chunk_builder(chunks_dir, prefix), schema=MANIFEST_SCHEMA
        )

    toks = docs.select(
        "doc_id",
        "dl",
        part.alias("part_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(SPARK_TOKEN_RE), 0)
        ).alias("term"),
    )
    if done:
        toks = toks.where(~F.col("part_id").isin([int(x) for x in done]))
    tf = toks.groupBy("part_id", "doc_id", "dl", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    return tf.groupBy("part_id").applyInPandas(
        _chunk_builder_tf(chunks_dir, prefix), schema=MANIFEST_SCHEMA
    )


def _read_chunks(spark: SparkSession, chunks_dir: str, glob: str) -> DataFrame:
    """Chunk reader tolerant of an all-empty corpus (no token → no chunk
    files): returns an empty, correctly-typed relation instead of a
    path-not-found error."""
    import glob as globmod

    if not globmod.glob(os.path.join(chunks_dir, glob)):
        return spark.createDataFrame([], CHUNK_SCHEMA)
    return spark.read.parquet(os.path.join(chunks_dir, glob))


def build_term_stats(
    spark: SparkSession, chunks_dir: str, n_buckets: int, glob: str = "part-*.parquet"
) -> DataFrame:
    """terms(term, df, cf, bucket) from chunk rows (map-side combined sums)."""
    from .bucketing import bucket_expr

    chunks = _read_chunks(spark, chunks_dir, glob)
    return chunks.groupBy("term").agg(
        F.sum("n_docs").cast("long").alias("df"), F.sum("cf").alias("cf")
    ).withColumn("bucket", bucket_expr("term", n_buckets))


def _reblocker(avgdl: float):
    """applyInPandas kernel over one (bucket, sub, salt) group: merge every
    term's chunks into doc-ordered 128-posting blocks with exact block-max
    bounds. Fully vectorized across the whole group: chunks are decoded with
    ONE varbyte pass (segmented cumsum restores absolute doc ids), per-term
    doc order comes from one lexsort, and every block of every term is
    encoded with ONE segmented varbyte pass per column."""

    from .codec import encode_doc_id_segments, vb_decode, vb_encode_segments

    def reblock(key, pdf):
        bucket, salt = int(key[0]), int(key[-1])
        empty = {
            "term": [], "bucket": [], "salt": [], "block_id": [],
            "min_doc": [], "max_doc": [], "n_docs": [],
            "doc_ids": [], "tfs": [], "dls": [],
            "block_max_score": [], "max_tf": [], "min_dl": [],
        }
        if len(pdf) == 0:
            return pd.DataFrame(empty)
        pdf = pdf.sort_values(["term", "min_doc"], kind="stable")
        n_per_chunk = pdf["n_docs"].to_numpy(dtype=np.int64)
        chunk_bounds = np.zeros(len(pdf) + 1, dtype=np.int64)
        chunk_bounds[1:] = np.cumsum(n_per_chunk)
        n = int(chunk_bounds[-1])

        # batched decode: gaps of all chunks in one pass, then segmented
        # cumsum (each chunk's first gap is its absolute doc id)
        gaps = vb_decode(b"".join(pdf["doc_ids"]))
        total = np.cumsum(gaps)
        corrections = np.zeros(len(pdf), dtype=np.int64)
        corrections[1:] = total[chunk_bounds[1:-1] - 1]
        ids = total - np.repeat(corrections, n_per_chunk)
        tfs = vb_decode(b"".join(pdf["tfs"]))
        dls = vb_decode(b"".join(pdf["dls"]))

        # per-term doc order (chunk doc-ranges interleave across partitions)
        terms = pdf["term"].to_numpy()
        tchange = np.concatenate(([True], terms[1:] != terms[:-1]))
        term_gid = np.repeat(np.cumsum(tchange) - 1, n_per_chunk)
        order = np.lexsort((ids, term_gid))
        ids, tfs, dls = ids[order], tfs[order], dls[order]

        # value-index bounds per term, then per-128 block bounds per term
        term_first_chunk = np.flatnonzero(tchange)
        term_bounds = chunk_bounds[np.append(term_first_chunk, len(pdf))]
        term_names = terms[term_first_chunk]
        starts_list = [
            np.arange(term_bounds[i], term_bounds[i + 1], BLOCK_SIZE)
            for i in range(len(term_names))
        ]
        blk_starts = np.concatenate(starts_list)
        bounds = np.append(blk_starts, n)
        blk_ends = bounds[1:]
        blocks_per_term = np.array([len(s) for s in starts_list])

        contrib = tfs / (tfs + K1 * (1.0 - B + B * dls / avgdl))
        out = {
            "term": np.repeat(term_names, blocks_per_term),
            "bucket": np.full(len(blk_starts), bucket, dtype=np.int32),
            "salt": np.full(len(blk_starts), salt, dtype=np.int32),
            "block_id": np.concatenate(
                [np.arange(k, dtype=np.int32) for k in blocks_per_term]
            ),
            "min_doc": ids[blk_starts],
            "max_doc": ids[blk_ends - 1],
            "n_docs": (blk_ends - blk_starts).astype(np.int32),
            "doc_ids": encode_doc_id_segments(ids, bounds),
            "tfs": vb_encode_segments(tfs, bounds),
            "dls": vb_encode_segments(dls, bounds),
            # exact bound at build-time avgdl (diagnostics/tests); the query
            # path recomputes a drift-safe bound from (max_tf, min_dl)
            "block_max_score": np.maximum.reduceat(contrib, blk_starts),
            "max_tf": np.maximum.reduceat(tfs, blk_starts).astype(np.int32),
            "min_dl": np.minimum.reduceat(dls, blk_starts).astype(np.int32),
        }
        return pd.DataFrame(out)

    return reblock


def build_postings(
    spark: SparkSession,
    chunks_dir: str,
    terms: DataFrame,
    avgdl: float,
    n_buckets: int,
    n_salts: int = 8,
    heavy_df_threshold: int = 10_000,
    glob: str = "part-*.parquet",
) -> DataFrame:
    """Salted compaction merge (B3) → final block table.

    Heavy terms (df > threshold) are split into ``n_salts`` sub-streams by
    ``xxhash64(min_doc)`` so no single merge group holds a stop-word's whole
    posting list; each doc is in exactly one sub-stream, so query-time BM25
    sums are unaffected (streams of one term just add).
    """
    from .bucketing import bucket_expr

    chunks = _read_chunks(spark, chunks_dir, glob)
    heavy = terms.where(F.col("df") > heavy_df_threshold).select(
        "term", F.lit(True).alias("is_heavy")
    )
    salted = (
        chunks.join(F.broadcast(heavy), "term", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_heavy"),
                F.pmod(F.xxhash64("min_doc"), F.lit(n_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("is_heavy")
        .withColumn("bucket", bucket_expr("term", n_buckets))
        # sub-split within a bucket (a term maps to exactly one sub) so merge
        # parallelism is n_buckets × MERGE_SUBSPLIT, independent of the
        # bucket count chosen for query pruning
        .withColumn("sub", F.pmod(F.xxhash64("term"), F.lit(MERGE_SUBSPLIT)))
    )
    return salted.groupBy("bucket", "sub", "salt").applyInPandas(
        _reblocker(avgdl), schema=BLOCK_SCHEMA
    )


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    n_partitions: int = 32,
    n_buckets: int = 16,
    n_salts: int = 8,
    heavy_df_threshold: int = 10_000,
    resume: bool = True,
    tokenizer: str = "jvm",
) -> dict:
    """Full snapshot build (reference entry point 1, SURVEY.md §3.1).

    Returns a summary dict with stage timings (also appended to the metrics
    table — the analog of the reference's tpq/lag stats, A24).
    """
    paths = IndexPaths(index_dir)
    metrics: list[tuple[str, str, float]] = []

    t0 = time.time()
    docs = build_docs(transcripts)
    # snappy: the docs store is a full corpus copy — compression CPU would
    # dominate this stage; the read-heavy postings stay zstd
    docs.write.mode("overwrite").option("compression", "snappy").parquet(paths.docs)
    docs = spark.read.parquet(paths.docs)
    metrics.append(("docs", "wall_s", time.time() - t0))

    t1 = time.time()
    n_docs, avgdl, total_tokens = docs.agg(
        F.count("*"), F.avg("dl"), F.sum("dl")
    ).first()
    avgdl = float(avgdl or 0.0)
    spark.createDataFrame(
        [(int(n_docs), avgdl, int(total_tokens or 0))],
        "n_docs long, avgdl double, total_tokens long",
    ).write.mode("overwrite").parquet(paths.stats)
    metrics.append(("stats", "wall_s", time.time() - t1))

    t2 = time.time()
    manifest = build_chunks(
        docs, paths.chunks, n_partitions, resume=resume, tokenizer=tokenizer
    )
    built = manifest.count()  # action: runs the SPIMI pass
    metrics.append(("spimi", "wall_s", time.time() - t2))
    metrics.append(("spimi", "partitions_built", float(built)))

    t3 = time.time()
    terms = build_term_stats(spark, paths.chunks, n_buckets)
    terms.write.mode("overwrite").parquet(paths.terms)
    terms = spark.read.parquet(paths.terms)
    metrics.append(("terms", "wall_s", time.time() - t3))

    t4 = time.time()
    postings = build_postings(
        spark,
        paths.chunks,
        terms,
        avgdl,
        n_buckets,
        n_salts=n_salts,
        heavy_df_threshold=heavy_df_threshold,
    )
    postings.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(paths.postings)
    metrics.append(("postings", "wall_s", time.time() - t4))

    meta = {
        "n_buckets": n_buckets,
        "n_salts": n_salts,
        "n_partitions": n_partitions,
        "heavy_df_threshold": heavy_df_threshold,
        "block_size": BLOCK_SIZE,
        "n_docs": int(n_docs),
        "avgdl": avgdl,
        "format_version": 1,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)

    wall = time.time() - t0
    metrics.append(("build", "wall_s", wall))
    metrics.append(("build", "docs_per_s", float(n_docs) / max(wall, 1e-9)))
    mdf = spark.createDataFrame(
        [(s, k, v) for s, k, v in metrics], "stage string, key string, value double"
    ).withColumn("ts", F.current_timestamp())
    mdf.write.mode("append").parquet(paths.metrics)

    return {
        "n_docs": int(n_docs),
        "avgdl": avgdl,
        "wall_s": wall,
        "docs_per_s": float(n_docs) / max(wall, 1e-9),
        "partitions_built": int(built),
    }
