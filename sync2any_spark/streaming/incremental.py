"""Incremental index maintenance — the CDC half of the reference, Spark-first.

The reference applies binlog changes row-at-a-time as ES upserts/deletes by
``_id`` (``load/impl/EsLoadServiceImpl.java:51-110``); redelivery is
tolerated because upserts are idempotent. Our batch analog follows the
Lucene segment model:

- an increment batch (transcripts columns + ``op`` I/U/D) is first reduced
  to its *effective* rows — unchanged upserts (null-safe compare over text,
  role, tool, ts) and deletes of absent keys drop out, which is exactly what
  makes re-applying a batch a no-op (idempotence test F4);
- updates/deletes tombstone the old ``doc_id`` (deletes table = Lucene
  live-docs); inserts/updates append fresh doc ids ABOVE the current max —
  ids are never reused, so all existing postings stay valid;
- new rows are tokenized into a delta segment (same SPIMI path, prefixed
  chunk files) whose postings land in a segment-owned dir: delta doc ids
  sort strictly after base ids, so every (term, salt) stream stays
  doc-ordered;
- terms/stats tables are maintained *exactly* (old ± added ∓ removed, with
  removed term counts recomputed from the tombstoned rows' stored text), so
  BM25 over the live corpus stays rank-identical to a fresh build — unlike
  Lucene, which lets df drift until merge;
- ``compact()`` rebuilds the index from the live docs (force-merge analog),
  purging tombstones and re-densifying doc ids.

Crash atomicity (the write-ahead shape the reference gets from ES bulk
acks + Kafka offset commits, ``extract/KafkaMsgListener.java:312-330``):
every artifact of segment N — postings_segs/segN, docs_segs/segN,
deletes_segs/segN, terms_vN, stats_vN — is written with deterministic names
and ``overwrite`` mode, and readers resolve ONLY through ``meta.json``
(``segments`` + ``terms_version``). The single atomic ``os.replace`` of
meta.json is the commit point: a crash anywhere before it leaves the index
exactly at the previous commit, and a retry of the same batch overwrites
the orphaned segment artifacts in place (no duplicate postings, no double
counting — tested by killing the apply before commit).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.builder import (
    IndexPaths,
    build_chunks,
    build_index,
    build_postings,
    build_term_stats,
    deletes_sources,
    docs_sources,
    read_index_meta,
)
from ..query.algebra import SPARK_TOKEN_RE, term_stats


# batches at or below this row count rank their fresh doc ids driver-side
# (one 2-column toPandas + a broadcast id map); larger backfills use the
# distributed two-level prefix sum
DRIVER_RANK_ROWS = int(os.environ.get("SPARK_GRAFT_DRIVER_RANK_ROWS", 1_000_000))


def _write_meta(index_dir: str, meta: dict) -> None:
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))


def all_docs(spark: SparkSession, index_dir: str, meta: "dict | None" = None) -> DataFrame:
    """Docs store including tombstoned rows (base + committed segments)."""
    from ..index.builder import DOCS_SCHEMA

    meta = meta or read_index_meta(index_dir)
    dirs = docs_sources(index_dir, meta)
    if not dirs:
        return spark.createDataFrame([], DOCS_SCHEMA)
    from functools import reduce

    parts = [spark.read.parquet(d) for d in dirs]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)


def deleted_ids(spark: SparkSession, index_dir: str, meta: "dict | None" = None) -> "DataFrame | None":
    meta = meta or read_index_meta(index_dir)
    dirs = deletes_sources(index_dir, meta)
    if not dirs:
        return None
    from functools import reduce

    parts = [spark.read.parquet(d) for d in dirs]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), parts)


def live_docs(spark: SparkSession, index_dir: str) -> DataFrame:
    """Docs store minus tombstones (the queryable corpus)."""
    meta = read_index_meta(index_dir)
    docs = all_docs(spark, index_dir, meta)
    dead = deleted_ids(spark, index_dir, meta)
    if dead is not None:
        docs = docs.join(dead, "doc_id", "left_anti")
    return docs


def read_segment_changes(
    spark: SparkSession,
    index_dir: str,
    after_segment: int = 0,
    until_segment: "int | None" = None,
) -> "tuple[DataFrame, DataFrame]":
    """Snapshot-range incremental read (the Iceberg ``incremental read
    between snapshots`` analog, SURVEY §3.2): (added docs, tombstoned ids)
    committed strictly after ``after_segment`` up to ``until_segment``.

    Parity argument (SCALE.md §Iceberg): ``meta.json['segments']`` is the
    snapshot log and the atomic meta.json replace is the metadata-pointer
    swap — exactly Iceberg's commit protocol; every segment's data files
    are immutable once committed, so a range read is a plain union of the
    in-range segment dirs with no visibility races.
    """
    from functools import reduce

    from ..index.builder import DOCS_SCHEMA

    meta = read_index_meta(index_dir)
    paths = IndexPaths(index_dir)
    segs = [
        s for s in meta.get("segments", [])
        if s > after_segment and (until_segment is None or s <= until_segment)
    ]
    doc_dirs = [paths.docs_seg(s) for s in segs]
    del_dirs = [paths.deletes_seg(s) for s in segs]
    doc_dirs = [d for d in doc_dirs if os.path.isdir(d)]
    del_dirs = [d for d in del_dirs if os.path.isdir(d)]
    added = (
        reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True),
            [spark.read.parquet(d) for d in doc_dirs],
        )
        if doc_dirs
        else spark.createDataFrame([], DOCS_SCHEMA)
    )
    removed = (
        reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True),
            [spark.read.parquet(d) for d in del_dirs],
        )
        if del_dirs
        else spark.createDataFrame([], "doc_id long")
    )
    return added, removed


def _term_freq_stats(texts) -> pd.DataFrame:
    """(term, d_df, d_cf) for one batch of raw texts — the per-partition
    kernel of the removed-rows stat pass. Byte-level tokenizer when the
    bytes allow it, regex fallback otherwise; no chunk encode, no per-token
    Python strings on the fast path."""
    import pyarrow as pa

    from ..tokenize import tokenize_arrow_codes, tokenize_series

    col = pa.array(texts, pa.string(), from_pandas=True)
    empty = pd.DataFrame(
        {"term": pd.Series([], dtype=object),
         "d_df": pd.Series([], dtype=np.int64),
         "d_cf": pd.Series([], dtype=np.int64)}
    )
    fast = tokenize_arrow_codes(col)
    if fast is not None:
        codes, doc_lens, uniq = fast
        if codes.size == 0:
            return empty
        row_pos = np.repeat(
            np.arange(len(doc_lens), dtype=np.int32), doc_lens
        )
        order = np.argsort(codes.astype(np.int32), kind="stable")
        c_s, r_s = codes[order], row_pos[order]
        pch = np.concatenate(
            ([True], (c_s[1:] != c_s[:-1]) | (r_s[1:] != r_s[:-1]))
        )
        pstarts = np.flatnonzero(pch)
        tf = np.diff(np.append(pstarts, c_s.size))
        t_code = c_s[pstarts]
        tch = np.concatenate(([True], t_code[1:] != t_code[:-1]))
        ts_ = np.flatnonzero(tch)
        return pd.DataFrame(
            {
                "term": uniq[t_code[ts_]],
                "d_df": np.diff(np.append(ts_, t_code.size)).astype(np.int64),
                "d_cf": np.add.reduceat(tf, ts_).astype(np.int64),
            }
        )
    agg: "dict[str, list[int]]" = {}
    for toks in tokenize_series(pd.Series(texts)):
        seen: dict[str, int] = {}
        for t in toks:
            seen[t] = seen.get(t, 0) + 1
        for t, c in seen.items():
            e = agg.get(t)
            if e is None:
                agg[t] = [1, c]
            else:
                e[0] += 1
                e[1] += c
    if not agg:
        return empty
    terms = sorted(agg)
    return pd.DataFrame(
        {
            "term": np.asarray(terms, dtype=object),
            "d_df": np.asarray([agg[t][0] for t in terms], dtype=np.int64),
            "d_cf": np.asarray([agg[t][1] for t in terms], dtype=np.int64),
        }
    )


# old terms tables at or below this row count (parquet footer metadata)
# update driver-side in pandas — one pyarrow read + merge instead of a
# full-outer sort-merge join and a distributed rewrite whose cost grows
# with the INDEX vocabulary, not the batch
TERMS_UPDATE_DRIVER_ROWS = int(
    os.environ.get("SPARK_GRAFT_TERMS_UPDATE_DRIVER_ROWS", 5_000_000)
)


def _terms_table_rows(terms_dir: str) -> "int | None":
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    try:
        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in ds.dataset(terms_dir).files
        )
    except Exception:
        return None


def _update_terms_driver(
    old_dir: str, delta: pd.DataFrame, n_buckets: int, out_dir: str
) -> bool:
    """terms_v(segment) = old terms ± delta, computed driver-side. Returns
    False when the old table exceeds the driver budget (callers fall back
    to the distributed full-outer join)."""
    import pyarrow.dataset as ds

    from ..index.builder import write_terms_driver
    from ..index.bucketing import bucket_of

    rows = _terms_table_rows(old_dir)
    if rows is None or rows > TERMS_UPDATE_DRIVER_ROWS:
        return False
    old = (
        ds.dataset(old_dir)
        .to_table(columns=["term", "df", "cf", "bucket"])
        .to_pandas()
    )
    m = old.merge(delta, on="term", how="outer")
    df = m["df"].fillna(0).astype(np.int64) + m["d_df"].fillna(0).astype(np.int64)
    cf = m["cf"].fillna(0).astype(np.int64) + m["d_cf"].fillna(0).astype(np.int64)
    keep = df > 0
    out = pd.DataFrame(
        {
            "term": m["term"][keep],
            "df": df[keep],
            "cf": cf[keep],
            "bucket": m["bucket"][keep],
        }
    )
    new_mask = out["bucket"].isna()
    if new_mask.any():
        out.loc[new_mask, "bucket"] = [
            bucket_of(t, n_buckets) for t in out.loc[new_mask, "term"]
        ]
    out["bucket"] = out["bucket"].astype(np.int32)
    out = out.sort_values("term", kind="stable").reset_index(drop=True)
    write_terms_driver(out, out_dir)
    return True


def _write_deletes_driver(out_dir: str, doc_ids: np.ndarray) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "part-00000.parquet")
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(
        pa.table({"doc_id": pa.array(np.sort(doc_ids), pa.int64())}),
        tmp,
        compression="zstd",
    )
    os.replace(tmp, path)
    for n in os.listdir(out_dir):  # stale files from a crashed Spark write
        if n.endswith(".parquet") and n != "part-00000.parquet":
            try:
                os.remove(os.path.join(out_dir, n))
            except OSError:
                pass


def apply_increments(
    spark: SparkSession, index_dir: str, increments: DataFrame
) -> dict:
    """Apply one I/U/D batch (SURVEY.md §3.2 analog). Returns summary stats.

    Batch contract (mirrors one-binlog-row-per-message): at most one op per
    (conv_id, turn_idx) — enforced, because apply order within a batch would
    otherwise be undefined.

    Two physical strategies, same logical output (round 6):

    - batches ≤ DRIVER_RANK_ROWS: the docs store is SCANNED once and never
      shuffled (broadcast-inner of the batch keys against the live store,
      then a batch-sized left join); every per-row decision column comes to
      the driver in ONE narrow collect; removed-row stat deltas reuse the
      STORED dl column (never recomputed — ADVICE r5 #5 fix) plus one
      tokenize pass over just the removed texts; the added side's stat
      deltas are read from the delta-segment SPIMI manifests/chunks, so
      changed rows are tokenized exactly ONCE (r5 VERDICT Next #1); the
      terms table updates driver-side under a row budget; stats, deletes
      and metrics write via pyarrow (no Spark job); the independent docs/
      chunk/removed-stat jobs overlap on driver threads (guide §2.6).
    - larger backfills: the distributed path (shuffle join + signed
      tokenize union + full-outer terms join), whose every stage scales
      out.
    """
    paths = IndexPaths(index_dir)
    meta = read_index_meta(index_dir)
    t0 = time.time()
    laps: dict[str, float] = {}
    _last = [t0]

    def _lap(name: str) -> None:
        now = time.time()
        laps[name] = round(now - _last[0], 3)
        _last[0] = now

    shape = increments.agg(
        F.count("*").alias("n"),
        F.countDistinct("conv_id", "turn_idx").alias("k"),
        F.min("conv_id").alias("key_lo"),
        F.max("conv_id").alias("key_hi"),
    ).first()
    n_batch, n_keys = int(shape.n), int(shape.k)
    if n_batch != n_keys:
        raise ValueError(
            f"{n_batch - n_keys} keys appear more than once in the batch"
        )
    if n_batch == 0:
        return {"tombstones": 0, "new_docs": 0, "segment": None, "wall_s": 0.0}
    if n_batch > DRIVER_RANK_ROWS:
        return _apply_increments_distributed(
            spark, index_dir, increments, paths, meta, t0, laps, _lap
        )

    live = live_docs(spark, index_dir).select(
        "conv_id", "turn_idx", F.col("doc_id").alias("old_doc_id"),
        F.col("text").alias("cur_text"), F.col("role").alias("cur_role"),
        F.col("tool").alias("cur_tool"), F.col("ts").alias("cur_ts"),
        F.col("dl").alias("cur_dl"),
    )
    # zone-map pruning of the ONE full-store scan (guide §6): every join
    # match has conv_id inside the batch's key range, so this BETWEEN is
    # implied by the inner join — it changes nothing semantically but
    # pushes to the parquet scan, where the conv-sorted store's row-group
    # min/max stats skip everything outside the range. Clustered batches
    # (binlog order tracks key ranges in time-ordered tables) scan a few
    # %% of the store; a uniform batch spans the range and prunes nothing.
    live = live.where(F.col("conv_id").between(shape.key_lo, shape.key_hi))
    # broadcast-inner: the live store streams past the batch's hashed keys
    # (BroadcastHashJoin — no shuffle, no sort of the corpus), leaving a
    # batch-sized matched relation; the left join against it is
    # batch × batch
    matched = live.join(
        F.broadcast(increments.select("conv_id", "turn_idx")),
        ["conv_id", "turn_idx"],
        "inner",
    )
    joined = increments.join(matched, ["conv_id", "turn_idx"], "left").persist()

    unchanged = (
        F.col("cur_text").eqNullSafe(F.col("text"))
        & F.col("cur_role").eqNullSafe(F.col("role"))
        & F.col("cur_tool").eqNullSafe(F.col("tool"))
        & F.col("cur_ts").eqNullSafe(F.col("ts"))
    )
    # ONE narrow collect materializes the cache and carries every per-row
    # decision: op, match, changedness, old id, stored dl
    flags = joined.select(
        "conv_id", "turn_idx", "op",
        F.col("old_doc_id"),
        unchanged.alias("same"),
        F.col("cur_dl"),
    ).toPandas()
    has_old = flags["old_doc_id"].notna()
    same = flags["same"].fillna(False).astype(bool)
    is_del = (flags["op"] == "D") & has_old
    is_up = (flags["op"] != "D") & (~has_old | ~same)
    removed_mask = has_old & (is_del | is_up)
    tomb_ids = flags.loc[removed_mask, "old_doc_id"].to_numpy(dtype=np.int64)
    n_tombstones = int(removed_mask.sum())
    n_new = int(is_up.sum())
    removed_n = n_tombstones
    removed_tok = int(flags.loc[removed_mask, "cur_dl"].fillna(0).sum())
    _lap("join_and_tombstones")

    if n_tombstones == 0 and n_new == 0:
        joined.unpersist()
        return {"tombstones": 0, "new_docs": 0, "segment": None, "wall_s": 0.0}

    segment = int(meta.get("last_segment", 0)) + 1

    # fresh doc ids above the high-water mark, ranked driver-side from the
    # flags already in hand (no extra job)
    next_id = meta.get("next_doc_id")
    if next_id is None:
        max_doc = all_docs(spark, index_dir, meta).agg(F.max("doc_id")).first()[0]
        next_id = int(max_doc) + 1 if max_doc is not None else 0
    kp = (
        flags.loc[is_up, ["conv_id", "turn_idx"]]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    kp["doc_id"] = kp.index.to_numpy(dtype="int64") + int(next_id)
    upserts = joined.where(
        (F.col("op") != "D") & (F.col("old_doc_id").isNull() | ~unchanged)
    )
    new_docs = (
        upserts.join(
            F.broadcast(spark.createDataFrame(kp)), ["conv_id", "turn_idx"]
        )
        .withColumn(
            "dl",
            F.coalesce(
                F.size(
                    F.regexp_extract_all(
                        F.lower(F.col("text")), F.lit(SPARK_TOKEN_RE), 0
                    )
                ),
                F.lit(0),
            ),
        )
        .select("doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts", "dl")
        .persist()
    ) if n_new else None
    _lap("new_doc_ids")

    # --- delta segment + removed-row stats, independent jobs overlapped ---
    prefix = f"seg{segment:03d}-"
    import glob as globmod

    for stale in globmod.glob(os.path.join(paths.chunks, f"{prefix}*")):
        os.remove(stale)
    store_pos = bool(meta.get("store_positions", False))
    n_delta_parts = max(1, min(int(meta["n_partitions"]), n_new // 4000 + 1))
    from concurrent.futures import ThreadPoolExecutor

    from ..index.builder import (
        append_metrics_driver,
        build_postings_direct,
        build_term_stats_driver,
        read_manifests,
        write_stats_driver,
    )

    def job_chunks():
        if n_new == 0:
            return
        manifest = build_chunks(
            new_docs, paths.chunks, n_delta_parts, resume=True, prefix=prefix,
            tokenizer="pandas", store_positions=store_pos,
            n_buckets=int(meta["n_buckets"]),
        )
        manifest.count()

    def job_docs_seg():
        if n_new == 0:
            import shutil as _sh

            _sh.rmtree(paths.docs_seg(segment), ignore_errors=True)
            return
        new_docs.write.mode("overwrite").parquet(paths.docs_seg(segment))

    def job_removed_stats() -> pd.DataFrame:
        if n_tombstones == 0:
            return pd.DataFrame(
                {"term": pd.Series([], dtype=object),
                 "d_df": pd.Series([], dtype=np.int64),
                 "d_cf": pd.Series([], dtype=np.int64)}
            )
        removed_texts = joined.where(
            F.col("old_doc_id").isNotNull()
            & ((F.col("op") == "D") | ~unchanged)
        ).select(F.col("cur_text").alias("text"))

        def kern(batches):
            for pdf in batches:
                out = _term_freq_stats(pdf["text"])
                if len(out):
                    yield out

        return (
            removed_texts.mapInPandas(
                kern, schema="term string, d_df long, d_cf long"
            )
            .groupBy("term")
            .agg(F.sum("d_df").alias("d_df"), F.sum("d_cf").alias("d_cf"))
            .toPandas()
        )

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_chunks = pool.submit(job_chunks)
        f_docs = pool.submit(job_docs_seg)
        f_removed = pool.submit(job_removed_stats)
        f_chunks.result()
        removed_stats = f_removed.result()

        # added-side stats from the delta chunks (tokenized ONCE, above)
        delta_glob = f"{prefix}part-*.parquet"
        delta_terms_pdf = build_term_stats_driver(
            paths.chunks, meta["n_buckets"], glob=delta_glob
        )
        if delta_terms_pdf is None:  # over-budget delta: distributed agg
            delta_terms_pdf = (
                build_term_stats(
                    spark, paths.chunks, meta["n_buckets"], glob=delta_glob
                ).toPandas()
            )
        mans = read_manifests(paths.chunks, prefix) if n_new else []
        added_tok = int(sum(m.get("sum_dl", 0) for m in mans))

        # --- stats (exact, no job) ---------------------------------------
        import pyarrow.dataset as pads

        st = (
            pads.dataset(paths.stats_v(meta.get("terms_version", 0)))
            .to_table()
            .to_pandas()
            .iloc[0]
        )
        n_docs_live = int(st.n_docs) - removed_n + n_new
        total_tokens = int(st.total_tokens) - removed_tok + added_tok
        avgdl = total_tokens / n_docs_live if n_docs_live else 0.0
        write_stats_driver(
            paths.stats_v(segment), n_docs_live, avgdl, total_tokens
        )

        # --- terms table: old ± (added from chunks, removed from pass) ---
        delta = (
            delta_terms_pdf.rename(columns={"df": "d_df", "cf": "d_cf"})[
                ["term", "d_df", "d_cf"]
            ]
            if len(delta_terms_pdf)
            else pd.DataFrame(
                {"term": pd.Series([], dtype=object),
                 "d_df": pd.Series([], dtype=np.int64),
                 "d_cf": pd.Series([], dtype=np.int64)}
            )
        )
        if len(removed_stats):
            removed_stats = removed_stats.copy()
            removed_stats["d_df"] = -removed_stats["d_df"]
            removed_stats["d_cf"] = -removed_stats["d_cf"]
            delta = (
                pd.concat([delta, removed_stats], ignore_index=True)
                .groupby("term", sort=False, as_index=False)
                .sum()
            )
        old_terms_dir = paths.terms_v(meta.get("terms_version", 0))
        if not _update_terms_driver(
            old_terms_dir, delta, meta["n_buckets"], paths.terms_v(segment)
        ):
            from ..index.bucketing import bucket_expr

            delta_df = spark.createDataFrame(
                delta, schema="term string, d_df long, d_cf long"
            )
            old_terms = spark.read.parquet(old_terms_dir)
            new_terms = (
                old_terms.select("term", "df", "cf")
                .join(delta_df, "term", "full")
                .select(
                    "term",
                    (
                        F.coalesce(F.col("df"), F.lit(0))
                        + F.coalesce(F.col("d_df"), F.lit(0))
                    ).alias("df"),
                    (
                        F.coalesce(F.col("cf"), F.lit(0))
                        + F.coalesce(F.col("d_cf"), F.lit(0))
                    ).alias("cf"),
                )
                .where(F.col("df") > 0)
                .withColumn("bucket", bucket_expr("term", meta["n_buckets"]))
            )
            new_terms.write.mode("overwrite").parquet(paths.terms_v(segment))
        _lap("term_deltas_and_stats")

        # --- delta postings: zero-shuffle direct merge into the seg dir ---
        if n_new:
            delta_terms_df = spark.createDataFrame(
                delta_terms_pdf,
                schema="term string, df long, cf long, bucket int",
            )
            build_postings_direct(
                spark,
                paths.chunks,
                delta_terms_df,
                avgdl,
                meta["n_buckets"],
                paths.postings_seg(segment),
                n_salts=meta["n_salts"],
                heavy_df_threshold=meta["heavy_df_threshold"],
                glob=delta_glob,
                store_positions=store_pos,
            )
        else:
            import shutil as _sh

            _sh.rmtree(paths.postings_seg(segment), ignore_errors=True)
        _lap("delta_postings")

        # --- segment deletes (driver write) + docs write join -------------
        _write_deletes_driver(paths.deletes_seg(segment), tomb_ids)
        f_docs.result()
        _lap("segment_writes")

    # --- COMMIT: one atomic meta.json replace ------------------------------
    meta["segments"] = meta.get("segments", []) + [segment]
    meta["terms_version"] = segment
    meta["last_segment"] = segment
    meta["n_docs"] = n_docs_live
    meta["avgdl"] = avgdl
    meta["next_doc_id"] = int(next_id) + int(n_new)
    _write_meta(index_dir, meta)

    wall = time.time() - t0
    append_metrics_driver(
        paths.metrics,
        [
            ("increment", "segment", float(segment)),
            ("increment", "tombstones", float(n_tombstones)),
            ("increment", "new_docs", float(n_new)),
            ("increment", "wall_s", wall),
        ],
    )
    joined.unpersist()
    if new_docs is not None:
        new_docs.unpersist()
    return {
        "tombstones": n_tombstones,
        "new_docs": n_new,
        "segment": segment,
        "wall_s": wall,
        "stage_walls": laps,
    }


def _apply_increments_distributed(
    spark: SparkSession,
    index_dir: str,
    increments: DataFrame,
    paths: IndexPaths,
    meta: dict,
    t0: float,
    laps: "dict[str, float]",
    _lap,
) -> dict:
    """Backfill-scale path: every stage distributed (shuffle join, signed
    tokenize union, full-outer terms join) — the round-5 shape."""
    live = live_docs(spark, index_dir).select(
        "conv_id", "turn_idx", F.col("doc_id").alias("old_doc_id"),
        F.col("text").alias("cur_text"), F.col("role").alias("cur_role"),
        F.col("tool").alias("cur_tool"), F.col("ts").alias("cur_ts"),
        F.col("dl").alias("cur_dl"),
    )
    joined = increments.join(live, ["conv_id", "turn_idx"], "left").persist()

    # effective rows (idempotence): D of absent key → no-op; I/U identical to
    # the stored row → no-op (the ES docAsUpsert equivalence check). The
    # compare is null-safe (a NULL text must not silently drop the op) and
    # covers the non-text columns too: a role/tool/ts-only change is
    # rank-neutral but must rewrite the doc row or fetch() serves stale data.
    unchanged = (
        F.col("cur_text").eqNullSafe(F.col("text"))
        & F.col("cur_role").eqNullSafe(F.col("role"))
        & F.col("cur_tool").eqNullSafe(F.col("tool"))
        & F.col("cur_ts").eqNullSafe(F.col("ts"))
    )
    deletes_new = joined.where(
        (F.col("op") == "D") & F.col("old_doc_id").isNotNull()
    ).select(F.col("old_doc_id").alias("doc_id"))
    upserts = joined.where(
        (F.col("op") != "D") & (F.col("old_doc_id").isNull() | ~unchanged)
    )
    tombstoned_updates = upserts.where(F.col("old_doc_id").isNotNull()).select(
        F.col("old_doc_id").alias("doc_id")
    )
    all_tombstones = deletes_new.union(tombstoned_updates).persist()
    n_tombstones = all_tombstones.count()
    _lap("join_and_tombstones")

    # fresh doc ids above the current max — never reused. Batch-internal
    # rank comes from the same scalable two-level prefix sum the snapshot
    # build uses (assign_doc_ids), so arbitrarily large backfill batches
    # don't funnel through a single-partition window. The id high-water
    # mark rides in meta.json (round 5) — the snapshot build and every
    # commit maintain it, so no full docs-store scan prices the next id;
    # the agg below is only the migration fallback for pre-round-5 metas.
    from ..index.builder import assign_doc_ids

    next_id = meta.get("next_doc_id")
    if next_id is None:
        max_doc = all_docs(spark, index_dir, meta).agg(F.max("doc_id")).first()[0]
        next_id = int(max_doc) + 1 if max_doc is not None else 0
    ups = upserts.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    n_new = ups.count()  # cached parent — also prices the rank path below
    if 0 < n_new <= DRIVER_RANK_ROWS:
        # typical CDC batch: rank the (conv_id, turn_idx) keys driver-side
        # (one toPandas of two columns) and broadcast the id map back —
        # the distributed two-level prefix sum costs ~3 s of job overhead
        # for a 40k-row batch
        kp = ups.select("conv_id", "turn_idx").toPandas()
        kp = kp.sort_values(
            ["conv_id", "turn_idx"], kind="stable"
        ).reset_index(drop=True)
        kp["doc_id"] = kp.index.to_numpy(dtype="int64") + int(next_id)
        ids_df = spark.createDataFrame(kp)
        with_ids = ups.join(F.broadcast(ids_df), ["conv_id", "turn_idx"])
    else:
        # backfill-scale batches: the same scalable two-level prefix sum
        # the snapshot build uses — never a single-partition window
        with_ids = assign_doc_ids(ups).withColumn(
            "doc_id", (F.col("doc_id") + F.lit(next_id)).cast("long")
        )
    new_docs = (
        with_ids
        .withColumn(
            "dl",
            # coalesce: a NULL text is ZERO tokens, matching the snapshot
            # writer (ADVICE r5 #5 — size(NULL) is NULL and would drift
            # total_tokens/avgdl on a later tombstone of this row)
            F.coalesce(
                F.size(
                    F.regexp_extract_all(
                        F.lower(F.col("text")), F.lit(SPARK_TOKEN_RE), 0
                    )
                ),
                F.lit(0),
            ),
        )
        .select("doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts", "dl")
        .persist()
    )
    _lap("new_doc_ids")

    if n_tombstones == 0 and n_new == 0:
        joined.unpersist()
        all_tombstones.unpersist()
        new_docs.unpersist()
        return {"tombstones": 0, "new_docs": 0, "segment": None, "wall_s": 0.0}

    segment = int(meta.get("last_segment", 0)) + 1

    # --- term/stat deltas (exact live maintenance) -----------------------
    # the tombstoned rows' stored text already sits in the CACHED join
    # (cur_* columns) — deriving removed stats from it kills two full
    # docs-store scans per apply (round 5). dl is the STORED column
    # itself (ADVICE r5 #5: recomputing via size(regexp_extract_all(...))
    # disagrees with the writer on NULL text), so the stat deltas match
    # the store by construction.
    removed_rows = joined.where(
        F.col("old_doc_id").isNotNull()
        & ((F.col("op") == "D") | ~unchanged)
    ).select(
        F.col("old_doc_id").alias("doc_id"),
        F.col("cur_text").alias("text"),
        F.col("cur_dl").alias("dl"),
    )
    # one signed tokenize pass over removed ∪ added (a doc id is on exactly
    # one side — tombstoned ids are never reused), one join against the old
    # terms table: halves the delta-stat jobs (round 5)
    signed = (
        removed_rows.select("doc_id", "text", "dl")
        .withColumn("sign", F.lit(-1))
        .unionByName(
            new_docs.select("doc_id", "text", "dl").withColumn("sign", F.lit(1))
        )
        .persist()
    )
    from ..query.algebra import term_freqs

    delta_stats = (
        term_freqs(signed, ["doc_id", "sign"])
        .groupBy("term")
        .agg(
            F.sum("sign").alias("d_df"),
            F.sum(F.col("sign") * F.col("tf")).alias("d_cf"),
        )
    )
    old_terms = spark.read.parquet(paths.terms_v(meta.get("terms_version", 0)))
    from ..index.bucketing import bucket_expr

    new_terms = (
        old_terms.select("term", "df", "cf")
        .join(delta_stats, "term", "full")
        .select(
            "term",
            (
                F.coalesce(F.col("df"), F.lit(0))
                + F.coalesce(F.col("d_df"), F.lit(0))
            ).alias("df"),
            (
                F.coalesce(F.col("cf"), F.lit(0))
                + F.coalesce(F.col("d_cf"), F.lit(0))
            ).alias("cf"),
        )
        .where(F.col("df") > 0)
        .withColumn("bucket", bucket_expr("term", meta["n_buckets"]))
    )
    new_terms.write.mode("overwrite").parquet(paths.terms_v(segment))
    _lap("term_deltas")

    # --- stats (exact, one grouped agg over the signed union) --------------
    st = spark.read.parquet(paths.stats_v(meta.get("terms_version", 0))).first()
    deltas = {
        int(r.sign): r
        for r in signed.groupBy("sign")
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("tok"),
        )
        .collect()
    }
    rm = deltas.get(-1)
    ad = deltas.get(1)
    n_docs_live = int(st.n_docs) - int(rm.n if rm else 0) + int(ad.n if ad else 0)
    total_tokens = (
        int(st.total_tokens)
        - int(rm.tok if rm else 0)
        + int(ad.tok if ad else 0)
    )
    avgdl = total_tokens / n_docs_live if n_docs_live else 0.0
    spark.createDataFrame(
        [(n_docs_live, avgdl, total_tokens)],
        "n_docs long, avgdl double, total_tokens long",
    ).write.mode("overwrite").parquet(paths.stats_v(segment))
    _lap("stats")

    # --- delta segment postings (segment-owned dir, overwrite = retry-safe)
    prefix = f"seg{segment:03d}-"
    # a crashed apply may have left chunk files for this (uncommitted)
    # segment number behind; a retry with a DIFFERENT batch must not mix
    # them in via resume (the manifests would mark those partitions done),
    # so the segment's chunk namespace is wiped first — the delta rebuild
    # is small by construction (ADVICE round 2)
    import glob as globmod

    for stale in globmod.glob(os.path.join(paths.chunks, f"{prefix}*")):
        os.remove(stale)
    store_pos = bool(meta.get("store_positions", False))
    # delta partition count sized to the batch (≥ ~4k docs per SPIMI task):
    # a 40k-doc delta through the full snapshot partition count spends its
    # wall on empty-task scheduling, not tokenizing
    n_delta_parts = max(1, min(int(meta["n_partitions"]), n_new // 4000 + 1))
    manifest = build_chunks(
        new_docs, paths.chunks, n_delta_parts, resume=True, prefix=prefix,
        tokenizer="pandas", store_positions=store_pos,
        n_buckets=int(meta["n_buckets"]),
    )
    manifest.count()
    delta_glob = f"{prefix}part-*.parquet"
    delta_terms = build_term_stats(spark, paths.chunks, meta["n_buckets"], glob=delta_glob)
    delta_blocks = build_postings(
        spark,
        paths.chunks,
        delta_terms,
        avgdl,
        meta["n_buckets"],
        n_salts=meta["n_salts"],
        heavy_df_threshold=meta["heavy_df_threshold"],
        glob=delta_glob,
        store_positions=store_pos,
    )
    delta_blocks.write.mode("overwrite").partitionBy("bucket").parquet(
        paths.postings_seg(segment)
    )
    _lap("delta_postings")

    # --- segment docs + tombstones (segment-owned dirs) --------------------
    new_docs.write.mode("overwrite").parquet(paths.docs_seg(segment))
    all_tombstones.write.mode("overwrite").parquet(paths.deletes_seg(segment))
    _lap("segment_writes")

    # --- COMMIT: one atomic meta.json replace ------------------------------
    meta["segments"] = meta.get("segments", []) + [segment]
    meta["terms_version"] = segment
    meta["last_segment"] = segment
    meta["n_docs"] = n_docs_live
    meta["avgdl"] = avgdl
    meta["next_doc_id"] = int(next_id) + int(n_new)
    _write_meta(index_dir, meta)

    wall = time.time() - t0
    spark.createDataFrame(
        [
            ("increment", "segment", float(segment)),
            ("increment", "tombstones", float(n_tombstones)),
            ("increment", "new_docs", float(n_new)),
            ("increment", "wall_s", wall),
        ],
        "stage string, key string, value double",
    ).withColumn("ts", F.current_timestamp()).write.mode("append").parquet(
        paths.metrics
    )
    # a CDC session applies batches forever: release this batch's cached
    # partitions so storage memory can't accumulate across applies
    joined.unpersist()
    all_tombstones.unpersist()
    new_docs.unpersist()
    signed.unpersist()
    return {
        "tombstones": n_tombstones,
        "new_docs": n_new,
        "segment": segment,
        "wall_s": wall,
        "stage_walls": laps,
    }


def vacuum(index_dir: str) -> "list[str]":
    """Remove artifacts no commit references: superseded terms_v/stats_v
    versions and staging/orphan segment dirs from crashed applies (the
    Iceberg `expire_snapshots`/`remove_orphan_files` analog). Safe at any
    time — readers resolve only through meta.json, and live artifacts are
    exactly {terms_version} ∪ {committed segments}. Returns removed paths."""
    import shutil

    meta = read_index_meta(index_dir)
    paths = IndexPaths(index_dir)
    keep_v = int(meta.get("terms_version", 0))
    committed = set(meta.get("segments", []))
    removed: list[str] = []

    for name in sorted(os.listdir(index_dir)):
        full = os.path.join(index_dir, name)
        if name.startswith(("terms_v", "stats_v")):
            v = int(name.split("_v")[1])
            if v != keep_v:
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
        elif name == "postings" or name.startswith("postings_fm"):
            # base-postings layouts superseded by a force-merge commit
            # (meta['postings_dir'] names the ONE live base layout)
            if name != meta.get("postings_dir", "postings"):
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
        elif name in ("postings_segs", "docs_segs", "deletes_segs"):
            for seg in sorted(os.listdir(full)):
                n = int(seg.replace("seg", ""))
                if n not in committed:
                    p = os.path.join(full, seg)
                    shutil.rmtree(p, ignore_errors=True)
                    removed.append(p)

    # orphan delta-segment CHUNK files (segNNN-part-*) from crashed applies:
    # intermediate by design, referenced by nothing once meta.json resolves
    # the commit, and actively dangerous for a retry with a different batch
    import re

    chunks_dir = paths.chunks
    if os.path.isdir(chunks_dir):
        for name in sorted(os.listdir(chunks_dir)):
            m = re.match(r"seg(\d+)-", name)
            if m and int(m.group(1)) not in committed:
                p = os.path.join(chunks_dir, name)
                os.remove(p)
                removed.append(p)
    return removed


def compaction_stats(spark: SparkSession, index_dir: str) -> dict:
    """Merge-policy inputs: total docs, tombstoned docs, deleted ratio,
    committed segment count — all from metadata-scale reads."""
    meta = read_index_meta(index_dir)
    dead = deleted_ids(spark, index_dir, meta)
    n_dead = int(dead.count()) if dead is not None else 0
    n_total = int(all_docs(spark, index_dir, meta).count())
    return {
        "n_docs_total": n_total,
        "n_deleted": n_dead,
        "deleted_ratio": (n_dead / n_total) if n_total else 0.0,
        "n_segments": len(meta.get("segments", [])),
    }


def maybe_compact(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    max_deleted_ratio: float = 0.3,
    max_segments: int = 16,
) -> "dict | None":
    """Merge-policy trigger (the ES/Lucene TieredMergePolicy analog,
    expressed as the reference's operational knob): compact when tombstones
    exceed ``max_deleted_ratio`` of the stored docs (dead postings slow
    every query and waste RAM in the serving tier) or when the delta
    segment count passes ``max_segments`` (every reader unions one relation
    per segment). Returns the compaction summary, or None when the index is
    healthy — callers loop this after increments exactly like ES's
    background merge scheduler."""
    st = compaction_stats(spark, index_dir)
    if (
        st["deleted_ratio"] <= max_deleted_ratio
        and st["n_segments"] <= max_segments
    ):
        return None
    out = compact(spark, index_dir, out_dir)
    out["trigger"] = st
    return out


# The live-splice temp-corpus path holds every delta doc row and tombstone
# id on the driver for its planning pre-pass; past this row budget compact
# falls back to the distributed range-shuffle path (large backfills /
# delta-heavy indexes keep the scale-safe plan).
COMPACT_SPLICE_ROWS = int(
    os.environ.get("SPARK_GRAFT_COMPACT_SPLICE_ROWS", "2000000")
)

_CORPUS_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# diagnostics: why the last _splice_live_sorted call declined (None = engaged)
_LAST_SPLICE_DECLINE: "str | None" = None


def _splice_live_sorted(
    spark: SparkSession, index_dir: str, meta: dict, tmp: str
) -> bool:
    """Write the conv-sorted live temp corpus with ZERO shuffle: the base
    docs store is already (conv_id, turn_idx)-sorted on disk (doc ids were
    assigned in key order), deletes are an id set, and delta segments are
    small — so compaction is an LSM merge of sorted runs, not a re-sort.
    One task per base file reads its span, drops tombstoned rows, splices
    in the (driver-pre-sorted) delta rows of its key interval, and writes
    the merged span; lexical output order preserves the global key order,
    so the fused build's sorted-source fast path consumes it unchanged
    (and its boundary verifier still audits the result downstream).

    Returns False when preconditions fail — no base store, footer stats
    missing or out of order, delta/tombstone rows past the driver budget,
    or the row-conservation check after the merge — in which case the
    caller falls back to the distributed range-shuffle path.
    """
    import glob as _glob

    import pyarrow as pa
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq

    global _LAST_SPLICE_DECLINE
    _LAST_SPLICE_DECLINE = None

    paths = IndexPaths(index_dir)
    base_files = sorted(_glob.glob(os.path.join(paths.docs, "*.parquet")))
    if not base_files:
        _LAST_SPLICE_DECLINE = "no base docs files"
        return False
    seg_dirs = [d for d in docs_sources(index_dir, meta) if d != paths.docs]
    del_dirs = deletes_sources(index_dir, meta)
    try:
        n_delta_raw = (
            sum(
                pq.ParquetFile(f).metadata.num_rows
                for d in seg_dirs
                for f in _glob.glob(os.path.join(d, "*.parquet"))
            )
            if seg_dirs
            else 0
        )
        n_dead_raw = (
            sum(
                pq.ParquetFile(f).metadata.num_rows
                for d in del_dirs
                for f in _glob.glob(os.path.join(d, "*.parquet"))
            )
            if del_dirs
            else 0
        )
        if n_delta_raw + n_dead_raw > COMPACT_SPLICE_ROWS:
            _LAST_SPLICE_DECLINE = "delta+dead rows over budget"
            return False

        # Footer walk: file-granular conv ordering (equality allowed — a
        # conversation may straddle files) + the exact (conv, turn) key of
        # each file's first row, which is the span boundary the delta
        # placement searches. Any absent stat → decline.
        firsts: "list[tuple[str, int]]" = []
        n_base = 0
        prev_max: "str | None" = None
        kept_files: "list[str]" = []
        for f in base_files:
            pf = pq.ParquetFile(f)
            md = pf.metadata
            if md.num_rows == 0:
                continue
            idx = {
                md.row_group(0).column(j).path_in_schema: j
                for j in range(md.num_columns)
            }
            if "conv_id" not in idx or "doc_id" not in idx:
                _LAST_SPLICE_DECLINE = "missing columns in base footer"
                return False
            st_lo = md.row_group(0).column(idx["conv_id"]).statistics
            st_hi = md.row_group(md.num_row_groups - 1).column(
                idx["conv_id"]
            ).statistics
            if (
                st_lo is None
                or st_hi is None
                or not st_lo.has_min_max
                or not st_hi.has_min_max
            ):
                _LAST_SPLICE_DECLINE = f"absent conv stats in {f}"
                return False
            if prev_max is not None and st_lo.min < prev_max:
                _LAST_SPLICE_DECLINE = f"file conv order violated at {f}"
                return False
            prev_max = st_hi.max if prev_max is None else max(prev_max, st_hi.max)
            head = pf.read_row_group(0, columns=["conv_id", "turn_idx"])
            firsts.append((head.column(0)[0].as_py(), int(head.column(1)[0].as_py())))
            n_base += md.num_rows
            kept_files.append(f)
        if not kept_files:
            _LAST_SPLICE_DECLINE = "all base files empty"
            return False
        if any(firsts[i] >= firsts[i + 1] for i in range(len(firsts) - 1)):
            _LAST_SPLICE_DECLINE = "first-row keys not increasing"
            return False

        # Tombstone ids: one sorted driver array (the delete-bitmap analog;
        # budget-gated above).
        del_files = [
            f for d in del_dirs for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))
        ]
        dead = (
            np.unique(
                pds.dataset(del_files)
                .to_table(columns=["doc_id"])
                .column("doc_id")
                .to_numpy()
            )
            if del_files
            else np.empty(0, dtype=np.int64)
        )

        # Delta pre-pass (driver): concat the committed delta segments, drop
        # tombstoned rows, sort by key, write ONE small-row-group file the
        # merge tasks range-prune. This is the only place delta text is
        # held in memory — bounded by COMPACT_SPLICE_ROWS.
        delta_path = ""
        n_delta_live = 0
        seg_files = [
            f for d in seg_dirs for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))
        ]
        if seg_files and n_delta_raw:
            dt = pds.dataset(seg_files).to_table(columns=["doc_id"] + _CORPUS_COLS)
            if dead.size:
                ids = dt.column("doc_id").to_numpy()
                pos = np.searchsorted(dead, ids)
                in_rng = pos < dead.size
                pos[~in_rng] = 0
                dt = dt.filter(pa.array(~(in_rng & (dead[pos] == ids))))
            dt = dt.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
            dt = dt.select(_CORPUS_COLS)
            # match the base store's physical schema exactly (tz-aware vs
            # naive timestamps differ by writer lineage; the UTC-pinned
            # session makes the int64 micros identical, so this cast only
            # relabels the type so concat/stats line up)
            base_schema = pq.ParquetFile(kept_files[0]).schema_arrow
            dt = dt.cast(
                pa.schema([base_schema.field(c) for c in _CORPUS_COLS])
            )
            n_delta_live = dt.num_rows
            if n_delta_live:
                os.makedirs(tmp, exist_ok=True)
                delta_path = os.path.join(tmp, "_delta_sorted.parquet")
                pq.write_table(
                    dt, delta_path, compression="zstd", row_group_size=2048
                )
        expected_live = n_base + n_delta_raw - int(dead.size)
        if expected_live <= 0:
            _LAST_SPLICE_DECLINE = "no live rows"
            return False
    except Exception as e:  # precondition probing over arbitrary layouts —
        # decline to the shuffle path, but keep the reason inspectable
        _LAST_SPLICE_DECLINE = repr(e)
        if os.environ.get("SPARK_GRAFT_DEBUG"):
            import traceback

            traceback.print_exc()
        return False

    os.makedirs(tmp, exist_ok=True)
    from ..index.builder import _packed_partitions

    work = [
        (
            i,
            kept_files[i],
            firsts[i + 1][0] if i + 1 < len(firsts) else None,
            firsts[i + 1][1] if i + 1 < len(firsts) else None,
        )
        for i in range(len(kept_files))
    ]
    dead_bc = spark.sparkContext.broadcast(dead)
    out_cols = list(_CORPUS_COLS)

    def kern(pdfs):
        import pyarrow as pa
        import pyarrow.parquet as pq

        for pdf in pdfs:
            for span, path, hi_conv, hi_turn in zip(
                pdf["span"], pdf["path"], pdf["hi_conv"], pdf["hi_turn"]
            ):
                span = int(span)
                base = pq.read_table(path, columns=["doc_id"] + out_cols)
                dd = dead_bc.value
                if dd.size:
                    ids = base.column("doc_id").to_numpy()
                    pos = np.searchsorted(dd, ids)
                    in_rng = pos < dd.size
                    pos[~in_rng] = 0
                    base = base.filter(pa.array(~(in_rng & (dd[pos] == ids))))
                base = base.select(out_cols)
                parts = [base]
                if delta_path:
                    # this span owns delta keys in [first_key(span),
                    # first_key(span+1)); span 0 also takes anything before
                    # the base corpus, the last span anything after it
                    lo = None if span == 0 else firsts[span]
                    hi = (
                        None
                        if hi_conv is None or (isinstance(hi_conv, float))
                        else (str(hi_conv), int(hi_turn))
                    )
                    dpf = pq.ParquetFile(delta_path)
                    md = dpf.metadata
                    cidx = {
                        md.row_group(0).column(j).path_in_schema: j
                        for j in range(md.num_columns)
                    }["conv_id"]
                    rgs = []
                    for g in range(md.num_row_groups):
                        st = md.row_group(g).column(cidx).statistics
                        if st is None or not st.has_min_max:
                            rgs.append(g)
                            continue
                        if lo is not None and st.max < lo[0]:
                            continue
                        if hi is not None and st.min > hi[0]:
                            continue
                        rgs.append(g)
                    if rgs:
                        dl = dpf.read_row_groups(rgs, columns=out_cols)
                        cv = np.asarray(dl.column("conv_id").to_pylist(), dtype=object)
                        tn = dl.column("turn_idx").to_numpy()
                        mask = np.ones(len(cv), dtype=bool)
                        if lo is not None:
                            mask &= (cv > lo[0]) | ((cv == lo[0]) & (tn >= lo[1]))
                        if hi is not None:
                            mask &= (cv < hi[0]) | ((cv == hi[0]) & (tn < hi[1]))
                        if mask.any():
                            parts.append(dl.filter(pa.array(mask)).select(out_cols))
                tbl = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
                if len(parts) > 1:
                    # keys are unique across live rows (updates tombstone
                    # the old version), so sort order is total
                    tbl = tbl.sort_by(
                        [("conv_id", "ascending"), ("turn_idx", "ascending")]
                    )
                if tbl.num_rows:
                    out_f = os.path.join(tmp, f"part-{span:05d}.parquet")
                    tmp_f = out_f + f".tmp-{os.getpid()}"
                    pq.write_table(
                        tbl, tmp_f, compression="snappy", row_group_size=2048
                    )
                    os.replace(tmp_f, out_f)
                yield pd.DataFrame({"span": [span], "rows": [tbl.num_rows]})

    sc = spark.sparkContext
    rdd = sc.parallelize(work, _packed_partitions(len(work)))
    flist = spark.createDataFrame(
        rdd, "span long, path string, hi_conv string, hi_turn int"
    )
    import shutil

    sc.setJobDescription("compact: live-splice temp corpus (zero-shuffle)")
    try:
        got = flist.mapInPandas(kern, "span long, rows long").toPandas()
    except Exception as e:
        _LAST_SPLICE_DECLINE = repr(e)
        if os.environ.get("SPARK_GRAFT_DEBUG"):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
        return False
    finally:
        sc.setJobDescription(None)
        dead_bc.unpersist()
    # a task killed mid-write leaves a .tmp-<pid> file its retry does not
    # remove (the retry replaces under its own pid) — sweep them so the
    # downstream corpus read sees only committed spans
    for stale in _glob.glob(os.path.join(tmp, "*.tmp-*")):
        try:
            os.remove(stale)
        except OSError:
            pass
    written = int(got["rows"].sum())
    if written != expected_live:
        # row conservation failed — wipe and let the shuffle path recompute
        _LAST_SPLICE_DECLINE = f"row conservation {written} != {expected_live}"
        shutil.rmtree(tmp, ignore_errors=True)
        return False
    if delta_path:
        os.remove(delta_path)
    return True


def compact(spark: SparkSession, index_dir: str, out_dir: str) -> dict:
    """Force-merge analog: rebuild the index from the live corpus. Purges
    tombstones, re-densifies doc ids, restores exact block-max bounds.

    Round 6 shape: ONE range shuffle writes a conv-sorted temp corpus
    (small row groups, exact footer stats), then the FUSED one-pass build
    runs over it via the sorted-source fast path. The old route fed the
    live-docs DataFrame straight into the two-pass build, where deletes'
    turn-idx gaps broke the dense-PK offsets path and doc-id assignment
    fell to the window fallback — three full shuffles of the text corpus
    (measured 92–119 s vs 15.7 s for a fresh build at sf0.1). Now the text
    crosses exactly one exchange: shuffle-sort → fused pass → salted merge
    of compressed chunks (compact ≡ fresh build, rank-identity pytest)."""
    import shutil

    meta = read_index_meta(index_dir)
    t0 = time.time()
    par = spark.sparkContext.defaultParallelism
    # temp-corpus partition count from the LIVE DOC COUNT (scale-adaptive,
    # guide §2): ~6k-doc files keep each fused task's tokenize/encode
    # working set cache-resident under full task concurrency, floored at
    # 4 partitions/core and capped so tiny-file overhead can't dominate
    n_docs_live = int(meta.get("n_docs", 0)) or 1
    n_parts = max(
        int(meta["n_partitions"]),
        4 * par,
        min(64 * par, -(-n_docs_live // 6000)),
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    tmp = os.path.join(out_dir, "_live_src")
    # Zero-shuffle LSM splice of the sorted base + small deltas when the
    # preconditions hold; distributed range shuffle otherwise (large
    # backfills, missing footer stats, budget overruns).
    spliced = _splice_live_sorted(spark, index_dir, meta, tmp)
    if not spliced:
        live = live_docs(spark, index_dir).select(*_CORPUS_COLS)
        (
            live.repartitionByRange(n_parts, "conv_id")
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite")
            .option("compression", "snappy")
            # small row groups → span planner cuts cache-resident fused tasks
            .option("parquet.block.size", str(4 * 1024 * 1024))
            .parquet(tmp)
        )
    sort_wall = time.time() - t0
    # Partitioning for the rebuild: the spliced temp mirrors the BASE store's
    # file geometry (one merged span per base file), so the fresh-build
    # partition count from meta keeps span planning at the proven fresh-build
    # granularity — passing the ~6k-doc-derived n_parts here would push
    # `len(spans) < n_partitions` at large corpora and trigger the
    # row-group-finest re-plan (measured at sf1: 9,378 micro-spans/chunks,
    # compact 509 s vs ~100 s fresh-build-shaped). The shuffle temp is
    # WRITTEN with n_parts files, so its span count already matches n_parts.
    build_parts = int(meta["n_partitions"]) if spliced else n_parts
    out = build_index(
        spark,
        spark.read.parquet(tmp),
        out_dir,
        n_partitions=build_parts,
        n_buckets=meta["n_buckets"],
        n_salts=meta["n_salts"],
        heavy_df_threshold=meta["heavy_df_threshold"],
        resume=False,
        source_path=tmp,
        span_mb=4,
        store_positions=bool(meta.get("store_positions", False)),
    )
    shutil.rmtree(tmp, ignore_errors=True)
    from ..index.builder import append_metrics_driver

    append_metrics_driver(
        os.path.join(out_dir, "metrics"),
        [("live_splice" if spliced else "live_sort", "wall_s", sort_wall)],
    )
    out["wall_s"] = time.time() - t0
    out["live_spliced"] = bool(spliced)
    return out
