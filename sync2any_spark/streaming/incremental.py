"""Incremental index maintenance — the CDC half of the reference, Spark-first.

The reference applies binlog changes row-at-a-time as ES upserts/deletes by
``_id`` (``load/impl/EsLoadServiceImpl.java:51-110``); redelivery is
tolerated because upserts are idempotent. Our batch analog follows the
Lucene segment model:

- an increment batch (transcripts columns + ``op`` I/U/D) is first reduced
  to its *effective* rows — unchanged upserts and deletes of absent keys
  drop out, which is exactly what makes re-applying a batch a no-op
  (idempotence test F4);
- updates/deletes tombstone the old ``doc_id`` (deletes table = Lucene
  live-docs); inserts/updates append fresh doc ids ABOVE the current max —
  ids are never reused, so all existing postings stay valid;
- new rows are tokenized into a delta segment (same SPIMI path, prefixed
  chunk files) whose postings append to the block table: delta doc ids sort
  strictly after base ids, so every (term, salt) stream stays doc-ordered;
- terms/stats tables are maintained *exactly* (old ± added ∓ removed, with
  removed term counts recomputed from the tombstoned rows' stored text), so
  BM25 over the live corpus stays rank-identical to a fresh build — unlike
  Lucene, which lets df drift until merge;
- ``compact()`` rebuilds the index from the live docs (force-merge analog),
  purging tombstones and re-densifying doc ids.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.builder import (
    IndexPaths,
    build_chunks,
    build_index,
    build_postings,
    build_term_stats,
)
from ..query.algebra import SPARK_TOKEN_RE, term_stats


def _read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "meta.json")) as f:
        return json.load(f)


def _write_meta(index_dir: str, meta: dict) -> None:
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))


def live_docs(spark: SparkSession, index_dir: str) -> DataFrame:
    """Docs store minus tombstones (the queryable corpus)."""
    paths = IndexPaths(index_dir)
    docs = spark.read.parquet(paths.docs)
    if os.path.isdir(paths.deletes) and any(
        n.endswith(".parquet") for n in os.listdir(paths.deletes)
    ):
        dead = spark.read.parquet(paths.deletes)
        docs = docs.join(dead, "doc_id", "left_anti")
    return docs


def apply_increments(
    spark: SparkSession, index_dir: str, increments: DataFrame
) -> dict:
    """Apply one I/U/D batch (SURVEY.md §3.2 analog). Returns summary stats.

    Batch contract (mirrors one-binlog-row-per-message): at most one op per
    (conv_id, turn_idx) — enforced, because apply order within a batch would
    otherwise be undefined.
    """
    paths = IndexPaths(index_dir)
    meta = _read_meta(index_dir)
    t0 = time.time()

    n_dup = (
        increments.groupBy("conv_id", "turn_idx").count().where(F.col("count") > 1)
    ).count()
    if n_dup:
        raise ValueError(f"{n_dup} keys appear more than once in the batch")

    live = live_docs(spark, index_dir).select(
        "conv_id", "turn_idx", F.col("doc_id").alias("old_doc_id"),
        F.col("text").alias("cur_text"),
    )
    joined = increments.join(live, ["conv_id", "turn_idx"], "left").persist()

    # effective rows (idempotence): D of absent key → no-op; I/U with
    # unchanged text → no-op (the ES docAsUpsert equivalence check)
    deletes_new = joined.where(
        (F.col("op") == "D") & F.col("old_doc_id").isNotNull()
    ).select(F.col("old_doc_id").alias("doc_id"))
    upserts = joined.where(
        (F.col("op") != "D")
        & (F.col("old_doc_id").isNull() | (F.col("cur_text") != F.col("text")))
    )
    tombstoned_updates = upserts.where(F.col("old_doc_id").isNotNull()).select(
        F.col("old_doc_id").alias("doc_id")
    )
    all_tombstones = deletes_new.union(tombstoned_updates).persist()
    n_tombstones = all_tombstones.count()

    # fresh doc ids above the current max — never reused. Batch-internal
    # rank comes from the same scalable two-level prefix sum the snapshot
    # build uses (assign_doc_ids), so arbitrarily large backfill batches
    # don't funnel through a single-partition window.
    from ..index.builder import assign_doc_ids

    max_doc = spark.read.parquet(paths.docs).agg(F.max("doc_id")).first()[0]
    new_docs = (
        assign_doc_ids(
            upserts.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        )
        .withColumn("doc_id", (F.col("doc_id") + F.lit(int(max_doc) + 1)).cast("long"))
        .withColumn(
            "dl",
            F.size(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(SPARK_TOKEN_RE), 0)
            ),
        )
        .select("doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts", "dl")
        .persist()
    )
    n_new = new_docs.count()

    if n_tombstones == 0 and n_new == 0:
        return {"tombstones": 0, "new_docs": 0, "segment": None, "wall_s": 0.0}

    # --- term/stat deltas (exact live maintenance) -----------------------
    removed_rows = spark.read.parquet(paths.docs).join(
        all_tombstones, "doc_id", "left_semi"
    )
    removed_stats = term_stats(removed_rows, ["doc_id"]).select(
        "term", F.col("df").alias("rm_df"), F.col("cf").alias("rm_cf")
    )
    added_stats = term_stats(new_docs, ["doc_id"]).select(
        "term", F.col("df").alias("ad_df"), F.col("cf").alias("ad_cf")
    )
    old_terms = spark.read.parquet(paths.terms)
    from ..index.bucketing import bucket_expr

    new_terms = (
        old_terms.select("term", "df", "cf")
        .join(removed_stats, "term", "full")
        .join(added_stats, "term", "full")
        .select(
            "term",
            (
                F.coalesce(F.col("df"), F.lit(0))
                - F.coalesce(F.col("rm_df"), F.lit(0))
                + F.coalesce(F.col("ad_df"), F.lit(0))
            ).alias("df"),
            (
                F.coalesce(F.col("cf"), F.lit(0))
                - F.coalesce(F.col("rm_cf"), F.lit(0))
                + F.coalesce(F.col("ad_cf"), F.lit(0))
            ).alias("cf"),
        )
        .where(F.col("df") > 0)
        .withColumn("bucket", bucket_expr("term", meta["n_buckets"]))
    )
    new_terms.write.mode("overwrite").parquet(paths.terms + ".next")

    # --- stats (exact) -----------------------------------------------------
    st = spark.read.parquet(paths.stats).first()
    rm = removed_rows.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("tok")
    ).first()
    ad = new_docs.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("tok")
    ).first()
    n_docs_live = int(st.n_docs) - int(rm.n) + int(ad.n)
    total_tokens = int(st.total_tokens) - int(rm.tok) + int(ad.tok)
    avgdl = total_tokens / n_docs_live if n_docs_live else 0.0
    spark.createDataFrame(
        [(n_docs_live, avgdl, total_tokens)],
        "n_docs long, avgdl double, total_tokens long",
    ).write.mode("overwrite").parquet(paths.stats + ".next")

    # --- delta segment postings -------------------------------------------
    segment = int(meta.get("last_segment", 0)) + 1
    prefix = f"seg{segment:03d}-"
    manifest = build_chunks(
        new_docs, paths.chunks, meta["n_partitions"], resume=True, prefix=prefix
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
    )
    delta_blocks.repartition("bucket").write.mode("append").partitionBy(
        "bucket"
    ).parquet(paths.postings)

    # --- commit point: swap maintained tables, append docs/deletes ---------
    new_docs.write.mode("append").parquet(paths.docs)
    all_tombstones.write.mode("append").parquet(paths.deletes)
    for name in ("terms", "stats"):
        cur, nxt = getattr(paths, name), getattr(paths, name) + ".next"
        old = cur + ".old"
        if os.path.exists(old):
            import shutil

            shutil.rmtree(old)
        os.replace(cur, old)
        os.replace(nxt, cur)
    meta["last_segment"] = segment
    meta["n_docs"] = n_docs_live
    meta["avgdl"] = avgdl
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
    return {
        "tombstones": n_tombstones,
        "new_docs": n_new,
        "segment": segment,
        "wall_s": wall,
    }


def compact(spark: SparkSession, index_dir: str, out_dir: str) -> dict:
    """Force-merge analog: rebuild the index from the live corpus. Purges
    tombstones, re-densifies doc ids, restores exact block-max bounds."""
    meta = _read_meta(index_dir)
    live = live_docs(spark, index_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    return build_index(
        spark,
        live,
        out_dir,
        n_partitions=meta["n_partitions"],
        n_buckets=meta["n_buckets"],
        n_salts=meta["n_salts"],
        heavy_df_threshold=meta["heavy_df_threshold"],
        resume=False,
    )
