"""Structured Streaming ingestion (A3/§2.D): file-source micro-batches drive
the same idempotent index maintenance as the batch path."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from sync2any_spark.index.builder import build_index
from sync2any_spark.oracle import BM25Oracle
from sync2any_spark.query.wand import IndexSearcher
from sync2any_spark.streaming.incremental import live_docs
from sync2any_spark.streaming.stream import run_increment_stream

PARAMS = dict(n_partitions=8, n_buckets=8, n_salts=4, heavy_df_threshold=500)
TS = datetime.datetime(2026, 7, 1)
INC_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, INC_SCHEMA)


def test_stream_applies_batches_in_order(spark, transcripts_sf0001, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx_stream"))
    inbox = str(tmp_path_factory.mktemp("stream_inbox"))
    build_index(spark, transcripts_sf0001, idx, resume=False, **PARAMS)

    # batch 1: insert a new conversation; batch 2: update one of its turns
    b1 = _batch(
        spark,
        [
            ("conv_stream01", 0, "user", "streamterm question", "", TS, "I"),
            ("conv_stream01", 1, "assistant", "streamterm answer", "", TS, "I"),
        ],
    )
    b2 = _batch(
        spark,
        [
            ("conv_stream01", 1, "assistant", "streamterm revised answer", "",
             TS + datetime.timedelta(minutes=1), "U"),
            ("conv_00000003", 0, None, None, None, TS, "D"),
        ],
    )
    b1.coalesce(1).write.parquet(os.path.join(inbox, "batch1"))
    b2.coalesce(1).write.parquet(os.path.join(inbox, "batch2"))

    run_increment_stream(spark, idx, os.path.join(inbox, "*"), available_now=True)

    live = live_docs(spark, idx)
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in live.where(F.col("conv_id") == "conv_stream01").collect()
    }
    assert got == {
        ("conv_stream01", 0): "streamterm question",
        ("conv_stream01", 1): "streamterm revised answer",
    }
    assert (
        live.where(
            (F.col("conv_id") == "conv_00000003") & (F.col("turn_idx") == 0)
        ).count()
        == 0
    )

    # search sees the streamed docs, rank-identical to a fresh oracle
    pdf = (
        live.orderBy("doc_id").select("doc_id", "text").toPandas()
    )
    oracle = BM25Oracle(list(zip(pdf["doc_id"], pdf["text"])))
    searcher = IndexSearcher(spark, idx)
    got_hits = searcher.search("streamterm", 5)
    want_hits = oracle.topk("streamterm", 5)
    assert [g[0] for g in got_hits] == [w[0] for w in want_hits]

    # restart with same checkpoint: nothing new → index state unchanged
    n_docs_before = spark.read.parquet(f"{idx}/docs").count()
    run_increment_stream(spark, idx, os.path.join(inbox, "*"), available_now=True)
    assert spark.read.parquet(f"{idx}/docs").count() == n_docs_before
