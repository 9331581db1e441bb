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


def test_kafka_envelope_decode(spark):
    """The Kafka-shaped ingestion path (stream._read_stream source="kafka"):
    the JSON envelope decode + per-key highest-offset-wins ordering guard is
    a pure DataFrame transform — validated here on a static DataFrame with
    the exact Kafka source schema (no broker in the sandbox; the streaming
    wrapper only swaps readStream.format("kafka") in front of this plan).
    Reference semantics mirrored: extract/KafkaMsgListener.java:65-85."""
    import json

    from sync2any_spark.streaming.stream import decode_kafka_envelope

    def msg(conv, turn, op, text, ts, offset):
        v = json.dumps(
            {
                "op": op,
                "ts": ts,
                "data": {
                    "conv_id": conv, "turn_idx": turn, "role": "user",
                    "text": text, "tool": "",
                },
            }
        ).encode()
        return (f"{conv}_{turn}".encode(), v, "t", 0, offset, None)

    raw = spark.createDataFrame(
        [
            msg("c1", 0, "I", "first", "2026-01-01 00:00:00", 1),
            msg("c1", 0, "U", "second wins", "2026-01-01 00:00:05", 2),
            msg("c2", 3, "D", None, "2026-01-01 00:00:07", 3),
        ],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp",
    )
    rows = {
        (r.conv_id, r.turn_idx): r
        for r in decode_kafka_envelope(raw).collect()
    }
    assert len(rows) == 2  # highest offset wins per key
    assert rows[("c1", 0)].op == "U"
    assert rows[("c1", 0)].text == "second wins"
    assert rows[("c1", 0)].ts is not None
    assert rows[("c2", 3)].op == "D"
    # decoded schema is exactly the increment contract
    cols = decode_kafka_envelope(raw).columns
    assert cols == ["conv_id", "turn_idx", "role", "text", "tool", "ts", "op"]
