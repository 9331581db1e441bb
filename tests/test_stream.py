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


KAFKA_RAW_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp"
)


def _kafka_msg(conv, turn, op, text, ts, offset, message_type=None, table=None):
    import json

    env = {
        "op": op,
        "ts": ts,
        "data": {
            "conv_id": conv, "turn_idx": turn, "role": "user",
            "text": text, "tool": "",
        },
    }
    if message_type is not None:
        env["messageType"] = message_type
    if table is not None:
        env["table"] = table
    key = f"{conv}_{turn}".encode() if conv else b"ctl"
    return (key, json.dumps(env).encode(), "t", 0, offset, None)


def test_kafka_envelope_decode(spark):
    """Envelope decode (stream._read_stream source="kafka") is a pure
    per-row projection (streaming-legal); the highest-offset-wins ordering
    guard runs batch-side in _dedup_batch. Reference semantics mirrored:
    extract/KafkaMsgListener.java:65-85."""
    from sync2any_spark.streaming.stream import _dedup_batch, decode_kafka_envelope

    raw = spark.createDataFrame(
        [
            _kafka_msg("c1", 0, "I", "first", "2026-01-01 00:00:00", 1),
            _kafka_msg("c1", 0, "U", "second wins", "2026-01-01 00:00:05", 2),
            _kafka_msg("c2", 3, "D", None, "2026-01-01 00:00:07", 3),
        ],
        KAFKA_RAW_SCHEMA,
    )
    decoded = decode_kafka_envelope(raw)
    # the projection keeps the router columns and drops nothing per key
    assert decoded.count() == 3
    rows = {
        (r.conv_id, r.turn_idx): r for r in _dedup_batch(decoded).collect()
    }
    assert len(rows) == 2  # highest offset wins per key
    assert rows[("c1", 0)].op == "U"
    assert rows[("c1", 0)].text == "second wins"
    assert rows[("c1", 0)].ts is not None
    assert rows[("c2", 3)].op == "D"
    # deduped schema is exactly the increment contract
    cols = _dedup_batch(decoded).columns
    assert cols == ["conv_id", "turn_idx", "role", "text", "tool", "ts", "op"]


def test_kafka_shaped_stream_end_to_end(spark, transcripts_sf0001, tmp_path_factory):
    """The envelope decode MUST be legal under readStream (round-2 ADVICE:
    the old row_number dedup was rejected at streaming query start). Here
    the exact Kafka-source schema is streamed from parquet files — the same
    plan as source="kafka" minus the broker — through decode_kafka_envelope
    + foreachBatch(route_envelope_batch), applying DML, registering a DDL
    table mid-stream, and skipping txn markers."""
    from sync2any_spark.pipeline.rules import RuleRegistry, SyncRule
    from sync2any_spark.streaming.stream import (
        decode_kafka_envelope,
        route_envelope_batch,
    )

    idx = str(tmp_path_factory.mktemp("idx_kafka_stream"))
    inbox = str(tmp_path_factory.mktemp("kafka_inbox"))
    build_index(spark, transcripts_sf0001, idx, resume=False, **PARAMS)

    msgs = [
        _kafka_msg(None, None, None, None, "2026-01-01 00:00:00", 1,
                   message_type="BEGIN"),
        _kafka_msg("conv_kstream", 0, "I", "kafkaterm old", "2026-01-01 00:00:01", 2,
                   message_type="DML"),
        _kafka_msg("conv_kstream", 0, "U", "kafkaterm new", "2026-01-01 00:00:02", 3,
                   message_type="DML"),
        _kafka_msg(None, None, None, None, "2026-01-01 00:00:03", 4,
                   message_type="DDL", table="transcripts_shard_42"),
        _kafka_msg(None, None, None, None, "2026-01-01 00:00:04", 5,
                   message_type="COMMIT"),
    ]
    spark.createDataFrame(msgs, KAFKA_RAW_SCHEMA).coalesce(1).write.parquet(
        os.path.join(inbox, "b1")
    )

    registry = RuleRegistry([SyncRule(table_pattern=r"transcripts_shard_\d+")])
    raw = (
        spark.readStream.schema(KAFKA_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(inbox, "*"))
    )
    decoded = decode_kafka_envelope(raw)  # must analyze under readStream

    def process(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        route_envelope_batch(spark, idx, batch_df, registry=registry)

    q = (
        decoded.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(idx, "_kafka_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    live = live_docs(spark, idx)
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in live.where(F.col("conv_id") == "conv_kstream").collect()
    }
    # highest offset won; markers did not become rows
    assert got == {("conv_kstream", 0): "kafkaterm new"}
    assert live.where(F.col("conv_id").isNull()).count() == 0
    # the DDL event registered the new table against the rule registry
    assert "transcripts_shard_42" in registry.active


def test_stream_offset_reset_replay_is_noop(
    spark, transcripts_sf0001, tmp_path_factory
):
    """Offset reset (the reference's PUT /offset, api/StateController.java:
    80-106): restarting the stream from the beginning with a FRESH
    checkpoint replays every batch — and the index is unchanged, because
    increments are idempotent by key. This is the mid-topic-restart
    contract: any starting offset ≤ the committed one is safe."""
    idx = str(tmp_path_factory.mktemp("idx_reset"))
    inbox = str(tmp_path_factory.mktemp("reset_inbox"))
    build_index(spark, transcripts_sf0001, idx, resume=False, **PARAMS)

    b1 = _batch(
        spark,
        [("conv_reset01", 0, "user", "resetterm question", "", TS, "I")],
    )
    b1.coalesce(1).write.parquet(os.path.join(inbox, "batch1"))
    run_increment_stream(
        spark, idx, os.path.join(inbox, "*"), available_now=True,
        checkpoint_dir=os.path.join(idx, "_ckpt_a"),
    )
    live_before = {
        (r.conv_id, r.turn_idx, r.text, r.doc_id)
        for r in live_docs(spark, idx).collect()
    }

    # reset to earliest = new checkpoint dir → full replay
    run_increment_stream(
        spark, idx, os.path.join(inbox, "*"), available_now=True,
        checkpoint_dir=os.path.join(idx, "_ckpt_b"),
    )
    live_after = {
        (r.conv_id, r.turn_idx, r.text, r.doc_id)
        for r in live_docs(spark, idx).collect()
    }
    assert live_after == live_before


def test_windowed_counts_with_watermark_and_late_data(spark, tmp_path_factory):
    """Event-time tumbling windows + watermark over the increment stream:
    a row arriving late but INSIDE the allowance merges into its window; a
    row later than the allowance is dropped; each finalized window is
    emitted exactly once (append mode)."""
    import datetime

    from sync2any_spark.streaming.windows import windowed_turn_counts

    inbox = str(tmp_path_factory.mktemp("win_inbox"))
    ckpt = str(tmp_path_factory.mktemp("win_ckpt"))
    t0 = datetime.datetime(2026, 7, 1, 12, 0, 0)

    def row(conv, turn, minutes, role="user"):
        return (conv, turn, role, "text", "",
                t0 + datetime.timedelta(minutes=minutes), "I")

    # drain 1: rows in windows [12:00,12:05) and [12:05,12:10); max event
    # time 12:08 → watermark persisted after the drain = 11:58 (10 min)
    b1 = [row("c1", 0, 1), row("c1", 1, 2), row("c2", 0, 6), row("c2", 1, 8)]
    # drain 2: on-time row at 12:30 (pushes watermark to 12:20 — closes the
    # first two windows) and a LATE row at 12:03 that is inside the
    # allowance (persisted watermark 11:58 < 12:03 → must be counted)
    b2 = [row("c3", 0, 30), row("c1", 2, 3)]
    # drain 3: far-future row closes [12:30,12:35); a too-late row at 12:01
    # (persisted watermark is now 12:20) must be DROPPED
    b3 = [row("c4", 0, 120), row("c1", 3, 1)]

    got: dict = {}

    def drain():
        out = windowed_turn_counts(
            spark, os.path.join(inbox, "*"),
            window_duration="5 minutes", watermark="10 minutes",
        )

        def collect(batch_df, batch_id):
            for r in batch_df.collect():
                got[(r.window_start.minute, r.role)] = r.n_turns

        q = (
            out.writeStream.foreachBatch(collect)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # each drain is its own run sharing the checkpoint — the watermark
    # PERSISTS across restarts, which is exactly the recovery contract
    for i, b in enumerate((b1, b2, b3)):
        _batch(spark, b).coalesce(1).write.parquet(os.path.join(inbox, f"b{i}"))
        drain()

    # [12:00,12:05): drain-1's two rows + drain-2's late-but-allowed row;
    # drain-3's too-late row NOT counted. [12:05,12:10): drain-1's rows.
    assert got[(0, "user")] == 3
    assert got[(5, "user")] == 2
    assert got[(30, "user")] == 1  # closed by the far-future row


def test_conversation_progress_stateful_stream(spark, tmp_path_factory):
    """applyInPandasWithState: per-conversation running totals survive
    across micro-batches in keyed state — the second batch's emission for a
    conversation reflects batch-1 history."""
    import datetime

    from sync2any_spark.streaming.windows import conversation_progress_stream

    inbox = str(tmp_path_factory.mktemp("state_inbox"))
    ckpt = str(tmp_path_factory.mktemp("state_ckpt"))
    t0 = datetime.datetime(2026, 7, 2, 9, 0, 0)

    def row(conv, turn, minutes):
        return (conv, turn, "user", "text", "",
                t0 + datetime.timedelta(minutes=minutes), "I")

    b1 = [row("cs1", 0, 0), row("cs1", 1, 1), row("cs2", 0, 2)]
    b2 = [row("cs1", 2, 5), row("cs3", 0, 6)]
    _batch(spark, b1).coalesce(1).write.parquet(os.path.join(inbox, "b1"))
    _batch(spark, b2).coalesce(1).write.parquet(os.path.join(inbox, "b2"))

    conversation_progress_stream(
        spark, os.path.join(inbox, "*"), ckpt, query_name="conv_progress_t"
    )
    rows = spark.sql("SELECT * FROM conv_progress_t").collect()
    # update-mode memory sink keeps every emission; the LATEST per conv
    # carries the cumulative state
    latest = {}
    for r in rows:
        cur = latest.get(r.conv_id)
        if cur is None or r.n_turns_total > cur.n_turns_total:
            latest[r.conv_id] = r
    assert latest["cs1"].n_turns_total == 3          # 2 from b1 + 1 from b2
    assert latest["cs1"].last_ts.minute == 5         # advanced by b2
    assert latest["cs2"].n_turns_total == 1
    assert latest["cs3"].n_turns_total == 1
    # cs1 was emitted in BOTH batches (state carried, not recomputed)
    assert sum(1 for r in rows if r.conv_id == "cs1") == 2
