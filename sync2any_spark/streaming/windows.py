"""Event-time streaming aggregations — watermarks + custom state.

The reference's monitor keeps per-interval sync-rate counters and
per-table running totals in mutable maps inside the listener
(``MonitorTask.java:22-153``, ``extract/KafkaMsgListener.java:276-283``).
The Spark-native spellings:

- ``windowed_turn_counts`` — tumbling event-time windows over the
  increment stream with a WATERMARK: late rows inside the allowance are
  merged into their window, rows later than the allowance are dropped and
  the window finalizes exactly once (append mode) — the per-interval tpq
  metric, exactly-once per window, no driver state;
- ``conversation_progress_stream`` — ``applyInPandasWithState``: per-
  conversation running totals (turn count, last event time) maintained in
  keyed state across micro-batches — the listener's running-counter maps,
  resilient to restarts via the checkpoint.

Both run on the same file-source stand-in as the increment stream (swap in
the Kafka source exactly as in ``stream._read_stream``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .stream import INCREMENT_SCHEMA

PROGRESS_SCHEMA = "conv_id string, n_turns_total long, last_ts timestamp"


def _file_source(spark: SparkSession, input_dir: str, max_files_per_trigger: int = 1):
    return (
        spark.readStream.schema(INCREMENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def windowed_turn_counts(
    spark: SparkSession,
    input_dir: str,
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 1,
):
    """Streaming tumbling-window per-role turn counts with late-data
    handling: ``withWatermark(ts, allowance)`` keeps window state open for
    exactly the allowance — a late row inside it still lands in its
    event-time window; beyond it the row is dropped and the finalized
    window was already emitted once (append mode). Returns the streaming
    DataFrame (caller attaches the sink)."""
    src = _file_source(spark, input_dir, max_files_per_trigger)
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )


def conversation_progress_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "conv_progress",
    max_files_per_trigger: int = 1,
):
    """Custom stateful operator: per-conversation running (turn count,
    last event ts) via ``applyInPandasWithState`` — keyed state lives in
    the state store, survives across micro-batches and restarts (the
    reference listener's running-counter maps, made fault-tolerant).
    Emits one updated row per touched conversation per batch into an
    in-memory sink named ``query_name``; returns the started query
    (already drained — availableNow)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = _file_source(spark, input_dir, max_files_per_trigger)

    def update(key, pdfs, state: GroupState):
        total, last = (state.get if state.exists else (0, None))
        for pdf in pdfs:
            total += len(pdf)
            mx = pdf["ts"].max()
            if last is None or (mx is not None and mx > last):
                last = mx
        state.update((total, last))
        yield pd.DataFrame(
            {"conv_id": [key[0]], "n_turns_total": [total], "last_ts": [last]}
        )

    out = src.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType="n_turns_total long, last_ts timestamp",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
