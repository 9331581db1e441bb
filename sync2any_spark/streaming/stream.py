"""Structured Streaming ingestion — the reference's Kafka CDC listener,
Spark-first (SURVEY.md §2.A A3, §2.D).

The reference consumes binlog events from Kafka one row at a time
(``extract/KafkaMsgListener.java``), acking at CHECKPOINT markers. The
Spark-native equivalent is a streaming source feeding ``foreachBatch``,
where each micro-batch applies the same idempotent I/U/D merge the batch
path uses (streaming.incremental.apply_increments):

- **source**: here a file source (a directory new increment-parquet files
  land in — the sandbox stand-in for the Kafka topic; swapping in
  ``readStream.format("kafka")`` + a JSON/proto decode changes only
  ``_read_stream``);
- **ordering** (A5): inside a batch, the unique-key contract is enforced by
  apply_increments; across batches the file source preserves arrival order
  with ``maxFilesPerTrigger=1`` — the analog of the reference's
  one-partition-per-topic ordering guidance (``README.md:157``);
- **exactly-once-ish** (§2.D): the streaming checkpoint records consumed
  files; replayed batches are no-ops because upserts are idempotent by key
  (the same redelivery tolerance the reference relies on,
  ``load/impl/EsLoadServiceImpl.java:100-110``);
- **backpressure**: ``maxFilesPerTrigger`` ≙ the reference's
  MAX_POLL_RECORDS bound.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .incremental import apply_increments

INCREMENT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, op string"
)

# the CDC envelope the reference's listener consumes: one JSON message per
# changed row — op + commit timestamp + the row image
# (extract/KafkaMsgListener.java:65-85 reads these fields off the record)
ENVELOPE_SCHEMA = (
    "op string, ts string, data struct<conv_id string, turn_idx int, "
    "role string, text string, tool string>"
)


def decode_kafka_envelope(raw):
    """Kafka records → INCREMENT_SCHEMA rows + per-key ordering guard.

    ``raw`` has the Kafka source shape (key/value binary, topic, partition,
    offset, timestamp). The JSON value is parsed JVM-side (``from_json`` —
    no Python in the hot path); within a micro-batch the HIGHEST offset per
    (conv_id, turn_idx) wins, mirroring the reference's sequential
    per-partition apply where the later binlog row overwrites
    (``extract/KafkaMsgListener.java:65-85`` + the one-partition ordering
    guidance, ``README.md:157``). Pure DataFrame transform — unit-testable
    on a static DataFrame, identical plan under readStream.
    """
    from pyspark.sql import Window, functions as F

    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), ENVELOPE_SCHEMA).alias("m"),
        "offset",
    ).select(
        F.col("m.data.conv_id").alias("conv_id"),
        F.col("m.data.turn_idx").alias("turn_idx"),
        F.col("m.data.role").alias("role"),
        F.col("m.data.text").alias("text"),
        F.col("m.data.tool").alias("tool"),
        F.to_timestamp("m.ts").alias("ts"),
        F.col("m.op").alias("op"),
        "offset",
    )
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.col("offset").desc())
    return (
        parsed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "offset")
    )


def _read_stream(
    spark: SparkSession,
    source: str,
    input_dir: str | None = None,
    max_files_per_trigger: int = 1,
    kafka_bootstrap: str | None = None,
    kafka_topic: str | None = None,
):
    """Streaming source factory: ``files`` (parquet-dir stand-in used in the
    sandbox) or ``kafka`` (the production path — envelope decode included;
    needs a broker + the spark-sql-kafka package on the cluster)."""
    if source == "kafka":
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", kafka_bootstrap)
            .option("subscribe", kafka_topic)
            .option("startingOffsets", "earliest")
            .option("maxOffsetsPerTrigger", 600)  # ≙ reference MAX_POLL_RECORDS
            .load()
        )
        return decode_kafka_envelope(raw)
    return (
        spark.readStream.schema(INCREMENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def run_increment_stream(
    spark: SparkSession,
    index_dir: str,
    input_dir: str | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
    source: str = "files",
    kafka_bootstrap: str | None = None,
    kafka_topic: str | None = None,
):
    """Consume increment batches and maintain the index.

    With ``available_now=True`` (default — used in tests and backfills) the
    stream drains everything currently available and stops; a live
    deployment passes False and a processing-time trigger.
    Returns the StreamingQuery (already awaited when available_now).
    """
    checkpoint_dir = checkpoint_dir or os.path.join(index_dir, "_stream_checkpoint")
    src = _read_stream(
        spark, source, input_dir, max_files_per_trigger,
        kafka_bootstrap, kafka_topic,
    )

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # one op per key per micro-batch: keep the latest by ts then op
        # priority (D last) — the same latest-wins collapse as A19
        from pyspark.sql import Window, functions as F

        w = Window.partitionBy("conv_id", "turn_idx").orderBy(
            F.col("ts").desc(), F.col("op").desc()
        )
        deduped = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        apply_increments(spark, index_dir, deduped)

    writer = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
