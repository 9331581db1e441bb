"""Sources & sinks — format-pluggable transcript ingestion and routed writes.

The reference ingests MySQL dumps and Kafka-protobuf CDC (SURVEY.md §2.A
A1-A4) and writes to ES/MySQL/ClickHouse (A16-A19). The Spark-native
equivalents are format handlers on one fixed schema: parquet (canonical),
JSON lines, CSV — plus Iceberg table identifiers when the runtime has the
catalog (gated, no jars in this container). Routed writes reproduce the
dynamic sink partitioning (A14) as partitionBy on the route column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def read_transcripts(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Load transcripts from any supported format under the fixed schema
    (explicit schema — never inferred, mirroring the reference's rejected
    schema-less tables, MysqlMetaExtractImpl.java:170-172).

    Parquet honors the schema-evolution contract (new columns appended
    only, RecordsTransform.java:25-38): the six base columns are validated
    and cast to their canonical types, any appended columns ride along
    after them. Text formats keep the strict fixed schema (inference over
    JSON/CSV is exactly what the reference refuses to do)."""
    if fmt == "parquet":
        df = spark.read.parquet(path)
        missing = [f.name for f in TRANSCRIPTS_SCHEMA if f.name not in df.columns]
        if missing:
            raise ValueError(f"transcripts source missing columns: {missing}")
        base = [
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in TRANSCRIPTS_SCHEMA
        ]
        extras = [
            F.col(c) for c in df.columns
            if c not in {f.name for f in TRANSCRIPTS_SCHEMA}
        ]
        return df.select(*base, *extras)
    if fmt == "json":
        return (
            spark.read.schema(TRANSCRIPTS_SCHEMA).option(
                "timestampFormat", _TS_FMT
            ).json(path)
        )
    if fmt == "csv":
        return (
            spark.read.schema(TRANSCRIPTS_SCHEMA)
            .option("header", "true")
            .option("timestampFormat", _TS_FMT)
            .option("multiLine", "true")
            .option("escape", '"')
            .csv(path)
        )
    if fmt == "iceberg":
        # table identifier, not a path; requires an Iceberg catalog on the
        # cluster (not shipped in this sandbox)
        return spark.read.table(path)
    raise ValueError(f"unsupported format: {fmt}")


def write_transcripts(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite"
) -> None:
    cols = [f.name for f in TRANSCRIPTS_SCHEMA.fields]
    out = df.select(*cols)
    if fmt == "parquet":
        out.write.mode(mode).parquet(path)
    elif fmt == "json":
        out.withColumn("ts", F.date_format("ts", _TS_FMT)).write.mode(mode).json(path)
    elif fmt == "csv":
        (
            out.withColumn("ts", F.date_format("ts", _TS_FMT))
            .write.mode(mode)
            .option("header", "true")
            .option("escape", '"')
            .csv(path)
        )
    elif fmt == "iceberg":
        out.writeTo(path).createOrReplace()
    else:
        raise ValueError(f"unsupported format: {fmt}")


def write_routed(
    df: DataFrame, base_path: str, route_col: str = "route", mode: str = "overwrite"
) -> None:
    """A14 dynamic sink partitioning: one physical partition per route value
    (the ES index-per-suffix analog, hidden-partitioning style)."""
    df.write.mode(mode).partitionBy(route_col).parquet(base_path)
