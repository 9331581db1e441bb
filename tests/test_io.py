"""Source/sink formats: the same corpus must round-trip parquet/json/csv
bit-identically (schema fixed, never inferred)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sync2any_spark.io import read_transcripts, write_routed, write_transcripts
from sync2any_spark.pipeline.ops import route


@pytest.fixture(scope="module")
def sample(spark, transcripts_sf0001):
    # CJK, JSON braces, empties and quotes all present in the corpus slice
    return transcripts_sf0001.limit(500)


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_roundtrip(spark, sample, tmp_path, fmt):
    p = str(tmp_path / fmt)
    write_transcripts(sample, p, fmt)
    back = read_transcripts(spark, p, fmt)
    a = sorted(map(tuple, sample.collect()))
    b = sorted(map(tuple, back.collect()))
    # csv cannot distinguish empty string from null — normalize that one case
    if fmt == "csv":
        a = [tuple(None if v == "" else v for v in r) for r in a]
        b = [tuple(None if v == "" else v for v in r) for r in b]
    assert a == b


def test_routed_write_partitions(spark, sample, tmp_path):
    routed = route(sample, sharding_col="conv_id", n_shards=4)
    base = str(tmp_path / "routed")
    write_routed(routed, base)
    back = spark.read.parquet(base)
    assert back.count() == sample.count()
    assert back.select("route").distinct().count() <= 4
    # physical layout: one directory per route (pruning-ready)
    import os

    dirs = [d for d in os.listdir(base) if d.startswith("route=")]
    assert len(dirs) == back.select("route").distinct().count()


def test_unknown_format_rejected(spark, sample, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_transcripts(sample, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError, match="unsupported format"):
        read_transcripts(spark, str(tmp_path / "x"), "avro")
