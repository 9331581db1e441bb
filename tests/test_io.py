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


def test_parquet_read_keeps_appended_columns(spark, tmp_path):
    """Schema evolution at the source boundary (A6): appended columns
    survive read_transcripts; base columns validated + canonically typed;
    a missing base column fails loudly."""
    import datetime

    import pytest as _pytest

    from sync2any_spark.io import read_transcripts

    ts = datetime.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("c1", 0, "user", "hi", "", ts, "web")],
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, channel string",
    )
    p = str(tmp_path / "aug")
    df.write.parquet(p)
    got = read_transcripts(spark, p)
    assert got.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts", "channel"]
    assert got.first().channel == "web"

    bad = df.drop("text")
    pb = str(tmp_path / "bad")
    bad.write.parquet(pb)
    with _pytest.raises(ValueError, match="missing columns"):
        read_transcripts(spark, pb)


def test_build_through_rename_less_filesystem(spark, transcripts_sf0001, tmp_path_factory):
    """Object-store write protocol (round-2 What's-wrong #3): the whole
    build runs with every task-side write going through a pyarrow
    FileSystem in rename-less mode (direct PUT to the final key, manifest
    last) — and the result is query-identical to the default POSIX build.
    No .tmp- files may survive either build."""
    import os

    from pyarrow import fs as pafs

    from sync2any_spark.index.builder import build_index
    from sync2any_spark.index.fswrite import WriteFS
    from sync2any_spark.query.wand import IndexSearcher

    params = dict(n_partitions=8, n_buckets=8, n_salts=4,
                  heavy_df_threshold=500, resume=False)
    plain = str(tmp_path_factory.mktemp("idx_posix"))
    objs = str(tmp_path_factory.mktemp("idx_objstore"))
    build_index(spark, transcripts_sf0001, plain, **params)
    # rename-less: LocalFileSystem but with the object-store protocol —
    # exercises the direct-PUT branch of every kernel
    wfs = WriteFS(pafs.LocalFileSystem(), atomic_rename=False)
    build_index(spark, transcripts_sf0001, objs, filesystem=wfs, **params)

    for root, _dirs, files in os.walk(objs):
        assert not any(".tmp-" in f for f in files), (root, files)

    a = IndexSearcher(spark, plain)
    b = IndexSearcher(spark, objs)
    for q in ("ok", "ok w0000", "中 文", "hot1 hot2", "zzzzmissing"):
        assert a.search(q, 10) == b.search(q, 10), q
    assert a.n_docs == b.n_docs and a.avgdl == b.avgdl

    # the FUSED one-pass build writes docs files task-side too — run it
    # through the same rename-less filesystem (span_mb=0 → one span per
    # row group so the fused path actually engages on the tiny corpus)
    from sync2any_spark.generator import ensure_transcripts

    src = ensure_transcripts("sf0.001")
    fused = str(tmp_path_factory.mktemp("idx_objstore_fused"))
    build_index(
        spark, spark.read.parquet(src), fused, filesystem=wfs,
        source_path=src, span_mb=0, n_partitions=4, n_buckets=8,
        n_salts=4, heavy_df_threshold=500, resume=False,
    )
    for root, _dirs, files in os.walk(fused):
        assert not any(".tmp-" in f for f in files), (root, files)
    c = IndexSearcher(spark, fused)
    for q in ("ok", "ok w0000", "中 文"):
        assert a.search(q, 10) == c.search(q, 10), q
