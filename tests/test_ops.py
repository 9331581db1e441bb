"""ETL operator parity (SURVEY.md §2.A) — unit checks beyond the
contract-level oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sync2any_spark.pipeline import ops


def test_ordering_guard_detects_gap(spark):
    ok = spark.createDataFrame(
        [("c1", 0), ("c1", 1), ("c2", 0)], "conv_id string, turn_idx int"
    )
    assert ops.ordering_guard(ok).count() == 0
    gap = spark.createDataFrame(
        [("c1", 0), ("c1", 2)], "conv_id string, turn_idx int"
    )
    assert [r.conv_id for r in ops.ordering_guard(gap).collect()] == ["c1"]
    dup = spark.createDataFrame(
        [("c1", 0), ("c1", 0), ("c1", 1)], "conv_id string, turn_idx int"
    )
    assert ops.ordering_guard(dup).count() == 1


def test_doc_key_matches_reference_contract(spark):
    """PK parts sorted by name, '_'-joined (transform/RecordsTransform.java:110-125)."""
    df = spark.createDataFrame([("c9", 3)], "conv_id string, turn_idx int")
    assert ops.doc_key(df).first().pk_value == "c9_3"


def test_project_rename_lowercases_unmapped(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], "ID long, Name string, Val double")
    out = ops.project_and_rename(df, ["ID", "Name"], {"Name": "label"})
    assert out.columns == ["id", "label"]


def test_route_static_and_sharded(spark):
    df = spark.createDataFrame([("a",), ("b",)], "conv_id string")
    assert ops.route(df, static_route="fixed").first().route == "fixed"
    routed = ops.route(df, sharding_col="conv_id", n_shards=4).collect()
    assert all(r.route.startswith("transcripts_") for r in routed)


def test_event_fold_latest_wins(spark):
    ev = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")],
        "k long, v long, s string",
    )
    got = {r.k: r.s for r in ops.event_fold(ev, ["k"], "v").collect()}
    assert got == {1: "new", 2: "only"}


def test_typed_cast_null_to_zero(spark):
    df = spark.createDataFrame([("1",), (None,)], "x string")
    vals = [r.x for r in ops.typed_cast(df, {"x": "long"}).collect()]
    assert vals == [1, 0]


def test_threshold_alerts(spark):
    m = spark.createDataFrame(
        [("build", "wall_s", 5000.0), ("build", "docs_per_s", 10.0),
         ("spimi", "wall_s", 10.0)],
        "stage string, key string, value double",
    )
    reasons = {r.reason for r in ops.threshold_alerts(m).collect()}
    assert reasons == {"stage_wall_exceeded", "throughput_below_min"}


def test_lag_metrics(spark):
    t = spark.createDataFrame(
        [("c1", 0, "2026-01-01 00:00:00"), ("c1", 1, "2026-01-01 00:10:00")],
        "conv_id string, turn_idx int, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    row = ops.lag_metrics(t, indexed_at="2026-01-01 01:00:00").first()
    assert row.n_turns == 2
    assert row.delay_s == pytest.approx(3000.0)
