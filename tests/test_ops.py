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


def test_rule_registry_fanin_and_ddl_registration(spark):
    """Multi-table rule registry (reference conf/RuleConfigParser.java:84-96):
    one config drives N tables via regex; first-match-wins; DDL-time
    registration of a new table activates the covering rule
    (extract/KafkaMsgListener.java:106-123)."""
    from sync2any_spark.pipeline.rules import RuleRegistry, apply_rules, parse_rules

    rules = parse_rules(
        [
            {
                "table_pattern": r"events_\d+",
                "target": "idx_{table}",
                "field_filter": ["event_id", "event_type", "value"],
                "rename": {"event_type": "etype"},
                "casts": {"value": "double"},
                "sharding_col": "event_id",
                "n_shards": 4,
            },
            {"table_pattern": r"orders.*", "target": "orders_all"},
        ]
    )
    reg = RuleRegistry(rules)

    ev = spark.createDataFrame(
        [(1, "CLICK", "3.5", "x"), (2, "VIEW", None, "y")],
        "event_id long, event_type string, value string, extra string",
    )
    orders = spark.createDataFrame([(10, 99.0)], "o_id long, total double")
    misc = spark.createDataFrame([(1,)], "z long")

    out = apply_rules(reg, {"events_01": ev, "orders_eu": orders, "misc": misc})
    assert set(out) == {"idx_events_01", "orders_all"}  # misc unmatched

    got = out["idx_events_01"].collect()
    cols = out["idx_events_01"].columns
    assert cols == ["event_id", "etype", "value", "route"]  # filter+rename+route
    by_id = {r.event_id: r for r in got}
    assert by_id[1].value == 3.5          # cast applied
    assert by_id[2].value == 0.0          # null→0 numeric coercion (A9)
    assert by_id[1].route.startswith("idx_events_01_")  # dynamic routing

    # DDL event: a brand-new table matching the regex activates immediately
    assert reg.register_table("events_02") == "idx_events_02"
    # and an uncovered table is ignored
    assert reg.register_table("audit_log") is None
    # first-match-wins: events_02 resolves to rule 0, not the orders rule
    assert reg.resolve("events_02").table_pattern == r"events_\d+"


def test_alert_events_breach_suppress_realert_recover(spark):
    """A25 grouped alerting (MonitorTask.java:119-152): ALERT on first
    breach, suppression inside the window, RE_ALERT past it, RECOVERED on
    the first healthy observation; independent per group; deterministic on
    replay."""
    import datetime

    from sync2any_spark.pipeline.ops import alert_events

    t0 = datetime.datetime(2026, 8, 1, 12, 0, 0)

    def row(stage, minutes, value):
        return (stage, "delay_s", float(value),
                t0 + datetime.timedelta(minutes=minutes))

    rows = [
        # stage A: breach at 0 (ALERT), 5' and 30' suppressed (window 60'),
        # 70' still breaching (RE_ALERT), 80' healthy (RECOVERED),
        # 90' breach again (new episode → ALERT)
        row("a", 0, 900), row("a", 5, 950), row("a", 30, 920),
        row("a", 70, 910), row("a", 80, 10), row("a", 90, 905),
        # stage B: never breaches → no events
        row("b", 0, 5), row("b", 45, 7),
    ]
    metrics = spark.createDataFrame(
        rows, "stage string, key string, value double, ts timestamp"
    )
    events = alert_events(
        metrics, key="delay_s", threshold=600.0, suppress_s=3600.0
    )
    got = sorted(
        ((r.stage, int((r.ts - t0).total_seconds() // 60), r.event)
         for r in events.collect())
    )
    assert got == [
        ("a", 0, "ALERT"),
        ("a", 70, "RE_ALERT"),
        ("a", 80, "RECOVERED"),
        ("a", 90, "ALERT"),
    ]
    # replay determinism: same input → same events
    again = sorted(
        ((r.stage, int((r.ts - t0).total_seconds() // 60), r.event)
         for r in alert_events(metrics, threshold=600.0, suppress_s=3600.0).collect())
    )
    assert again == got
