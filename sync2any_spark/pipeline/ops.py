"""Pipeline operators — SURVEY.md §2.A parity, Spark-first.

The reference implements these row-at-a-time in Java; here each is the
idiomatic declarative composition, so Catalyst gets pushdown/pruning/
broadcast decisions for free (SURVEY.md §4.3). Each function cites the
reference behavior it reproduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ordering_guard(transcripts: DataFrame) -> DataFrame:
    """A5 dedup/ordering guard (``extract/KafkaMsgListener.java:220-232``).

    The reference requires per-shard sequence numbers to be +1-contiguous;
    our batch analog asserts ``turn_idx`` is exactly 0..n-1 per conversation.
    Returns the violating conversations (empty = invariant holds): gap or
    duplicate ⇒ row_number()-1 != turn_idx somewhere in the conv.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.withColumn("expected", F.row_number().over(w) - 1)
        .where(F.col("turn_idx") != F.col("expected"))
        .select("conv_id")
        .distinct()
    )


def doc_key(transcripts: DataFrame) -> DataFrame:
    """A12 composite-PK → doc id: PK columns sorted by name, joined with
    '_' (``transform/RecordsTransform.java:110-125``, ``README.md:150``).
    For transcripts the sorted PK is (conv_id, turn_idx)."""
    return transcripts.withColumn(
        "pk_value", F.concat_ws("_", F.col("conv_id"), F.col("turn_idx"))
    )


def project_and_rename(
    df: DataFrame,
    field_filter: list[str] | None = None,
    rename: dict[str, str] | None = None,
) -> DataFrame:
    """A10 field-filter + A11 rename map (``conf/RuleConfigParser.java:
    328-388``): keep only listed columns; rename per map; unmapped column
    names are lowercased (the reference's default)."""
    cols = field_filter or df.columns
    rename = rename or {}
    return df.select(
        *[F.col(c).alias(rename.get(c, c.lower())) for c in cols]
    )


def route(
    df: DataFrame,
    static_route: str | None = None,
    sharding_col: str | None = None,
    n_shards: int = 8,
    prefix: str = "transcripts",
) -> DataFrame:
    """A14 row routing / dynamic sink partitioning (``conf/RuleConfigParser.
    java:298-327``, ``load/DynamicDataAssign.java``): static rule name, or
    table name + suffix derived from a sharding column. The suffix strategy
    here is the hash analog of the reference's router lookup."""
    if static_route:
        expr = F.lit(static_route)
    elif sharding_col:
        expr = F.concat_ws(
            "_", F.lit(prefix), F.pmod(F.xxhash64(sharding_col), F.lit(n_shards))
        )
    else:
        expr = F.lit(prefix)
    return df.withColumn("route", expr)


def lookup_join(df: DataFrame, router: DataFrame, on: str) -> DataFrame:
    """A15 the reference's only join — cached suffix lookup
    (``load/impl/MysqlDynamicDataAssignImpl.java:24-59``) — as an explicit
    broadcast hash join (the Guava cache's distributed equivalent)."""
    return df.join(F.broadcast(router), on, "left")


def event_fold(
    events: DataFrame, key_cols: list[str], version_col: str
) -> DataFrame:
    """A19 append-only collapse (CollapsingMergeTree emulation,
    ``load/impl/CkLoadServiceImpl.java:110-130``): latest state per key =
    window row_number over version desc. Ties broken by the key for
    determinism."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), *[F.col(c) for c in key_cols]
    )
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def lag_metrics(
    transcripts: DataFrame, indexed_at: "str | None" = None
) -> DataFrame:
    """A24 lag/throughput metrics: per conversation, the delay between the
    newest source event and the index build time (the reference's
    ``lastSyncTime - lastDataManipulateTime`` delay,
    ``extract/KafkaMsgListener.java:276-283``)."""
    now = F.lit(indexed_at).cast("timestamp") if indexed_at else F.current_timestamp()
    return transcripts.groupBy("conv_id").agg(
        F.max("ts").alias("last_event_ts"),
        F.count("*").alias("n_turns"),
    ).withColumn(
        "delay_s",
        # NTZ-safe epoch seconds (session tz pinned UTC)
        now.cast("double")
        - F.col("last_event_ts").cast("timestamp").cast("double"),
    )


def threshold_alerts(
    metrics: DataFrame,
    max_stage_wall_s: float = 3600.0,
    min_docs_per_s: float = 100.0,
) -> DataFrame:
    """A25 threshold alerting over the metrics table (``MonitorTask.java:
    22-153``): stages that breach wall/throughput thresholds. Returns
    (stage, key, value, reason) — empty means healthy."""
    slow = (
        metrics.where((F.col("key") == "wall_s") & (F.col("value") > max_stage_wall_s))
        .withColumn("reason", F.lit("stage_wall_exceeded"))
    )
    low_thr = (
        metrics.where(
            (F.col("key") == "docs_per_s") & (F.col("value") < min_docs_per_s)
        ).withColumn("reason", F.lit("throughput_below_min"))
    )
    return slow.unionByName(low_thr).select("stage", "key", "value", "reason")


def alert_events(
    metrics: DataFrame,
    key: str = "delay_s",
    threshold: float = 600.0,
    suppress_s: float = 3600.0,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """A25 grouped alerting with recovery detection and a re-alert
    suppression window (``MonitorTask.java:119-152``): per group (default:
    ``stage``), a threshold breach opens an alert EPISODE — ALERT fires on
    the first breaching observation, further breaches inside ``suppress_s``
    of the episode anchor are suppressed, a breach after the window fires
    RE_ALERT (re-anchoring per elapsed window), and the first observation
    back under threshold fires RECOVERED.

    Pure window algebra, no driver state: episodes are a running count of
    breach starts (the classic gaps-and-islands sessionization), re-alert
    slots are ``floor(Δt/suppress_s)`` within an episode — both computed in
    one pass per group, so the operator scales to any metrics volume and is
    deterministic on replays (the reference keeps this state in mutable
    maps; a replayed monitor here emits identical events).

    Input: observations ``(group_cols…, key, value, ts)``; output:
    ``(group_cols…, ts, value, event)`` for event ∈ ALERT, RE_ALERT,
    RECOVERED."""
    group_cols = group_cols or ["stage"]
    obs = metrics.where(F.col("key") == key).select(
        *group_cols, "value", "ts",
        (F.col("value") > threshold).alias("breach"),
    )
    w = Window.partitionBy(*group_cols).orderBy("ts")
    state = (
        obs.withColumn("prev_breach", F.lag("breach", 1, False).over(w))
        # episode id: running count of breach-starts; rows before the first
        # breach get episode 0, which never emits
        .withColumn(
            "episode",
            F.sum(
                (F.col("breach") & ~F.col("prev_breach")).cast("int")
            ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    we = Window.partitionBy(*group_cols, "episode").orderBy("ts")
    # episode anchor = min breach ts of the episode (the episode partition
    # BEGINS at its breach row, so this equals "first row's ts" — spelled
    # as a min so the SQL oracle can express it identically)
    wep = Window.partitionBy(*group_cols, "episode")
    slotted = (
        state.withColumn(
            "ep_start", F.min(F.when(F.col("breach"), F.col("ts"))).over(wep)
        )
        .withColumn(
            "slot",
            # NTZ-safe epoch seconds (session tz is pinned UTC, so the
            # ntz→ltz hop is identity and matches DuckDB's epoch())
            F.floor(
                (
                    F.col("ts").cast("timestamp").cast("double")
                    - F.col("ep_start").cast("timestamp").cast("double")
                )
                / F.lit(float(suppress_s))
            ),
        )
        .withColumn("prev_slot", F.lag("slot", 1).over(we))
    )
    alerts = slotted.where(
        F.col("breach")
        & (F.col("prev_slot").isNull() | (F.col("slot") != F.col("prev_slot"))
           | ~F.col("prev_breach"))
    ).select(
        *group_cols, "ts", "value",
        F.when(F.col("prev_breach"), F.lit("RE_ALERT"))
        .otherwise(F.lit("ALERT"))
        .alias("event"),
    )
    recoveries = state.where(~F.col("breach") & F.col("prev_breach")).select(
        *group_cols, "ts", "value", F.lit("RECOVERED").alias("event")
    )
    return alerts.unionByName(recoveries)


def typed_cast(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """A9 scalar casts with null→0 default for numerics, mirroring the
    ClickHouse coercion (``load/impl/CkLoadServiceImpl.java:228-276``)."""
    out = df
    for col, typ in casts.items():
        c = F.col(col).cast(typ)
        if typ in ("long", "double", "int", "float"):
            c = F.coalesce(c, F.lit(0).cast(typ))
        out = out.withColumn(col, c)
    return out
