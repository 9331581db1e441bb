"""Multi-table rule registry — the reference's config-driven fan-in.

The reference drives N source tables from one YAML config: each rule names
a database, a TABLE REGEX, per-table field filters / renames / routing, and
a target (``conf/RuleConfigParser.java:84-96`` builds the registry;
``extract/KafkaMsgListener.java:106-123`` consults it per message and
registers NEW tables appearing in DDL events at runtime). Spark-first
spelling: a rule is declarative config; applying it composes the §2.A
operators (project/rename/cast/route from ``ops.py``) into one DataFrame
plan per matched table.

Scale note: the registry itself is driver-side config (tiny); everything
it produces is a plain DataFrame transform, so N tables = N independent
plans — exactly how a multi-table sync job fans out on a cluster.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from .ops import project_and_rename, route, typed_cast


@dataclass
class SyncRule:
    """One sync rule (the reference's per-table rule object)."""

    table_pattern: str                     # regex over source table names
    target: str = "{table}"                # target name template
    field_filter: "list[str] | None" = None
    rename: dict = field(default_factory=dict)
    casts: dict = field(default_factory=dict)
    sharding_col: "str | None" = None      # dynamic routing (A14)
    n_shards: int = 8

    def matches(self, table: str) -> bool:
        return re.fullmatch(self.table_pattern, table) is not None

    def target_for(self, table: str) -> str:
        return self.target.format(table=table)


def parse_rules(config: "list[dict]") -> "list[SyncRule]":
    """Rule list from plain config dicts (the YAML shape, minus YAML)."""
    return [SyncRule(**c) for c in config]


class RuleRegistry:
    """table name → rule resolution + runtime registration (A6 DDL branch).

    ``resolve`` is first-match-wins over the config order, like the
    reference's registry. ``register_table`` is the DDL-event entry point:
    a CREATE TABLE seen on the stream calls it; if some rule's regex covers
    the new table it becomes active immediately (returned target), else the
    table is ignored — both reference behaviors
    (``extract/KafkaMsgListener.java:106-123``).
    """

    def __init__(self, rules: "list[SyncRule]") -> None:
        self.rules = rules
        self.active: dict[str, SyncRule] = {}

    def resolve(self, table: str) -> "SyncRule | None":
        if table in self.active:
            return self.active[table]
        for r in self.rules:
            if r.matches(table):
                self.active[table] = r
                return r
        return None

    def register_table(self, table: str) -> "str | None":
        """DDL 'new table' event → target name if a rule covers it."""
        r = self.resolve(table)
        return r.target_for(table) if r else None

    def apply(self, table: str, df: DataFrame) -> "tuple[str, DataFrame] | None":
        """(target, transformed DataFrame) for a matched table, else None.

        The transform is the §2.A operator composition the reference runs
        row-at-a-time: field filter + rename (A10/A11), typed casts (A9),
        routing column (A14).
        """
        r = self.resolve(table)
        if r is None:
            return None
        out = project_and_rename(df, r.field_filter, r.rename)
        if r.casts:
            out = typed_cast(out, r.casts)
        if r.sharding_col:
            out = route(
                out, sharding_col=r.sharding_col, n_shards=r.n_shards,
                prefix=r.target_for(table),
            )
        return r.target_for(table), out


def apply_rules(
    registry: RuleRegistry, tables: "dict[str, DataFrame]"
) -> "dict[str, DataFrame]":
    """Fan the registry over a catalog of source tables → {target: plan}.
    Unmatched tables are skipped (reference: unconfigured tables are not
    synced)."""
    out: dict[str, DataFrame] = {}
    for name, df in tables.items():
        hit = registry.apply(name, df)
        if hit is not None:
            out[hit[0]] = hit[1]
    return out
