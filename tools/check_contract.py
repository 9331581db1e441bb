"""Local emulation of the driver's correctness gate.

Runs every queries() entry on Spark at a given sf and the matching
oracle_sql() on DuckDB with the testdata tables registered as views,
then compares row count, sorted column names, and an order-insensitive
value hash — approximating CORRECTNESS_r{N}.json before the driver does.

Usage: python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows: list[tuple]) -> str:
    canon = sorted(repr(r) for r in rows)
    return hashlib.md5("\n".join(canon).encode()).hexdigest()


def normalize(df_pandas, cols):
    out = []
    for row in df_pandas[cols].itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(round(v, 6))
            elif hasattr(v, "item"):
                vals.append(v.item())
            else:
                vals.append(v)
        out.append(tuple(vals))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from sync2any_spark.session import get_spark

    spark = get_spark("contract_check", cpus=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error {ex}")
            failures += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL  {name}: schema {scols} vs {ocols}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rows {len(sdf)} vs {len(odf)}")
            failures += 1
            continue
        sh = value_hash(normalize(sdf, scols))
        oh = value_hash(normalize(odf, scols))
        if sh != oh:
            print(f"FAIL  {name}: value hash mismatch ({len(sdf)} rows)")
            srows = set(map(repr, normalize(sdf, scols)))
            orows = set(map(repr, normalize(odf, scols)))
            for r in sorted(srows - orows)[:3]:
                print(f"   spark-only: {r}")
            for r in sorted(orows - srows)[:3]:
                print(f"   duck-only:  {r}")
            failures += 1
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    print(f"\n{failures} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
