"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at sf0.01, compares row count, column-name set, and the
order-insensitive multiset of stringified values (columns sorted by
name).  Exit 0 iff everything matches.

Usage: python tools/verify_entry.py [query ...]
"""

from __future__ import annotations

import sys
from collections import Counter
from datetime import datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    return repr(v)


def row_key(row: dict, cols: list[str]) -> tuple:
    return tuple(norm(row[c]) for c in cols)


def main() -> int:
    if "--plain-session" in sys.argv:
        # mimic a driver that builds a vanilla session (no UTC/NTZ/
        # Arrow configs) — queries must not depend on session conf
        sys.argv.remove("--plain-session")
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("verify-plain")
            .master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from realdeal_spark.session import get_spark

        spark = get_spark("verify-entry", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )

    wanted = sys.argv[1:]
    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if wanted and name not in wanted:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols_raw = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"duckdb error: {ex}"))
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        ocols = sorted(ocols_raw)
        if scols != ocols:
            failures.append((name, f"schema: spark={scols} oracle={ocols}"))
            print(f"FAIL {name}: schema mismatch\n  spark : {scols}\n  oracle: {ocols}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rows: spark={len(srows)} oracle={len(orows)}"))
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            continue
        smulti = Counter(row_key(r.asDict(), scols) for r in srows)
        idx = {c: i for i, c in enumerate(ocols_raw)}
        omulti = Counter(
            tuple(norm(r[idx[c]]) for c in ocols) for r in orows
        )
        if smulti != omulti:
            only_s = list((smulti - omulti).items())[:3]
            only_o = list((omulti - smulti).items())[:3]
            failures.append((name, "values"))
            print(f"FAIL {name}: value mismatch ({len(list((smulti - omulti).elements()))} rows differ)")
            for k, c in only_s:
                print(f"  spark-only x{c}: {k}")
            for k, c in only_o:
                print(f"  oracle-only x{c}: {k}")
            continue
        print(f"ok   {name}: {len(srows)} rows match")
    print(f"\n{len(failures)} failures" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
