"""Changes-feed → rollup soak at amplified scale (round-4 advice #7).

Grows a LakeTable over E epochs (bulk inserts + updates + deletes)
and, after every epoch, times BOTH ways of bringing the maintained
rollup current:

- ``advance``   — rollup_advance over the CDF interval (O(changes):
  two narrow groupBys over the feed + one outer join with the state;
  min/max measures add a dirty-group-pruned rescan)
- ``recompute`` — rollup_full over the whole table (O(table))

The claim to evidence: advance stays ~flat as the table grows while
recompute grows with table size.  Runs the identical soak in a fresh
JVM per parallelism level (local[8], local[32]) for the two-cluster-
size scaling picture.  Writes BENCH_ROLLUP.md.

Usage: python tools/bench_rollup_soak.py [--epochs 6] [--epoch-rows 150000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = '''
import json, shutil, sys, time, datetime as dt
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from realdeal_spark.session import get_spark
from realdeal_spark.lake import LakeTable, merge_apply
from realdeal_spark.cdc.rollup import Measure, rollup_advance, rollup_full

cpus, epochs, epoch_rows = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = get_spark("rollup-soak", master=f"local[{cpus}]",
                  shuffle_partitions=2 * cpus)
root = f"/tmp/rollup_soak_{cpus}"
shutil.rmtree(root, ignore_errors=True)
t = LakeTable.create(spark, root + "/t",
    "k bigint, ts timestamp_ntz, lsn bigint, cat string, v double",
    ["k"], ["ts", "lsn"], n_buckets=max(16, cpus), soft_delete=True)

MEASURES = [
    Measure("n", "count"),
    Measure("sv", "sum", "v"),
    Measure("mx", "max", "ts"),
]
base = dt.datetime(2024, 1, 1)

def epoch_batch(e):
    """epoch_rows new keys, plus updates/deletes of old keys
    restricted to a 12-of-1000 band of categories (cat = k % 1000):
    the dirty-group set stays small — the dashboard-shaped workload
    the O(changed groups) min/max rescan is built for.  One row per
    key (pre-conflated), fully deterministic."""
    new = (spark.range(e * epoch_rows, (e + 1) * epoch_rows)
        .select(F.col("id").alias("k"), F.lit("insert").alias("op")))
    parts = [new]
    if e > 0:
        old = spark.range(0, e * epoch_rows)
        band = (e * 37) % 988
        parts.append(old.where((F.col("id") % 1000).between(band, band + 9))
            .select(F.col("id").alias("k"), F.lit("update").alias("op")))
        parts.append(old.where((F.col("id") % 1000).between(band + 10, band + 11))
            .select(F.col("id").alias("k"), F.lit("delete").alias("op")))
    ev = parts[0]
    for p in parts[1:]:
        ev = ev.unionByName(p)
    # deletes win over updates for the same key inside the batch
    ev = (ev.withColumn("_pri", F.when(F.col("op") == "delete", 0).otherwise(1))
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy("k").orderBy("_pri")))
        .where(F.col("_rn") == 1).drop("_pri", "_rn"))
    lsn = F.col("k") + F.lit(e * 10_000_000_000)
    return ev.select(
        "k",
        (F.lit(base) + F.make_interval(secs=lsn % 86400)).alias("ts"),
        lsn.alias("lsn"),
        F.when(F.col("op") == "delete", F.lit(None))
         .otherwise(F.concat(F.lit("c"), (F.col("k") % 1000).cast("string")))
         .alias("cat"),
        F.when(F.col("op") == "delete", F.lit(None))
         .otherwise((F.col("k") % 1000) / 7.0).alias("v"),
        "op",
    )

rows = []
state, prev_v = None, None
for e in range(epochs):
    merge_apply(t, epoch_batch(e))
    v = t.current_version()
    if state is None:
        t0 = time.time()
        state = rollup_full(t, ["cat"], MEASURES, version=v).localCheckpoint(eager=True)
        adv = time.time() - t0
    else:
        t0 = time.time()
        state = rollup_advance(t, state, prev_v, v, ["cat"], MEASURES)
        state = state.localCheckpoint(eager=True)
        adv = time.time() - t0
    t0 = time.time()
    full = rollup_full(t, ["cat"], MEASURES, version=v).localCheckpoint(eager=True)
    rec = time.time() - t0
    if e == epochs - 1:  # equivalence spot-check on the last epoch
        a = sorted(map(tuple, state.collect()))
        b = sorted(map(tuple, full.collect()))
        assert a == b, "advance diverged from recompute"
    prev_v = v
    rows.append({"epoch": e, "table_rows": t.read().count(),
                 "advance_sec": round(adv, 2), "recompute_sec": round(rec, 2)})
print(json.dumps({"cpus": cpus, "rows": rows}))
'''


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--epoch-rows", type=int, default=150_000)
    ap.add_argument("--cpus", type=int, nargs="+", default=[8, 32])
    args = ap.parse_args()

    per_cpu = {}
    for cpus in args.cpus:
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(cpus), str(args.epochs),
             str(args.epoch_rows)],
            capture_output=True, text=True, cwd=REPO,
        )
        if out.returncode != 0:
            raise RuntimeError(f"cpus={cpus} failed:\n{out.stderr[-3000:]}")
        last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        per_cpu[cpus] = json.loads(last)["rows"]

    md = [
        "# BENCH_ROLLUP — changes-feed vs recompute as the table grows "
        "(round 4)",
        "",
        f"{args.epochs} epochs × {args.epoch_rows:,} new keys, plus updates/"
        "deletes of prior keys in a 12-of-1000 category band per epoch "
        "(small dirty-group set — the dashboard workload); measures = "
        "count, DECIMAL sum, max(ts) (the non-additive path with its "
        "dirty-group rescan); advance == recompute asserted at the final "
        "epoch.  Fresh JVM per parallelism level.",
        "",
    ]
    for cpus, rows in per_cpu.items():
        md += [f"## local[{cpus}]", "",
               "| epoch | table rows | advance (s) | recompute (s) |",
               "|---|---|---|---|"]
        for r in rows:
            md.append(
                f"| {r['epoch']} | {r['table_rows']:,} | {r['advance_sec']} "
                f"| {r['recompute_sec']} |"
            )
        first_adv = rows[1]["advance_sec"] if len(rows) > 1 else None
        last_adv = rows[-1]["advance_sec"]
        md += [
            "",
            f"advance epoch-1 → epoch-{len(rows)-1}: {first_adv} → "
            f"{last_adv} s (flat = O(changes)); recompute "
            f"{rows[1]['recompute_sec']} → {rows[-1]['recompute_sec']} s "
            "(grows with the table).",
            "",
        ]
    with open(os.path.join(REPO, "BENCH_ROLLUP.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({"bench": "rollup_soak", "per_cpu": per_cpu}))


if __name__ == "__main__":
    main()
