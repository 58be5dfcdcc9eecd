"""Write-amplification evidence: CoW vs MoR MERGE at table ≫ epoch.

Builds a base table of ``--base-events`` rows, then applies
``--epochs`` small epochs of ``--epoch-events`` each (base/epoch ≥20×
by default) under both merge modes, measuring per-epoch wall time and
bytes actually written to the table directory.  The CoW path rewrites
every touched bucket (≈ the whole table per epoch under uniform key
hashing); the MoR path writes only the changed rows and amortizes via
compact().  Usage:

    python tools/bench_mor.py [--base-events 2000000] [--epoch-events 100000]
                              [--epochs 3] [--cpus 8]

Writes BENCH_MOR.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from realdeal_spark.cdc.apply import CdcApplier  # noqa: E402
from realdeal_spark.cdc.events import generate_change_events  # noqa: E402
from realdeal_spark.lake.table import LakeTable  # noqa: E402
from realdeal_spark.session import get_spark  # noqa: E402

PAGES_SCHEMA = (
    "url string, warc_ts timestamp_ntz, lsn bigint, html binary, lang string"
)


def dir_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def run_mode(spark, log, mode, base_events, epoch_events, epochs, n_buckets):
    root = f"/tmp/rds_morbench_{mode}_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    table = LakeTable.create(
        spark, root, PAGES_SCHEMA, ["url"], ["warc_ts", "lsn"],
        n_buckets=n_buckets, soft_delete=True,
    )
    applier = CdcApplier(table, merge_mode=mode)
    t0 = time.monotonic()
    applier.apply_epoch(log, 0, base_events - 1)
    base_wall = time.monotonic() - t0
    base_bytes = dir_bytes(root)

    per_epoch = []
    for i in range(epochs):
        lo = base_events + i * epoch_events
        hi = lo + epoch_events - 1
        b0 = dir_bytes(root)
        t0 = time.monotonic()
        applier.apply_epoch(log, lo, hi)
        wall = time.monotonic() - t0
        per_epoch.append(
            {"wall_sec": round(wall, 2), "bytes_written": dir_bytes(root) - b0}
        )
    compact_wall = None
    if mode == "mor":
        t0 = time.monotonic()
        table.compact(max_files_per_bucket=1)
        compact_wall = round(time.monotonic() - t0, 2)
    final_rows = table.read().count()
    shutil.rmtree(root, ignore_errors=True)
    return {
        "mode": mode,
        "base_wall_sec": round(base_wall, 2),
        "base_bytes": base_bytes,
        "epochs": per_epoch,
        "epoch_wall_median_sec": round(
            sorted(e["wall_sec"] for e in per_epoch)[len(per_epoch) // 2], 2
        ),
        "epoch_bytes_median": sorted(e["bytes_written"] for e in per_epoch)[
            len(per_epoch) // 2
        ],
        "compact_wall_sec": compact_wall,
        "final_rows": final_rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-events", type=int, default=2_000_000)
    ap.add_argument("--epoch-events", type=int, default=100_000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--n-urls", type=int, default=1_000_000)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark(
        "bench-mor", master=f"local[{args.cpus}]",
        shuffle_partitions=2 * args.cpus,
    )
    total = args.base_events + args.epochs * args.epoch_events
    log = generate_change_events(
        spark, n_events=total, n_urls=args.n_urls, delete_percent=5
    )

    results = {
        m: run_mode(
            spark, log, m, args.base_events, args.epoch_events, args.epochs,
            args.n_buckets,
        )
        for m in ("cow", "mor")
    }
    ratio_bytes = (
        results["cow"]["epoch_bytes_median"]
        / max(results["mor"]["epoch_bytes_median"], 1)
    )
    ratio_wall = (
        results["cow"]["epoch_wall_median_sec"]
        / max(results["mor"]["epoch_wall_median_sec"], 1e-9)
    )
    out = {
        "base_events": args.base_events,
        "epoch_events": args.epoch_events,
        "table_to_epoch_ratio": round(args.base_events / args.epoch_events, 1),
        "cow": results["cow"],
        "mor": results["mor"],
        "write_amplification_cow_over_mor": round(ratio_bytes, 1),
        "epoch_wall_cow_over_mor": round(ratio_wall, 2),
    }
    print(json.dumps(out))

    md = [
        "# BENCH_MOR — write amplification: CoW vs merge-on-read MERGE",
        "",
        f"Base table {args.base_events:,} rows; each epoch applies "
        f"{args.epoch_events:,} events (table/epoch = "
        f"{args.base_events // args.epoch_events}×), {args.n_buckets} buckets, "
        f"local[{args.cpus}].  Uniform key hashing → every epoch touches "
        "every bucket, the worst case for CoW.",
        "",
        "| metric | cow | mor |",
        "| --- | --- | --- |",
    ]
    for k in ("base_wall_sec", "epoch_wall_median_sec", "epoch_bytes_median",
              "compact_wall_sec", "final_rows"):
        md.append(f"| {k} | {results['cow'][k]} | {results['mor'][k]} |")
    md += [
        "",
        f"**Per-epoch bytes written: CoW is {out['write_amplification_cow_over_mor']}× "
        f"MoR; per-epoch wall: {out['epoch_wall_cow_over_mor']}×.**",
        "",
        "CoW rewrites ≈ the whole table per epoch once the batch's keys",
        "hash into every bucket; MoR writes O(changes) and amortizes the",
        "read-side reconcile with compact() (cost shown above).  At the",
        "north-rule scale (10^10 rows, realistic epoch sizes) the CoW",
        "column is the one that grows with table size; the MoR column is",
        "flat — this is why `merge_mode='mor'` is the 100-TB path.",
        "",
        "Raw per-epoch data:",
        "```json",
        json.dumps({m: results[m]["epochs"] for m in results}, indent=1),
        "```",
    ]
    with open(os.path.join(REPO, "BENCH_MOR.md"), "w") as f:
        f.write("\n".join(md) + "\n")


if __name__ == "__main__":
    main()
