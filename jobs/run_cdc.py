"""spark-submit entry point: tail a change log into a lake table.

Cluster run (north_rule deployment shape)::

    zip -r realdeal_spark.zip realdeal_spark
    spark-submit --py-files realdeal_spark.zip jobs/run_cdc.py \
        --table /data/lake/pages --events /data/changelog \
        --epoch-size 10000000 --extract-text

Sandbox run (synthetic log, two parallelism levels — the scaling
evidence)::

    python jobs/run_cdc.py --synthetic-events 2000000 --cpus 8
    python jobs/run_cdc.py --synthetic-events 2000000 --cpus 32

The job is resumable: the applier reads its resume point from the
table's own snapshot history (applied epoch ids), so re-running after
a crash re-applies nothing (exactly-once) and continues from the
first uncommitted epoch.  Per-epoch lineage + throughput metrics are
printed as JSON lines.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realdeal_spark.cdc.apply import CdcApplier
from realdeal_spark.cdc.events import EVENT_SCHEMA, generate_change_events
from realdeal_spark.extract.html_text import with_text
from realdeal_spark.lake.table import LakeTable
from realdeal_spark.session import get_spark

PAGES_SCHEMA = (
    "url string, warc_ts timestamp_ntz, lsn bigint, html binary, "
    "text string, lang string"
)


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", default=None, help="lake table root (created if absent)")
    ap.add_argument("--events", default=None, help="parquet path of the change log")
    ap.add_argument("--synthetic-events", type=int, default=0,
                    help="generate N synthetic events instead of --events")
    ap.add_argument("--n-urls", type=int, default=0,
                    help="distinct urls in the synthetic log (default events/20)")
    ap.add_argument("--hot-share", type=int, default=10,
                    help="%% of synthetic events on one hot url (skew)")
    ap.add_argument("--epoch-size", type=int, default=1_000_000)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--extract-text", action="store_true",
                    help="run the vectorized html→text extractor per epoch")
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[N] master; omit under a cluster manager")
    ap.add_argument("--max-epochs", type=int, default=None)
    ap.add_argument("--conflate", default="auto",
                    choices=["auto", "light", "max_by", "window"],
                    help="conflation strategy (auto: light for binary "
                         "payloads, else max_by)")
    ap.add_argument("--salt-buckets", type=int, default=None,
                    help="with --conflate window: two-phase salted "
                         "dedup for hot-key logs")
    ap.add_argument("--merge-mode", default="cow", choices=["cow", "mor"],
                    help="cow rewrites touched buckets; mor appends "
                         "per-bucket deltas (O(changes) writes)")
    ap.add_argument("--compact-every", type=int, default=None,
                    help="with mor: fold deltas into base every N epochs")
    ap.add_argument("--report-dir", default=None,
                    help="write per-epoch JSONL + HTML report artifacts here")
    ap.add_argument("--quarantine-dir", default=None,
                    help="dead-letter dir: route unknown-op / null-key / "
                         "null-order events to per-epoch parquet instead "
                         "of applying or failing")
    args = ap.parse_args(argv)

    spark = get_spark(
        "realdeal-cdc",
        master=f"local[{args.cpus}]" if args.cpus else None,
        shuffle_partitions=2 * args.cpus if args.cpus else None,
    )

    if args.synthetic_events:
        log = generate_change_events(
            spark,
            n_events=args.synthetic_events,
            n_urls=args.n_urls or max(args.synthetic_events // 20, 100),
            hot_share_percent=args.hot_share,
        )
        n_events = args.synthetic_events
    elif args.events:
        log = spark.read.schema(EVENT_SCHEMA).parquet(args.events)
        n_events = log.count()
    else:
        ap.error("one of --events / --synthetic-events is required")

    table_root = args.table or os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"rds_cdc_table_{os.getpid()}"
    )
    if LakeTable.exists(table_root):
        table = LakeTable(spark, table_root)
    else:
        table = LakeTable.create(
            spark, table_root, PAGES_SCHEMA,
            key_columns=["url"], order_columns=["warc_ts", "lsn"],
            n_buckets=args.n_buckets, soft_delete=True,
        )

    transform = with_text if args.extract_text else None
    report_sink = None
    if args.report_dir:
        from realdeal_spark.report import EpochReportSink

        report_sink = EpochReportSink(args.report_dir)
    applier = CdcApplier(
        table, lsn_col="lsn", transform=transform,
        conflate_strategy=args.conflate, merge_mode=args.merge_mode,
        compact_every=args.compact_every, report_sink=report_sink,
        salt_buckets=args.salt_buckets, quarantine_dir=args.quarantine_dir,
    )

    bounds = (0, args.synthetic_events - 1) if args.synthetic_events else None
    t0 = time.monotonic()
    reports = applier.run(
        log, epoch_size=args.epoch_size, max_epochs=args.max_epochs, lsn_bounds=bounds
    )
    wall = time.monotonic() - t0
    for r in reports:
        print(r.to_json(), file=sys.stderr)

    applied = sum(r.events_in for r in reports)
    summary = {
        "events": applied,
        "quarantined": sum(r.quarantined for r in reports),
        "epochs": len(reports),
        "wall_sec": round(wall, 3),
        "events_per_sec": round(applied / wall, 1) if wall else 0.0,
        "table": table_root,
        "snapshots": table.current_version(),
        "cpus": args.cpus,
        "n_input_events": n_events,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
