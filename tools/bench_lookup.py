"""Point-lookup + manifest-spill soak at amplified scale.

Builds a key-bloomed MoR table of ``--keys`` urls across ``--epochs``
epochs (each epoch revisits a disjoint key slice, so generations
accumulate per bucket without compaction — the regime the bloom
sidecars exist for), then measures:

1. **lookup latency** — ``LakeTable.lookup`` of ``--lookup-keys``
   random present keys, median of ``--reps``;
2. **scan-filter latency** — the same answer via
   ``read().where(key IN …)`` (what a user without the index runs);
3. **files pruned** — the lookup's candidate stats vs the buckets'
   total file count;
4. **commit metadata IO** — bytes of snapshot JSON + new manifest
   files written by the LAST epoch under manifest spill vs the size
   the inline inventory would have been (the O(touched buckets) vs
   O(table files) claim, measured not asserted).

Usage:
    python tools/bench_lookup.py [--keys 2000000] [--epochs 12]
        [--lookup-keys 64] [--reps 5] [--cpus 16] [--buckets 64]

Writes BENCH_LOOKUP.md and prints one JSON line.
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

import realdeal_spark.lake.table as TBL  # noqa: E402
from realdeal_spark.lake.merge import merge_apply  # noqa: E402
from realdeal_spark.lake.table import LakeTable  # noqa: E402
from realdeal_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

SCHEMA = (
    "url string, v bigint, ts bigint, lsn bigint, lang string, html string"
)


def _batch(spark, lo, hi, ts_shift=0):
    # ~1 KB hash-derived payload per row: lookups against web-page
    # tables are IO-bound on the payload, not the key columns
    return spark.range(lo, hi).select(
        F.format_string("https://site%d.example.com/p/%d",
                        (F.col("id") % 50).cast("int"), F.col("id")).alias("url"),
        (F.col("id") * 10).alias("v"),
        (F.col("id") + ts_shift).alias("ts"),
        (F.col("id") + ts_shift).alias("lsn"),
        # two deterministic rarity tiers vs the common lang%02d values:
        # RARE ~1/9973 of rows (matched keys ≈ bucket count — the
        # break-even shape) and ULTRA ~1/39989 (matched keys << bucket
        # count — the regime a secondary index exists for: the key
        # fan-out touches a small FRACTION of the buckets)
        F.when(F.col("id") % 39989 == 1, F.lit("langULTRA"))
        .when(F.col("id") % 9973 == 0, F.lit("langRARE"))
        .otherwise(
            F.format_string("lang%02d", (F.col("id") % 23).cast("int"))
        ).alias("lang"),
        F.repeat(F.sha2(F.col("id").cast("string"), 256), 16).alias("html"),
        F.lit("upsert").alias("op"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=2_000_000)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--lookup-keys", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args()

    TBL.MANIFEST_SPILL_MIN = 0  # measure the spilled-metadata path
    spark = get_spark(
        "bench-lookup",
        master=f"local[{args.cpus}]",
        shuffle_partitions=2 * args.cpus,
    )
    root = "/tmp/bench_lookup_tbl"
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree("/tmp/bench_lookup_idx", ignore_errors=True)
    t = LakeTable.create(
        spark, root, SCHEMA, ["url"], ["ts", "lsn"],
        n_buckets=args.buckets, soft_delete=True, key_blooms=True,
    )
    per_epoch = args.keys // args.epochs
    mdir = os.path.join(root, "_meta", "manifests")
    build_t0 = time.monotonic()
    for i in range(args.epochs):
        merge_apply(
            t,
            _batch(spark, i * per_epoch, (i + 1) * per_epoch, ts_shift=i),
            mode="mor",
            epoch_id=f"e{i}",
        )
    build_wall = round(time.monotonic() - build_t0, 3)

    # ---- commit metadata IO of a NARROW epoch (keys of ONE bucket —
    # the shape of a real incremental trickle): spilled vs inline
    pre_manifests = set(os.listdir(mdir))
    narrow = _batch(spark, 0, 5_000, ts_shift=10**6).where(
        F.pmod(F.xxhash64("url"), F.lit(args.buckets)) == 0
    )
    merge_apply(t, narrow, mode="mor", epoch_id="narrow")
    new_manifests = set(os.listdir(mdir)) - pre_manifests
    snap = t.snapshot()
    snap_bytes = os.path.getsize(t._snap_path(snap.version))
    new_manifest_bytes = sum(
        os.path.getsize(os.path.join(mdir, fn)) for fn in new_manifests
    )
    inline_bytes = len(snap.to_json().encode())
    spilled_commit_bytes = snap_bytes + new_manifest_bytes

    # ---- lookup vs scan-filter
    present = [
        f"https://site{(i % 50)}.example.com/p/{i}"
        for i in range(0, args.keys, max(1, args.keys // args.lookup_keys))
    ][: args.lookup_keys]

    def force(df):
        # a lookup's deliverable is the ROWS — materialize the payload
        # on both paths (count alone lets the columnar scan skip the
        # ~1 KB html column entirely, timing a different query)
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("html")).alias("b"),
        ).first()
        return int(r["n"]), int(r["b"] or 0)

    def timed(fn):
        per = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            n = fn()
            per.append(round(time.monotonic() - t0, 3))
        return sorted(per)[len(per) // 2], n

    lk_med, lk_n = timed(lambda: force(t.lookup(present)))
    sc_med, sc_n = timed(
        lambda: force(t.read().where(F.col("url").isin(present)))
    )
    assert lk_n == sc_n, (lk_n, sc_n)

    # the serving shape: ONE key — lookup plans a single bucket's
    # sidecars; the scan-filter still reconciles every bucket
    one = present[:1]
    lk1_med, lk1_n = timed(lambda: force(t.lookup(one)))
    sc1_med, sc1_n = timed(
        lambda: force(t.read().where(F.col("url").isin(one)))
    )
    assert lk1_n == sc1_n and lk1_n[0] == 1, (lk1_n, sc1_n)
    _, _, stats1, _ = t._lookup_candidates(snap, t._keys_frame(snap, one))

    _, allow, stats, _ = t._lookup_candidates(snap, t._keys_frame(snap, present))

    # ---- secondary value index: "current rows with lang = X" served
    # through the value-bucketed index (probed buckets → key set →
    # bloom-pruned base lookup) vs the indexless full reconcile +
    # filter.  Rare-value serving shape: one lang ≈ 1/23 of the keys.
    from realdeal_spark.lake.valueindex import (  # noqa: E402
        advance_value_index, create_value_index, lookup_by_value,
    )

    idx = create_value_index(
        t, "/tmp/bench_lookup_idx", "lang", n_buckets=args.buckets
    )
    vix_t0 = time.monotonic()
    advance_value_index(t, idx, "lang")  # snapshot bootstrap (default)
    vix_build = round(time.monotonic() - vix_t0, 3)
    # post-bootstrap maintenance: one compaction folds the bootstrap
    # merge's per-shuffle-partition files to one file per value bucket,
    # so a probe reads exactly one file per probed value
    vix_c0 = time.monotonic()
    idx.compact()
    vix_compact = round(time.monotonic() - vix_c0, 3)
    vl_med, vl_n = timed(
        lambda: force(lookup_by_value(
            t, idx, "lang", ["lang07"], scan_fallback_fraction=None
        ))
    )
    vs_med, vs_n = timed(
        lambda: force(t.read().where(F.col("lang") == "lang07"))
    )
    assert vl_n == vs_n, (vl_n, vs_n)
    # auto planner on the same common value: crosses over to scan
    va_med, va_n = timed(
        lambda: force(lookup_by_value(t, idx, "lang", ["lang07"]))
    )
    assert va_n == vs_n, (va_n, vs_n)
    # the RARE value (~keys/9973 rows): the index's regime — auto
    # planner stays on the key fan-out path
    rl_med, rl_n = timed(
        lambda: force(lookup_by_value(t, idx, "lang", ["langRARE"]))
    )
    rs_med, rs_n = timed(
        lambda: force(t.read().where(F.col("lang") == "langRARE"))
    )
    assert rl_n == rs_n and rl_n[0] > 0, (rl_n, rs_n)
    # the quantity that scales: how many base files the rare value's
    # key set actually opens vs the table total (wall time at 2 GB is
    # overhead-bound; bytes-not-read is what 100 TB feels)
    rare_keys = (
        t.read()
        .where(F.col("lang") == "langRARE")
        .select("url")
        .distinct()
    )
    _, _, rstats, _ = t._lookup_candidates(snap, t._keys_frame(snap, rare_keys))

    # ---- the same rare-value serve after BASE compaction — the
    # steady-state regime (a 100-TB table is compacted continuously;
    # 12 uncompacted MoR generations is the worst case, not the
    # normal one).  Compaction folds every bucket to one base file
    # and re-enables stats skipping, so both paths speed up; what the
    # comparison isolates is the index's floor vs the scan's
    # O(buckets) reconcile at the table's best layout.
    bc0 = time.monotonic()
    t.compact()
    base_compact_sec = round(time.monotonic() - bc0, 3)
    csnap = t.snapshot()
    rlc_med, rlc_n = timed(
        lambda: force(lookup_by_value(t, idx, "lang", ["langRARE"]))
    )
    rsc_med, rsc_n = timed(
        lambda: force(t.read().where(F.col("lang") == "langRARE"))
    )
    assert rlc_n == rsc_n == rl_n, (rlc_n, rsc_n, rl_n)
    _, _, rcstats, _ = t._lookup_candidates(
        csnap, t._keys_frame(csnap, rare_keys)
    )
    # ULTRA-rare (matched keys << buckets): the index's win regime —
    # the key fan-out leaves most buckets untouched, so the lookup
    # reads a small fraction of the (compacted) table while the scan
    # still reads all of it
    ul_med, ul_n = timed(
        lambda: force(lookup_by_value(t, idx, "lang", ["langULTRA"]))
    )
    us_med, us_n = timed(
        lambda: force(t.read().where(F.col("lang") == "langULTRA"))
    )
    assert ul_n == us_n and ul_n[0] > 0, (ul_n, us_n)
    ultra_keys = (
        t.read()
        .where(F.col("lang") == "langULTRA")
        .select("url")
        .distinct()
    )
    _, _, ucstats, _ = t._lookup_candidates(
        csnap, t._keys_frame(csnap, ultra_keys)
    )

    out = {
        "metric": "bloom point-lookup vs scan-filter + manifest-spill commit IO",
        "keys": args.keys,
        "epochs": args.epochs,
        "buckets": args.buckets,
        "cpus": args.cpus,
        "build_wall_sec": build_wall,
        "lookup_keys": len(present),
        "rows_returned": lk_n[0],
        "payload_bytes_returned": lk_n[1],
        "lookup_median_sec": lk_med,
        "scan_filter_median_sec": sc_med,
        "speedup": round(sc_med / lk_med, 2) if lk_med else None,
        "files_in_buckets": stats["files_in_buckets"],
        "files_read": stats["files_read"],
        "files_pruned": stats["files_pruned"],
        "single_key_lookup_median_sec": lk1_med,
        "single_key_scan_filter_median_sec": sc1_med,
        "single_key_speedup": round(sc1_med / lk1_med, 2) if lk1_med else None,
        "single_key_files_read": stats1["files_read"],
        "single_key_files_in_table": sum(
            len(fl) for fl in snap.files.values()
        ),
        "value_index_build_sec": vix_build,
        "value_index_compact_sec": vix_compact,
        "value_lookup_rows": vl_n[0],
        "value_lookup_median_sec": vl_med,
        "value_scan_filter_median_sec": vs_med,
        "value_lookup_speedup": round(vs_med / vl_med, 2) if vl_med else None,
        "value_auto_median_sec": va_med,
        "rare_value_rows": rl_n[0],
        "rare_value_lookup_median_sec": rl_med,
        "rare_value_scan_filter_median_sec": rs_med,
        "rare_value_speedup": round(rs_med / rl_med, 2) if rl_med else None,
        "rare_value_files_read": rstats["files_read"],
        "rare_value_files_in_buckets": rstats["files_in_buckets"],
        "base_compact_sec": base_compact_sec,
        "rare_value_lookup_compacted_sec": rlc_med,
        "rare_value_scan_compacted_sec": rsc_med,
        "rare_value_speedup_compacted": (
            round(rsc_med / rlc_med, 2) if rlc_med else None
        ),
        "rare_value_files_read_compacted": rcstats["files_read"],
        "rare_value_files_in_buckets_compacted": rcstats["files_in_buckets"],
        "ultra_rare_rows": ul_n[0],
        "ultra_rare_lookup_sec": ul_med,
        "ultra_rare_scan_sec": us_med,
        "ultra_rare_speedup": round(us_med / ul_med, 2) if ul_med else None,
        "ultra_rare_files_read": ucstats["files_read"],
        "ultra_rare_files_in_table": sum(
            len(fl) for fl in csnap.files.values()
        ),
        "narrow_commit_bytes_spilled": spilled_commit_bytes,
        "narrow_commit_bytes_inline_equiv": inline_bytes,
        "metadata_io_ratio": round(inline_bytes / spilled_commit_bytes, 2),
        "new_manifests_narrow_epoch": len(new_manifests),
    }
    print(json.dumps(out))

    with open(os.path.join(REPO, "BENCH_LOOKUP.md"), "w") as f:
        f.write(
            "# BENCH_LOOKUP — bloom point lookup + manifest-spill commit IO\n\n"
            f"MoR table: {args.keys:,} urls, {args.epochs} uncompacted epochs "
            f"(disjoint key slices), {args.buckets} buckets, key_blooms on, "
            f"local[{args.cpus}], median of {args.reps} reps.\n\n"
            "| metric | value |\n| --- | --- |\n"
            + "".join(f"| {k} | {v} |\n" for k, v in out.items() if k != "metric")
            + "\nThe scan-filter row is the same answer computed without the "
            "index (`read().where(url IN …)`), i.e. a full reconcile of the "
            "keys' buckets.  `files_read` vs `files_in_buckets` is the bloom "
            "sidecars' pruning on the lookup's own buckets.  The commit-IO "
            "rows compare the LAST epoch's metadata write under manifest "
            "spill (snapshot JSON + newly created manifest files) against "
            "the byte size the inline inventory would have been — the "
            "O(touched buckets) vs O(table files) lever.  The value_* rows "
            "serve `lang = 'lang07'` (≈1/23 of current rows) through the "
            "secondary value index (lake/valueindex.py: probed value "
            "buckets → key set → bloom-pruned base lookup) vs the "
            "indexless full-reconcile filter; value_index_build_sec is the "
            "one-shot SNAPSHOT bootstrap (one pruned base scan — the "
            "round-4 feed-replay bootstrap of this same table cost 428 s) "
            "and value_index_compact_sec the post-bootstrap compaction "
            "folding the index to one file per value bucket (steady-state "
            "maintenance is O(changes) per commit).  value_lookup_* FORCES "
            "the index path on a COMMON value (≈4% selectivity) to show "
            "the regime where an index loses; value_auto_median_sec is the "
            "same query through the cost-based planner, which crosses over "
            "to the scan plan once the probed key set exceeds "
            "scan_fallback_fraction of the base's manifest row count.  "
            "rare_value_* serves `langRARE` (~1/9973 of rows) — the "
            "secondary index's actual regime — through the auto planner, "
            "which keeps the key-fan-out path.  At this table size (~2 GB "
            "hot in page cache, 16 cores) the full scan-and-filter is "
            "nearly free, so rare-value wall times are dominated by the "
            "fixed per-bucket planning/probe overhead of the index path — "
            "the quantity that scales is rare_value_files_read vs "
            "rare_value_files_in_buckets (bloom-pruned bytes NOT read), "
            "which is what a 100 TB table feels.  The *_compacted rows "
            "re-measure the rare-value serve after `compact()` on the "
            "base — the steady-state layout of a continuously maintained "
            "table (the serve version slides across the maintenance "
            "commit automatically; lake/valueindex.py _serve_version) — "
            "so the index's fixed floor is compared against the scan at "
            "the table's best layout, not its worst.  The ultra_rare_* "
            "rows (also post-compaction) serve `langULTRA` (~1/39989 of "
            "rows) — matched keys *much smaller than the bucket count*, "
            "so the key fan-out leaves most buckets untouched: "
            "ultra_rare_files_read vs ultra_rare_files_in_table is the "
            "fraction of the table the index actually opens, and the "
            "wall-clock speedup is the selectivity regime where the "
            "secondary index pays for itself even at bench scale.\n"
        )
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree("/tmp/bench_lookup_idx", ignore_errors=True)


if __name__ == "__main__":
    main()
