"""Maintained join view at amplified scale — the delta-join claims
measured (round-5 addition, cdc/joinview.py).

For each fact size N (default 1M, 4M) with a 50k-key dim:

- ``recompute``      — the nightly-join baseline: full fact ⋈ dim
                       WRITTEN OUT (the nightly pipeline materializes
                       its result; a count-only join would flatter
                       the baseline by skipping the write the view
                       always pays).  O(N) every refresh.
- ``bootstrap``      — the view's one O(N) pass (paid once).
- ``fact_advance``   — a 100k-event fact epoch brought into the view
                       through the feed: claim = ~flat in N (the dim
                       read is a pruned point lookup on the batch's
                       fk values).
- ``dim_advance``    — 200 changed dim keys (0.4% of the dim)
                       re-enriched into the view, two ways:
                       ``plain`` = fk-semi view scan (grows with N),
                       ``indexed`` = fk value index as the join
                       arrangement over a ``key_blooms`` view
                       (probed value buckets → bloom-pruned key
                       lookup; the index advance that precedes the
                       probe is part of the epoch's bill).
- ``dim_trickle``    — the regime the arrangement exists for: 5
                       changed dim keys (the steady drip of dim
                       edits) against the full view.  Claim: indexed
                       ~flat in N, plain grows with N.

Writes BENCH_JOINVIEW.md.

Usage: python tools/bench_joinview.py [--sizes 1000000,4000000]
       [--cpus 32] [--dim-keys 50000] [--epoch-rows 100000]
       [--dim-changes 200]
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1000000,4000000,16000000")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--dim-keys", type=int, default=50_000)
    ap.add_argument("--epoch-rows", type=int, default=100_000)
    ap.add_argument("--dim-changes", type=int, default=200)
    ap.add_argument("--index-buckets", type=int, default=1024)
    ap.add_argument(
        "--payload-bytes", type=int, default=0,
        help="width of an extra fact payload column (the north-rule "
        "shape carries ~KB of html/text per row; 0 = the narrow "
        "worst case for the MV, where a raw rewrite is cheapest)",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from pyspark.sql import functions as F

    from realdeal_spark.cdc.joinview import (
        advance_join_view,
        create_join_view,
    )
    from realdeal_spark.lake import LakeTable, merge_apply
    from realdeal_spark.lake.valueindex import create_value_index
    from realdeal_spark.session import get_spark

    spark = get_spark(
        "jv-bench", master=f"local[{args.cpus}]",
        shuffle_partitions=2 * args.cpus,
        extra_conf={"spark.driver.memory": "48g"},
    )

    def fact_batch(start, n, ts, dim_keys):
        cols = [
            F.col("id").alias("k"),
            F.lit(ts).cast("bigint").alias("ts"),
            (F.col("id") % dim_keys).alias("fk"),
            (F.col("id") * 0.5).alias("val"),
        ]
        if args.payload_bytes:
            # high-entropy payload: concatenated per-row sha2 chains —
            # repeated/padded fillers compress ~1000:1 under zstd and
            # the write stops paying real bytes (first attempt at this
            # bench measured exactly that)
            k = (args.payload_bytes + 63) // 64
            cols.append(
                F.concat(*[
                    F.sha2(
                        F.concat_ws(
                            "-", F.col("id").cast("string"),
                            F.lit(str(i)), F.lit(str(ts)),
                        ), 256,
                    )
                    for i in range(k)
                ]).alias("body")
            )
        cols.append(F.lit("update").alias("op"))
        return spark.range(start, start + n).select(*cols)

    def dim_batch(keys_df, ts, tag):
        return keys_df.select(
            F.col("dk"),
            F.lit(ts).cast("bigint").alias("dts"),
            F.concat(F.lit(f"label-{tag}-"), F.col("dk")).alias("label"),
            (F.col("dk") * 0.01).alias("weight"),
            F.lit("update").alias("op"),
        )

    rows = []
    for n in sizes:
        root = f"/tmp/jv_bench_{n}"
        shutil.rmtree(root, ignore_errors=True)
        fschema = "k bigint, ts bigint, fk bigint, val double"
        if args.payload_bytes:
            fschema += ", body string"
        fact = LakeTable.create(
            spark, f"{root}/fact", fschema,
            ["k"], ["ts"], n_buckets=max(16, args.cpus),
            soft_delete=True,
        )
        dim = LakeTable.create(
            spark, f"{root}/dim",
            "dk bigint, dts bigint, label string, weight double",
            ["dk"], ["dts"], n_buckets=16, soft_delete=True,
        )
        merge_apply(fact, fact_batch(0, n, 1, args.dim_keys),
                    epoch_id="f-bulk", mode="mor")
        merge_apply(
            dim,
            dim_batch(
                spark.range(args.dim_keys).select(F.col("id").alias("dk")),
                1, "v1",
            ),
            epoch_id="d-bulk",
        )

        t0 = time.time()
        fact.read().join(
            dim.read().select(F.col("dk").alias("fk"), "label", "weight"),
            on="fk", how="left",
        ).write.mode("overwrite").parquet(f"{root}/nightly")
        recompute_s = time.time() - t0
        got = spark.read.parquet(f"{root}/nightly").count()
        assert got == n

        r = {"fact_rows": n, "recompute_s": round(recompute_s, 2)}
        # each variant's epochs need their own order stamps: the CDC
        # contract requires a unique order tuple per key per distinct
        # row version (an equal-order re-update is indistinguishable
        # from a replay and the feed nets it away)
        for vi, variant in enumerate(("plain", "indexed")):
            ets = 2 + vi
            # the arrangement needs a bloomed view: without per-file
            # key blooms the affected-key lookup reads every bucket
            # the keys hash to and can never beat the plain semi-scan
            view = create_join_view(
                fact, dim, {"fk": "dk"}, f"{root}/view_{variant}",
                key_blooms=(variant == "indexed"),
            )
            idx = None
            t0 = time.time()
            advance_join_view(fact, dim, view, {"fk": "dk"},
                              mode="mor", fk_index=idx)
            r[f"bootstrap_{variant}_s"] = round(time.time() - t0, 2)
            if variant == "indexed":
                # the arrangement bootstraps WITH the view (paid once,
                # alongside the view's own O(N) pass) — the dim
                # advance below then measures steady state: index
                # advance O(fact-epoch changes) + probed-bucket read
                from realdeal_spark.lake.valueindex import (
                    advance_value_index,
                )

                t0 = time.time()
                idx = create_value_index(
                    view, f"{root}/fkidx", "fk",
                    n_buckets=args.index_buckets,
                )
                advance_value_index(view, idx, "fk", mode="mor")
                r["index_bootstrap_s"] = round(time.time() - t0, 2)

            # one 100k fact epoch: half updates of existing keys,
            # half new keys
            up = fact_batch(0, args.epoch_rows // 2, ets, args.dim_keys)
            new = fact_batch(n, args.epoch_rows // 2, ets, args.dim_keys)
            merge_apply(fact, up.unionByName(new),
                        epoch_id=f"f-e1-{variant}-{n}", mode="mor")
            t0 = time.time()
            advance_join_view(fact, dim, view, {"fk": "dk"},
                              mode="mor", fk_index=idx)
            r[f"fact_advance_{variant}_s"] = round(time.time() - t0, 2)

            # one dim epoch: relabel dim-changes keys
            changed = spark.range(args.dim_changes).select(
                (F.col("id") * (args.dim_keys // args.dim_changes))
                .alias("dk")
            )
            merge_apply(dim, dim_batch(changed, ets, f"v2{variant}{n}"),
                        epoch_id=f"d-e1-{variant}-{n}")
            if idx is not None:
                # decompose the epoch's bill: index catch-up over the
                # fact epoch's view changes, then the advance itself
                # (whose internal index advance is then a no-op)
                t0 = time.time()
                advance_value_index(view, idx, "fk", mode="mor")
                r["index_catchup_1_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            advance_join_view(fact, dim, view, {"fk": "dk"},
                              mode="mor", fk_index=idx)
            r[f"dim_advance_{variant}_s"] = round(time.time() - t0, 2)
            # quick spot check: a changed key's referrers re-enriched
            probe = view.read().where(F.col("fk") == 0).select("label")
            got_label = probe.first()["label"]
            assert got_label is not None and got_label.startswith(
                f"label-v2{variant}"
            ), f"variant={variant} n={n}: fk=0 label is {got_label!r}"

            # the trickle epoch: 5 changed dim keys
            trickle = spark.range(5).select(
                (F.col("id") * (args.dim_keys // args.dim_changes) + 1)
                .alias("dk")
            )
            merge_apply(dim, dim_batch(trickle, 10 + vi, f"v3{variant}{n}"),
                        epoch_id=f"d-e2-{variant}-{n}")
            if idx is not None:
                t0 = time.time()
                advance_value_index(view, idx, "fk", mode="mor")
                r["index_catchup_2_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            advance_join_view(fact, dim, view, {"fk": "dk"},
                              mode="mor", fk_index=idx)
            r[f"dim_trickle_{variant}_s"] = round(time.time() - t0, 2)
            got_label = (
                view.read().where(F.col("fk") == 1)
                .select("label").first()["label"]
            )
            assert got_label.startswith(f"label-v3{variant}"), got_label
        rows.append(r)
        print(json.dumps(r), flush=True)

    stamp = dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds")
    lines = [
        "# BENCH_JOINVIEW — maintained delta-join view vs nightly recompute",
        "",
        f"Run {stamp}; local[{args.cpus}], dim={args.dim_keys} keys, "
        f"fact epoch={args.epoch_rows} rows (half updates/half inserts), "
        f"dim epoch={args.dim_changes} changed keys "
        f"({100 * args.dim_changes / args.dim_keys:.1f}% of dim).  "
        "View+fact MERGEs in MoR mode.  All advances feed-driven "
        "(cdc/joinview.py); fk index = lake/valueindex.py arrangement.",
        "",
        "| fact rows | recompute+write (s) | bootstrap (s) |"
        " index bootstrap (s) | fact advance (s) |"
        " dim advance plain (s) | dim advance indexed (s) |"
        " dim trickle plain (s) | dim trickle indexed (s) |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['fact_rows']:,} | {r['recompute_s']} |"
            f" {r['bootstrap_plain_s']} | {r.get('index_bootstrap_s')} |"
            f" {r['fact_advance_plain_s']} |"
            f" {r['dim_advance_plain_s']} | {r['dim_advance_indexed_s']} |"
            f" {r['dim_trickle_plain_s']} | {r['dim_trickle_indexed_s']} |"
        )
    lines += [
        "",
        "Raw per-variant rows (bootstrap/fact-advance under the indexed",
        "variant include the index's own bootstrap/advance cost):",
        "",
        "```json",
        *[json.dumps(r) for r in rows],
        "```",
        "",
    ]
    with open(os.path.join(REPO, "BENCH_JOINVIEW.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote BENCH_JOINVIEW.md")


if __name__ == "__main__":
    main()
