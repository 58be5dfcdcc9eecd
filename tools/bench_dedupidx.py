"""Maintained-dedup-index soak: O(batch) probe vs O(corpus) re-band.

The claim under test (lake/dedupidx.py): once the LSH index is
maintained through the changes feed, answering "which of this crawl
batch's documents are near-dups of the corpus?" costs O(batch) —
band the batch, prune to its band-hash buckets, join — while the
non-indexed plan must re-band the ENTIRE corpus every batch (banding
is the dominant cost: an md5 per shingle per document).

Protocol:
1. synthesize ``--docs`` deterministic documents (20 tokens from a
   1000-word vocab, seeded by doc_id; ``--dup-pct`` of them exact
   copies of an earlier doc so probes find real candidates), merge as
   the corpus epoch, bootstrap the index (reported as build cost —
   paid once, amortized over every later batch);
2. merge a ``--batch`` new-doc epoch (same generator, shifted ids)
   **merge-on-read** — the CDC ingest path; a CoW batch rewrites
   every touched bucket of the base AND the feed then diffs the
   rewritten files, charging the advance O(table) (measured: 18.9 s
   per 5 k-doc batch at 1 M docs, vs 5.1 s for the scratch re-band —
   the first version of this bench did exactly that) — then time the
   INDEXED path: advance_dedup_index(mode="mor") (O(changes)) +
   neardup_probe(batch);
3. time the SCRATCH path a user without the index runs for the same
   answer: band the full corpus + band the batch + equi-join (this is
   already the best non-indexed plan — the batch LSH self-join over
   corpus+batch does strictly more);
4. assert both return the same candidate set; report the speedup.

Usage:
    python tools/bench_dedupidx.py [--docs 1000000] [--batch 5000]
        [--dup-pct 10] [--cpus 32] [--buckets 64] [--reps 3]

Appends a row to BENCH_DEDUPIDX.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from realdeal_spark.lake.dedupidx import (  # noqa: E402
    advance_dedup_index,
    create_dedup_index,
    neardup_probe,
)
from realdeal_spark.lake.merge import merge_apply  # noqa: E402
from realdeal_spark.lake.table import LakeTable  # noqa: E402
from realdeal_spark.operators.dedup import banded_minhash  # noqa: E402
from realdeal_spark.session import get_spark  # noqa: E402

SCHEMA = "doc_id bigint, lsn bigint, text string"
LSH = dict(num_perm=16, bands=4, shingle_n=3)


def _docs(spark, lo: int, hi: int, dup_pct: int):
    """Deterministic documents for ids [lo, hi): 20 tokens, each
    ``w<md5-derived index mod 1000>``; ``dup_pct`` % of docs replace
    their text with doc (id - id % 97)'s — an exact earlier copy, so
    all bands match and probes surface real candidates."""
    ids = spark.range(lo, hi).select(F.col("id").alias("doc_id"))
    src_id = F.when(
        (F.col("doc_id") % 100 < dup_pct) & (F.col("doc_id") % 97 != 0),
        F.col("doc_id") - F.col("doc_id") % 97,
    ).otherwise(F.col("doc_id"))
    toks = [
        F.concat(
            F.lit("w"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(src_id.cast("string"), F.lit(f"-{i}"))),
                        1, 12,
                    ),
                    16, 10,
                ).cast("bigint")
                % 1000
            ).cast("string"),
        )
        for i in range(20)
    ]
    return ids.select(
        "doc_id", F.concat_ws(" ", *toks).alias("text")
    )


def _pairs_set(df, a, b):
    return {
        (min(r[a], r[b]), max(r[a], r[b]))
        for r in df.collect()
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=5_000)
    ap.add_argument("--dup-pct", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(
        "bench-dedupidx",
        master=f"local[{args.cpus}]",
        shuffle_partitions=2 * args.cpus,
    )
    root = "/tmp/bench_dedupidx"
    shutil.rmtree(root, ignore_errors=True)

    table = LakeTable.create(
        spark, f"{root}/docs", SCHEMA,
        key_columns=["doc_id"], order_columns=["lsn"],
        n_buckets=32, soft_delete=True,
        # blooms on the BASE prune the feed's pre-image read to the
        # changed keys' bloom-positive files (≈ zero for insert-heavy
        # epochs); with the additive-interval skip this keeps the
        # whole advance O(batch)
        key_blooms=True,
    )
    corpus = _docs(spark, 0, args.docs, args.dup_pct).select(
        "doc_id", F.lit(1).alias("lsn"), "text", F.lit("insert").alias("op")
    )
    t0 = time.monotonic()
    merge_apply(table, corpus, epoch_id="corpus")
    t_ingest = time.monotonic() - t0

    idx = create_dedup_index(table, f"{root}/idx", n_buckets=args.buckets)
    t0 = time.monotonic()
    advance_dedup_index(table, idx, **LSH)
    t_bootstrap = time.monotonic() - t0

    # the per-batch regime: merge a new batch, then per-rep time the
    # indexed path (advance + probe) vs the corpus re-band
    probe_t, scratch_t, adv_t = [], [], []
    got = want = None
    for rep in range(args.reps):
        lo = args.docs + rep * args.batch
        batch_docs = _docs(spark, lo, lo + args.batch, args.dup_pct)
        merge_apply(
            table,
            batch_docs.select(
                "doc_id", F.lit(2 + rep).alias("lsn"), "text",
                F.lit("insert").alias("op"),
            ),
            epoch_id=f"batch-{rep}",
            mode="mor",
        )
        t0 = time.monotonic()
        advance_dedup_index(table, idx, mode="mor", **LSH)
        t_adv = time.monotonic() - t0
        res = neardup_probe(idx, batch_docs, "text", "doc_id", **LSH)
        got = _pairs_set(res, "probe_id", "match_id")
        probe_t.append(time.monotonic() - t0)
        adv_t.append(t_adv)

        t0 = time.monotonic()
        corpus_banded = banded_minhash(
            table.read().where(F.col("text").isNotNull()),
            "text", "doc_id", **LSH,
        )
        batch_banded = banded_minhash(batch_docs, "text", "doc_id", **LSH)
        scratch = (
            batch_banded.alias("l")
            .join(
                corpus_banded.alias("r"),
                on=[
                    F.col("l.band") == F.col("r.band"),
                    F.col("l.bh") == F.col("r.bh"),
                    F.col("l._id") != F.col("r._id"),
                ],
            )
            .select(
                F.col("l._id").alias("probe_id"),
                F.col("r._id").alias("match_id"),
            )
            .distinct()
        )
        want = _pairs_set(scratch, "probe_id", "match_id")
        scratch_t.append(time.monotonic() - t0)
        assert got == want, (
            f"rep {rep}: indexed probe != corpus re-band "
            f"({len(got)} vs {len(want)} pairs)"
        )

    # small-batch probe: the bucket-pruning regime (a trickle of docs
    # bands to few distinct hashes → few index buckets touched)
    small = _docs(spark, 10 * args.docs, 10 * args.docs + 20, args.dup_pct)
    sb = banded_minhash(small, "text", "doc_id", **LSH)
    touched = (
        sb.select(
            F.pmod(F.xxhash64("bh"), F.lit(args.buckets)).alias("_b")
        )
        .distinct()
        .count()
    )
    t0 = time.monotonic()
    neardup_probe(idx, small, "text", "doc_id", **LSH).count()
    t_small = time.monotonic() - t0

    row = {
        "metric": "dedupidx_probe_speedup",
        "docs": args.docs,
        "batch": args.batch,
        "dup_pct": args.dup_pct,
        "buckets": args.buckets,
        "cpus": args.cpus,
        "reps": args.reps,
        "ingest_sec": round(t_ingest, 2),
        "bootstrap_sec": round(t_bootstrap, 2),
        "indexed_batch_sec": round(statistics.median(probe_t), 2),
        "advance_sec": round(statistics.median(adv_t), 2),
        "scratch_batch_sec": round(statistics.median(scratch_t), 2),
        "speedup": round(
            statistics.median(scratch_t) / statistics.median(probe_t), 2
        ),
        "pairs": len(got),
        "probe20_sec": round(t_small, 2),
        "probe20_buckets": f"{touched}/{args.buckets}",
    }
    with open(os.path.join(REPO, "BENCH_DEDUPIDX.md"), "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
