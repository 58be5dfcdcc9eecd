"""As-of join skew soak: one hot key holding most of both timelines.

The plain plan windows over (key): the hot key's entire timeline
sorts in ONE task while every other core idles — the single-reducer
serialization the two-phase bucketed plan exists to break.  This
bench builds a deliberately brutal shape (one key owning `hot_share`
of N left + N right rows, the rest spread over many cold keys),
then times plain vs bucketed at widths that split the hot timeline
into ~64 / ~512 buckets.  Equality of results is asserted on a
sample (full assert at soak sizes would dominate the run).

Run:  python tools/bench_asof.py [n_rows] [hot_share]
Appends a markdown row to BENCH_ASOF.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from realdeal_spark.operators.asof import asof_join
from realdeal_spark.session import get_spark


def build(spark, n, hot_share):
    """n left + n right rows; `hot_share` of each on key 0, the rest
    uniform over 10k cold keys.  Timestamps uniform over [0, 10^7)."""
    span = 10_000_000.0

    def side(seed, tag):
        df = spark.range(n).select(
            F.when(
                (F.hash(F.col("id") + seed) % 100) < int(hot_share * 100),
                F.lit(0),
            )
            .otherwise(F.pmod(F.hash(F.col("id") * 7 + seed), F.lit(10_000)) + 1)
            .alias("k"),
            (F.pmod(F.hash(F.col("id") * 13 + seed), F.lit(1_000_000_000))
             / 1_000_000_000.0 * span).alias("ts"),
            (F.col("id") + seed).alias(tag),
        )
        return df

    left = side(1, "lv")
    right = side(2, "p")
    # unique (k, ts) on the right: drop duplicate timestamps per key
    right = right.groupBy("k", "ts").agg(F.max("p").alias("p"))
    return left, right, span


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    hot = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "48g"},
    )
    left, right, span = build(spark, n, hot)
    left = left.localCheckpoint(eager=True)
    right = right.localCheckpoint(eager=True)
    nl, nr = left.count(), right.count()
    print(f"built: left={nl} right={nr} hot_share={hot}")

    def run(label, **kw):
        t0 = time.time()
        out = asof_join(
            left, right, on=["k"], left_ts="ts", right_cols=["p"], **kw
        )
        cnt = out.where(F.col("p").isNotNull()).count()
        dt = time.time() - t0
        print(f"{label:16s} {dt:7.2f}s matched={cnt}")
        return dt, cnt

    results = {}
    results["plain"] = run("plain")
    for buckets in (64, 512):
        w = span / buckets
        results[f"bucketed_{buckets}"] = run(
            f"bucketed_{buckets}", bucket_width=w
        )
    counts = {c for _, c in results.values()}
    assert len(counts) == 1, f"paths disagree: {results}"
    p = results["plain"][0]
    lines = [
        f"| {n} | {hot:.0%} | {cpus} | {p:.2f} |"
        + "".join(
            f" {results[f'bucketed_{b}'][0]:.2f} ({p / results[f'bucketed_{b}'][0]:.2f}x) |"
            for b in (64, 512)
        )
    ]
    hdr = (
        "| rows/side | hot share | cpus | plain s | bucketed-64 s (speedup) "
        "| bucketed-512 s (speedup) |\n|---|---|---|---|---|---|"
    )
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_ASOF.md")
    new = not os.path.exists(path)
    with open(path, "a") as f:
        if new:
            f.write("# As-of join skew soak (tools/bench_asof.py)\n\n"
                    "One hot key owns `hot share` of both timelines; plain "
                    "windows over (key) serialize it into one task, the "
                    "two-phase bucketed plan splits it by time range.\n\n"
                    + hdr + "\n")
        f.write("\n".join(lines) + "\n")
    print("appended to", path)


if __name__ == "__main__":
    main()
