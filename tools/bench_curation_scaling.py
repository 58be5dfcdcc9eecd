"""Two-parallelism scaling evidence for the curation/dedup family.

The sf0.1 tables are far too small for a scaling measurement — at
5 000 documents the per-stage fixed overhead (task scheduling, 64
shuffle partitions over a few thousand rows, window setup) dominates,
and adding cores measures noise (a first cut showed pipeline_curate_v2
*slower* at 32 cores than 8 — pure overhead, not plan behavior).  This
bench amplifies the corpus ~40× (deterministic copies with perturbed
ids/text, ≈200k documents / 800k vectors) so per-core work is seconds,
then runs the same queries at local[8] and local[32] and reports both
throughputs and the 8→32 efficiency (ideal speedup 4×).

Usage: python tools/bench_curation_scaling.py [--copies 40]
Writes BENCH_CURATION.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

WORKER = '''
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from realdeal_spark.session import get_spark

cpus = int(sys.argv[1]); copies = int(sys.argv[2])
spark = get_spark("curscale", master=f"local[{cpus}]",
                  shuffle_partitions=2 * cpus)

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
# deterministic amplification: copy i gets shifted ids and perturbed
# content so nothing collapses trivially
i = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("i")
# repartition BEFORE checkpointing: the amplified frame otherwise
# inherits the tiny source file's partition count (1-2) and every
# downstream stage runs near-serial no matter how many cores exist
big_docs = (docs.select("doc_id", "lang", "text", i)
    .select((F.col("doc_id") + F.col("i") * 100000).alias("doc_id"), "lang",
            F.concat("text", F.lit(" tail"), F.col("i").cast("string")).alias("text"))
    ).repartition(4 * cpus).localCheckpoint(eager=True)
# embeddings need a deeper amplification: sf0.1 has only 2k vectors,
# and at 80k the IVF job is fixed-cost-dominated (same wall at 8 and
# 32 cores) — 10x more makes the assignment scan the measured work
iv = F.explode(F.sequence(F.lit(0), F.lit(copies * 10 - 1))).alias("i")
big_emb = (emb.select("vec_id", "embedding", iv)
    .select((F.col("vec_id") + F.col("i") * 100000).alias("vec_id"),
            F.transform("embedding", lambda x: x * (1.0 + F.col("i") / 100.0)).alias("embedding"))
    ).repartition(4 * cpus).localCheckpoint(eager=True)
n_docs, n_vec = big_docs.count(), big_emb.count()

from realdeal_spark.extract import textstats as TS
from realdeal_spark.operators.dedup import contaminated_ids
from realdeal_spark.operators.sampling import hash_sample, stratified_sample
from realdeal_spark.operators.similarity import ivf_knn

def q_decontaminate():
    bench = big_docs.where(F.col("doc_id") % 97 == 0)
    corpus = big_docs.where(F.col("doc_id") % 97 != 0)
    return contaminated_ids(corpus, bench, shingle_n=5)

def q_pipeline():
    kept = big_docs.where(
        (TS.dup_ngram_fraction_expr("text", 3) < 0.05)
        & (TS.quality_score_expr("text") >= 0.3))
    return stratified_sample(hash_sample(kept, 0.5, id_col="doc_id"),
                             500, ["lang"], id_col="doc_id")

def q_ivf():
    return ivf_knn(big_emb, big_emb.where("vec_id < 5"), k=5,
                   n_lists=16, nprobe=4)

out = {}
for name, fn in [("text_decontaminate", q_decontaminate),
                 ("pipeline_curate", q_pipeline),
                 ("knn_ivf", q_ivf)]:
    fn().count()  # warm
    ts = []
    for _ in range(2):
        t0 = time.monotonic(); fn().count(); ts.append(time.monotonic() - t0)
    out[name] = min(ts)
print("RESULT " + json.dumps({"times": out, "n_docs": n_docs, "n_vec": n_vec}))
'''


def run(cpus: int, copies: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(copies)],
        capture_output=True, text=True, timeout=3000,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
    if not lines:
        raise RuntimeError(p.stderr[-2000:])
    return json.loads(lines[-1][7:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=40)
    args = ap.parse_args()
    r8 = run(8, args.copies)
    r32 = run(32, args.copies)
    eff = {
        q: round((r8["times"][q] / r32["times"][q]) / 4.0, 3)
        for q in r8["times"]
    }
    summary = {
        "n_docs": r8["n_docs"],
        "n_vec": r8["n_vec"],
        "local8_sec": r8["times"],
        "local32_sec": r32["times"],
        "efficiency_8_to_32": eff,
    }
    lines = [
        "# BENCH_CURATION — curation-family scaling (8 → 32 cores)",
        "",
        "Same queries, same amplified input "
        f"(~{r8['n_docs']:,} docs / {r8['n_vec']:,} vectors — sf0.1 × "
        f"{args.copies} deterministic copies; sf0.1 itself is too small "
        "to measure scaling: per-stage fixed overhead dominates at 5k "
        "rows), best of 2 timed reps after a warm-up.  Ideal 8→32 "
        "speedup is 4×; efficiency = speedup / 4.",
        "",
        "| query | local[8] s | local[32] s | efficiency |",
        "|---|---|---|---|",
    ]
    for q in r8["times"]:
        lines.append(
            f"| {q} | {r8['times'][q]:.1f} | {r32['times'][q]:.1f} "
            f"| {eff[q]:.3f} |"
        )
    lines += [
        "",
        "The CDC MERGE path's scaling gate (the north-rule criterion) is "
        "measured separately in BENCH_SCALING.md with pinned cores and "
        "per-core heap held constant; this file extends two-level "
        "evidence to the curation operators.",
        "",
    ]
    with open("/root/repo/BENCH_CURATION.md", "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
