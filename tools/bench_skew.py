"""Hot-key skew soak: MERGE-apply throughput per conflation strategy
under an extreme hot url (north_rule: "partitioning / shuffle / skew
handled explicitly").

One url carrying ``--hot-share`` percent of all change events is the
worst case for per-key conflation: every strategy must collapse that
key's rows to one winner, and a naive ``row_number`` window puts the
whole hot key in a single task.  This soak runs ``jobs/run_cdc.py``
in a fresh JVM per combo (same deterministic synthetic log) and
reports:

- ``light``   — the auto default for payload tables: winner-find is a
  map-side partial max over (key → order tuple), so a hot key reduces
  locally in every task before the shuffle; skew-immune by shape.
- ``max_by``  — single aggregation but the *full payload* shuffles;
  partial aggregation still bounds the hot key.
- ``window``  — literal row_number: the hot key lands in ONE window
  partition (the skew victim; AQE cannot split an intra-key window).
- ``window --salt-buckets K`` — two-phase salted dedup: phase 1
  dedups within (key, salt) splitting the hot key across K tasks,
  phase 2 reduces the ≤K survivors (cdc/conflate.py:111).

Skew resilience = eps@hot / eps@uniform per strategy.  Writes
BENCH_SKEW.md.  Usage:

    python tools/bench_skew.py [--events 8000000] [--hot-share 50] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(
    cpus: int, events: int, n_urls: int, hot: int,
    strategy: str, salt: int | None,
) -> dict:
    cmd = [
        sys.executable, os.path.join(REPO, "jobs", "run_cdc.py"),
        "--synthetic-events", str(events),
        "--n-urls", str(n_urls),
        "--hot-share", str(hot),
        "--epoch-size", str(events),
        "--cpus", str(cpus),
        "--conflate", strategy,
    ]
    if salt:
        cmd += ["--salt-buckets", str(salt)]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if out.returncode != 0:
        raise RuntimeError(
            f"{strategy} hot={hot} failed:\n{out.stderr[-3000:]}"
        )
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=8_000_000)
    ap.add_argument("--n-urls", type=int, default=200_000)
    ap.add_argument("--hot-share", type=int, default=50)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--salt", type=int, default=32)
    args = ap.parse_args()

    combos = [
        ("light", None),
        ("max_by", None),
        ("window", None),
        ("window", args.salt),
    ]
    rows = []
    for strategy, salt in combos:
        label = f"window+salt{salt}" if salt else strategy
        uni = run_once(
            args.cpus, args.events, args.n_urls, 0, strategy, salt
        )
        hot = run_once(
            args.cpus, args.events, args.n_urls, args.hot_share, strategy, salt
        )
        rows.append(
            {
                "strategy": label,
                "eps_uniform": uni["events_per_sec"],
                "eps_hot": hot["events_per_sec"],
                "wall_uniform": uni["wall_sec"],
                "wall_hot": hot["wall_sec"],
                "skew_resilience": round(
                    hot["events_per_sec"] / uni["events_per_sec"], 3
                ),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    md = [
        "# BENCH_SKEW — hot-key conflation soak",
        "",
        f"Synthetic change log, {args.events:,} events / "
        f"{args.n_urls:,} urls, one url carrying {args.hot_share}% of all "
        f"events in the hot runs; full MERGE-apply into a fresh lake "
        f"table at local[{args.cpus}], one strategy per fresh JVM "
        "(`jobs/run_cdc.py --conflate ...`).",
        "",
        "`skew_resilience` = events/sec at hot ÷ events/sec at uniform —",
        "1.0 means the hot key costs nothing; low values mean the",
        "strategy serializes on the hot key.",
        "",
        "| strategy | eps uniform | eps hot | wall uniform (s) | wall hot (s) | skew resilience |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    for r in rows:
        md.append(
            f"| {r['strategy']} | {r['eps_uniform']:,.0f} | "
            f"{r['eps_hot']:,.0f} | {r['wall_uniform']} | {r['wall_hot']} | "
            f"{r['skew_resilience']} |"
        )
    md += [
        "",
        "Reading: `light` (the applier's auto choice for payload tables)",
        "and `max_by` resolve the hot key map-side (partial aggregation",
        "reduces it within every input task before the shuffle), so their",
        "resilience stays near 1.  A literal `window` puts the whole hot",
        "key in one `row_number` partition — the victim shape — and",
        "`--salt-buckets` restores it by splitting the key across salt",
        "sub-partitions first (two-phase dedup, cdc/conflate.py:111).",
        "At 100 TB the same shapes hold: partial-agg strategies are",
        "skew-immune by construction; explicit salting is the escape",
        "hatch when the window strategy is pinned.",
        "",
        "Note the salted row on *uniform* input: two window phases over",
        "keys×salts cost ~2× when there is no skew to split — salting is",
        "a skew remedy, not a default (hence `salt_buckets=None` unless",
        "the caller opts in; the auto strategy never needs it).",
    ]
    with open(os.path.join(REPO, "BENCH_SKEW.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({"rows": rows}, indent=2))


if __name__ == "__main__":
    main()
