"""Soak the Bloom winner pushdown against the plain shuffle fallback.

VERDICT r2 item 7's acceptance: at >1M winners (above any realistic
BROADCAST_KEYS_MAX) the Bloom-prefiltered semi join must beat the
plain shuffled semi join, because the payload side stops shuffling
losing rows.  This bench builds a synthetic web-page CDC batch —
N events over K urls with a ~1 KB html payload — and times the light
conflation's winner semi join three ways:

  shuffle  broadcast_winners=False, no bloom   (the old fallback)
  bloom    broadcast_winners=False, bloom pushdown sized by K
  bcast    broadcast_winners=True              (reference: under-cap plan)

Output: one JSON line per configuration; writes nothing durable
(noop sink).

Run:  python tools/bench_bloom.py [n_events] [n_urls] [cores]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from realdeal_spark.cdc.conflate import conflate  # noqa: E402
from realdeal_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 1_200_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    # single local JVM holds the ~n_events KB-payload checkpoint +
    # shuffle buffers — size the heap for it (local-mode default 1g)
    spark = get_spark(
        master=f"local[{cores}]",
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ~1 KB payload: 16 concatenated sha256 hex digests of the id
    ev = (
        spark.range(n_events)
        .select(
            F.concat(F.lit("https://ex.com/p"), (F.col("id") % n_urls)).alias("url"),
            (F.col("id") % 7919).cast("int").alias("warc_ts"),
            F.col("id").alias("lsn"),
            F.repeat(F.sha2(F.col("id").cast("string"), 256), 16).alias("html"),
        )
        .localCheckpoint(eager=True)  # freeze the input outside the timing
    )

    def run(tag: str, **kw) -> dict:
        t0 = time.monotonic()
        out = conflate(ev, ["url"], ["warc_ts", "lsn"], strategy="light", **kw)
        out.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        rec = {
            "config": tag,
            "sec": round(dt, 2),
            "n_events": n_events,
            "n_urls": n_urls,
            "cores": cores,
        }
        print(json.dumps(rec), flush=True)
        return rec

    run("shuffle", broadcast_winners=False)
    run("bloom", broadcast_winners=False, bloom_expected_keys=n_urls)
    run("bcast", broadcast_winners=True)


if __name__ == "__main__":
    main()
