"""Relational + data-curation operators.

- ``relational`` — anti-join find-new, latest-per-key, keyed top-k
  (the reference's J1/A1/O1-O2 recast set-based);
- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard, and
  embedding-cosine near-duplicate detection over document corpora;
- ``similarity`` — approximate-nearest-neighbor search over embedding
  columns (brute-force cosine top-k baseline, LSH-bucketed scale path).
"""

from realdeal_spark.operators.relational import find_new, latest_per_key, top_k_per_key
from realdeal_spark.operators.asof import asof_join
from realdeal_spark.operators.interval import range_join, suggest_cell
from realdeal_spark.operators import dedup, geo, multimodal, similarity

__all__ = [
    "find_new",
    "latest_per_key",
    "top_k_per_key",
    "asof_join",
    "range_join",
    "suggest_cell",
    "dedup",
    "geo",
    "multimodal",
    "similarity",
]
