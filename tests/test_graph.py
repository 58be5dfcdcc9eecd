"""Connected components / duplicate clustering (operators.graph)."""

from __future__ import annotations

import random

from realdeal_spark.operators.graph import (
    connected_components,
    duplicate_clusters,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["id"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_chain_collapses_to_min(spark):
    # worst case for label propagation (diameter = n); log-round here
    got = _cc(spark, [(i, i + 1) for i in range(1, 40)])
    assert got == {i: 1 for i in range(1, 41)}


def test_two_components_and_string_ids(spark):
    got = _cc(spark, [("b", "a"), ("c", "b"), ("y", "z"), ("x", "x")])
    # self-loop x-x is dropped entirely (no pair evidence)
    assert got == {"a": "a", "b": "a", "c": "a", "y": "y", "z": "y"}


def test_duplicate_edges_and_reversed_listing(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 3), (3, 1), (5, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def _union_find_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    edges = [
        (rng.randrange(120), rng.randrange(120)) for _ in range(90)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    assert _cc(spark, edges) == _union_find_oracle(edges)


def test_duplicate_clusters_shape(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    rows = {
        r["id"]: (r["cluster_id"], r["cluster_size"])
        for r in duplicate_clusters(pairs).collect()
    }
    assert rows == {
        1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2)
    }


def test_keep_best_representatives(spark):
    """Representative = highest score, id tiebreak; one row per
    cluster; score column name flows through."""
    from realdeal_spark.operators.graph import keep_best_representatives

    clusters = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (10, 10, 2), (11, 10, 2)],
        "id bigint, cluster_id bigint, cluster_size bigint",
    )
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (10, 0.1), (11, 0.1)],
        "id bigint, quality double",
    )
    out = {r["cluster_id"]: (r["keep_id"], r["quality"])
           for r in keep_best_representatives(clusters, scores).collect()}
    assert out == {1: (2, 0.9), 10: (10, 0.1)}  # tie -> lower id
