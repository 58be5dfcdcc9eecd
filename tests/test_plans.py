"""Physical-plan invariants: the optimizations the engine relies on at
scale must actually appear in the plans (SURVEY §4).

These guard against regressions like a filter that stops reaching the
parquet scan, a dimension join that stops broadcasting, or a
conflation that loses its map-side partial aggregation — all invisible
to row-level correctness tests but fatal at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realdeal_spark.cdc.conflate import conflate
from realdeal_spark.operators.relational import find_new, latest_per_key

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_and_projection_reach_parquet_scan(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    q = ev.where(F.col("event_type") == "click").select("event_id", "user_id")
    p = plan(q)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)" in p
    # column pruning: scan reads only the 3 needed columns
    scan = p[p.index("ReadSchema") :].splitlines()[0]
    assert "value" not in scan and "props" not in scan


def test_latest_per_key_uses_partial_aggregation(spark):
    """max_by conflation must plan as partial+final hash aggregate —
    the map-side combine is the skew defense (SURVEY §2.4 A1)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    p = plan(latest_per_key(ev, ["user_id"], ["ts", "event_id"]))
    # max_by over a struct plans as SortAggregate; what matters is the
    # partial (map-side) phase before the exchange
    assert "partial_max_by" in p
    assert p.count("Aggregate (") >= 2 or p.count("SortAggregate") >= 2


def test_conflate_window_salted_two_phase(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    p = plan(
        conflate(ev, ["user_id"], ["ts", "event_id"], strategy="window", salt_buckets=8)
    )
    # two window operators: within-salt then across-salt
    assert p.count("row_number") >= 2


def test_small_dim_join_broadcasts(spark):
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    q = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    assert "BroadcastHashJoin" in plan(q)


def test_find_new_is_anti_join_not_collect(spark):
    inc = spark.read.parquet(f"{SF}/events.parquet")
    ex = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("user_id")
    )
    p = plan(find_new(inc, ex, ["user_id"]))
    assert "LeftAnti" in p


def test_events_generator_is_shuffle_free(spark):
    """10^10-event generation must stay embarrassingly parallel: the
    plan may not contain an Exchange."""
    from realdeal_spark.cdc.events import generate_change_events

    p = plan(generate_change_events(spark, n_events=1000))
    assert "Exchange" not in p
    assert "Range" in p


def test_embedding_bucketed_is_not_cartesian(spark):
    """The bucketed near-dup must plan as equi-joins on (table,
    bucket) and id joins — never a cartesian/nested-loop product
    (the brute-force path's shape).  VERDICT r1 'What's wrong' #2."""
    import random

    from realdeal_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_bucketed,
    )

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    p = plan(embedding_neardup_pairs_bucketed(df, dim=8, n_planes=4))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # sanity: the brute-force baseline IS the nested-loop shape
    p_brute = plan(embedding_neardup_pairs(df))
    assert "CartesianProduct" in p_brute or "BroadcastNestedLoopJoin" in p_brute


def test_mor_classification_target_read_is_narrow(spark, tmp_path):
    """The MoR classify join must read only (key, order, deleted) from
    the target parquet — payload columns pruned at the scan."""
    import datetime as dt

    from realdeal_spark.lake.table import _DELETED_COL, LakeTable

    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        "url string, warc_ts timestamp_ntz, lsn bigint, html binary",
        ["url"],
        ["warc_ts", "lsn"],
        n_buckets=4,
        soft_delete=True,
    )
    t.append(
        spark.createDataFrame(
            [(f"u{i}", dt.datetime(2024, 1, 1), i, b"x" * 10) for i in range(50)],
            "url string, warc_ts timestamp_ntz, lsn bigint, html binary",
        )
    )
    narrow = t.read(include_deleted=True).select("url", "warc_ts", "lsn", _DELETED_COL)
    p = plan(narrow)
    scan = p[p.index("ReadSchema") :].splitlines()[0]
    assert "html" not in scan


def test_connected_components_round_is_equi_join(spark):
    """One large-star/small-star round must plan as hash equi-joins
    with a partial-aggregated groupBy-min — no cartesian, no
    neighborhood collect_list (the hub-node killer at scale)."""
    from realdeal_spark.operators.graph import _large_star, _small_star

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 50)], ["src", "dst"]
    ).select(F.col("src").alias("a"), F.col("dst").alias("b"))
    p = plan(_small_star(_large_star(e)))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "collect_list" not in p
    assert "partial_min" in p  # map-side combine of the min-neighbor agg


def test_preimage_read_prunes_buckets(spark, tmp_path):
    """The CDF pre-image scan must read only the old-snapshot files of
    buckets the changes hashed into — O(touched buckets), not
    O(table)."""
    import datetime as dt

    from realdeal_spark.lake.merge import merge_apply
    from realdeal_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        "url string, warc_ts timestamp_ntz, lsn bigint, v double",
        ["url"], ["warc_ts", "lsn"], n_buckets=8, soft_delete=True,
    )
    rows = [(f"u{i}", dt.datetime(2024, 1, 1), i, float(i)) for i in range(200)]
    t.append(spark.createDataFrame(
        rows, "url string, warc_ts timestamp_ntz, lsn bigint, v double"
    ))
    v1 = t.current_version()
    old_files = {
        f"{t.root}/{fe['path']}"
        for fl in t.snapshot(v1).files.values() for fe in fl
    }
    assert len(t.snapshot(v1).files) == 8  # all buckets populated
    src = spark.createDataFrame(
        [("u7", dt.datetime(2024, 1, 2), 1000, 99.0, "update")],
        "url string, warc_ts timestamp_ntz, lsn bigint, v double, op string",
    )
    merge_apply(t, src)
    # probe the pre-image scan in isolation (the full feed also reads
    # every old file through the narrow carried-copy anti join, so
    # inputFiles on the feed can't see the pruning)
    from_snap, to_snap = t.snapshot(v1), t.snapshot()
    cur = t._schema_version(to_snap, to_snap.current_schema)
    changed = spark.createDataFrame([("u7",)], "url string")
    pre = t._preimage_frame(from_snap, to_snap, cur, changed)
    in_files = {
        f.replace("file:", "").replace("///", "/") for f in pre.inputFiles()
    }
    bucket_of_u7 = {
        f"{t.root}/{fe['path']}"
        for fe in from_snap.files[str(_bucket_id(spark, "u7", 8))]
    }
    assert in_files == bucket_of_u7
    assert len(in_files) < len(old_files)
    # and the feed itself is correct
    ch = t.read_changes(v1, include_preimage=True)
    got = {(r["url"], r["change_type"]) for r in ch.collect()}
    assert got == {("u7", "upsert"), ("u7", "update_preimage")}


def _bucket_id(spark, key: str, n_buckets: int) -> int:
    return spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(key)), F.lit(n_buckets)).cast("int")
    ).first()[0]


def test_lake_read_prunes_buckets(spark, tmp_path):
    """Bucket-pruned read lists only the pruned buckets' files."""
    from realdeal_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        "url string, warc_ts timestamp_ntz, lsn bigint",
        ["url"],
        ["warc_ts", "lsn"],
        n_buckets=8,
        soft_delete=True,
    )
    import datetime as dt

    rows = [(f"u{i}", dt.datetime(2024, 1, 1), i) for i in range(200)]
    t.append(spark.createDataFrame(rows, "url string, warc_ts timestamp_ntz, lsn bigint"))
    snap = t.snapshot()
    some = sorted(int(b) for b in snap.files)[:2]
    pruned = t.read(buckets=some, with_bucket=True)
    full = t.read()
    assert 0 < pruned.count() < full.count()
    # the pruned scan's file list is strictly smaller
    n_files_pruned = sum(len(snap.files[str(b)]) for b in some)
    n_files_all = sum(len(fl) for fl in snap.files.values())
    assert n_files_pruned < n_files_all


def test_ivf_knn_candidate_join_is_equi_and_assignment_shuffle_free(spark):
    """IVF candidates must come from an equi-join on the cell id —
    never a cartesian/nested-loop — and cell assignment must be a
    map (centroid literals in-plan): the only Exchanges allowed are
    the broadcast of the exploded query side and the final per-query
    window rank."""
    import random

    from realdeal_spark.operators.similarity import ivf_knn

    rng = random.Random(19)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    p = plan(ivf_knn(df, df.where("vec_id < 4"), k=3, n_lists=8, nprobe=2))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p  # query side broadcast, equi on list_id


def test_chunking_is_shuffle_free_and_packing_window_is_bucketed(spark):
    """chunk_documents must plan with no Exchange (pure map-side array
    exprs); pack_sequences' heavy cumsum window must partition by the
    range bucket, never run as one global window."""
    from realdeal_spark.extract.chunking import chunk_documents, pack_sequences

    d = spark.read.parquet(f"{SF}/documents.parquet")
    chunks = chunk_documents(d, "text", "doc_id", max_tokens=16, overlap=2)
    assert "Exchange" not in plan(chunks)
    p = plan(pack_sequences(chunks, 64, skew_buckets=32))
    # the running-sum window partitions by (bucket); only the
    # carry-in window (over the <=32-row bucket table) is global
    assert "partitionBy" not in p  # formatted plans spell it differently
    assert "_rb" in p and "Window" in p


def test_neardup_probe_is_equi_join_not_cartesian(spark, tmp_path):
    """The maintained dedup index probe must candidate-join on
    (band, bh) as a hash equi-join — never a nested-loop/cartesian."""
    from realdeal_spark.lake import LakeTable, merge_apply
    from realdeal_spark.lake.dedupidx import (
        advance_dedup_index,
        create_dedup_index,
        neardup_probe,
    )

    t = LakeTable.create(
        spark, str(tmp_path / "docs"),
        "doc_id bigint, lsn bigint, text string",
        key_columns=["doc_id"], order_columns=["lsn"],
        n_buckets=4, soft_delete=True,
    )
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("lsn"),
        F.concat_ws(" ", *[
            F.concat(F.lit("w"), ((F.col("id") + i) % 7).cast("string"))
            for i in range(8)
        ]).alias("text"),
        F.lit("insert").alias("op"),
    )
    merge_apply(t, docs)
    idx = create_dedup_index(t, str(tmp_path / "idx"), n_buckets=8)
    advance_dedup_index(t, idx, num_perm=8, bands=4, shingle_n=2)
    probe = neardup_probe(
        idx, docs.select("doc_id", "text"), "text", "doc_id",
        num_perm=8, bands=4, shingle_n=2,
    )
    p = plan(probe)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_join_view_dim_only_advance_never_reads_fact(spark, tmp_path):
    """The delta-join's dim-side refresh must be self-contained in the
    view (a LEFT MV holds every live fact row) — a dim-only epoch may
    not scan or feed-read the FACT table, and the fact-side
    enrichment's dim read must be bucket-pruned (a point lookup, not
    an O(dim) scan)."""
    from realdeal_spark.cdc.joinview import (
        advance_join_view,
        create_join_view,
    )
    from realdeal_spark.lake import LakeTable, merge_apply

    fact = LakeTable.create(
        spark, str(tmp_path / "f"),
        "k bigint, ts bigint, fk bigint, val double",
        ["k"], ["ts"], n_buckets=4, soft_delete=True,
    )
    dim = LakeTable.create(
        spark, str(tmp_path / "d"),
        "dk bigint, dts bigint, label string",
        ["dk"], ["dts"], n_buckets=8, soft_delete=True,
    )
    view = create_join_view(fact, dim, {"fk": "dk"}, str(tmp_path / "v"))
    merge_apply(fact, spark.createDataFrame(
        [(i, 10, i % 3, float(i), "update") for i in range(30)],
        "k bigint, ts bigint, fk bigint, val double, op string",
    ), epoch_id="f1")
    merge_apply(dim, spark.createDataFrame(
        [(i, 10, f"L{i}", "update") for i in range(20)],
        "dk bigint, dts bigint, label string, op string",
    ), epoch_id="d1")
    advance_join_view(fact, dim, view, {"fk": "dk"})

    # fact-side epoch: the dim read must go through lookup (pruned to
    # the probed keys' buckets, not all 8)
    merge_apply(fact, spark.createDataFrame(
        [(100, 20, 1, 1.0, "update")],
        "k bigint, ts bigint, fk bigint, val double, op string",
    ), epoch_id="f2")
    dim_read_calls = []
    orig_read = dim.read

    def spy_read(*a, **kw):
        dim_read_calls.append(kw)
        return orig_read(*a, **kw)

    dim.read = spy_read
    try:
        advance_join_view(fact, dim, view, {"fk": "dk"})
    finally:
        dim.read = orig_read
    pruned = [
        kw for kw in dim_read_calls
        if kw.get("buckets") is not None and len(kw["buckets"]) < 8
    ]
    assert pruned, f"dim reads were not bucket-pruned: {dim_read_calls}"

    # dim-only epoch: fact table must not be read at all
    merge_apply(dim, spark.createDataFrame(
        [(1, 20, "L1-v2", "update")],
        "dk bigint, dts bigint, label string, op string",
    ), epoch_id="d2")
    expected = sorted(
        (r["k"], r["label"])
        for r in fact.read().join(
            dim.read().select(F.col("dk").alias("fk"), "label"),
            on="fk", how="left",
        ).collect()
    )

    def boom(*a, **kw):
        raise AssertionError("dim-only advance touched the fact table")

    fact.read = boom
    fact.read_changes = boom
    try:
        advance_join_view(fact, dim, view, {"fk": "dk"})
    finally:
        del fact.read, fact.read_changes
    got = sorted((r["k"], r["label"]) for r in view.read().collect())
    assert got == expected
