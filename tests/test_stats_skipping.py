"""File-level min/max stats + data skipping (the Iceberg-manifest
lever): bounds are collected from parquet footers at commit time,
stored in the snapshot, and `read(range_filters=...)` both skips
files whose bounds are disjoint from the range and enforces the
predicate row-level.  MoR buckets are never file-skipped (pruning a
generation could flip the latest-per-key reconcile) — they filter
row-level after the reconcile."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from realdeal_spark.lake.merge import merge_apply
from realdeal_spark.lake.table import LakeTable, _enc_stat, _stats_disjoint

from tests.test_merge_cdc import _events_df, _mk_table, _ts


def _mk_log_table(spark, tmp_path, n_buckets=4):
    return LakeTable.create(
        spark,
        str(tmp_path / "log"),
        "url string, warc_ts timestamp_ntz, lsn bigint, html binary, lang string",
        key_columns=["url"],
        order_columns=["warc_ts", "lsn"],
        n_buckets=n_buckets,
        soft_delete=False,
    )


def _chunk(spark, lsn_lo, n):
    return _events_df(
        spark,
        [(lsn_lo + i, "insert", f"u{lsn_lo + i}", lsn_lo + i, f"B{i}") for i in range(n)],
    ).drop("op")


def test_stats_recorded_for_eligible_columns_only(spark, tmp_path):
    t = _mk_log_table(spark, tmp_path)
    t.append(_chunk(spark, 0, 50))
    entries = [fe for fl in t.snapshot().files.values() for fe in fl]
    assert entries
    for fe in entries:
        st = fe.get("stats")
        assert st and set(st) == {"warc_ts", "lsn"}  # no string/binary stats
        lo, hi = st["lsn"]
        assert 0 <= lo <= hi <= 49
        # timestamps encode as epoch micros (JSON-safe ints)
        assert isinstance(st["warc_ts"][0], int)


def test_stats_survive_snapshot_roundtrip(spark, tmp_path):
    t = _mk_log_table(spark, tmp_path)
    t.append(_chunk(spark, 0, 10))
    v = t.current_version()
    reloaded = LakeTable(spark, t.root).snapshot(v)
    entries = [fe for fl in reloaded.files.values() for fe in fl]
    assert all("stats" in fe for fe in entries)


def test_range_read_skips_disjoint_files_and_matches(spark, tmp_path):
    """Three appended epochs with disjoint lsn ranges: a range read
    over the middle epoch must scan only its files and return exactly
    the rows a full-scan filter returns."""
    t = _mk_log_table(spark, tmp_path)
    t.append(_chunk(spark, 0, 100))
    t.append(_chunk(spark, 100, 100))
    t.append(_chunk(spark, 200, 100))
    total_files = sum(len(fl) for fl in t.snapshot().files.values())

    out = t.read(range_filters={"lsn": (120, 180)})
    assert len(out.inputFiles()) < total_files  # files genuinely skipped
    got = sorted(r["lsn"] for r in out.collect())
    want = sorted(
        r["lsn"] for r in t.read().where("lsn between 120 and 180").collect()
    )
    assert got == want == list(range(120, 181))
    # half-open bounds
    assert t.read(range_filters={"lsn": (290, None)}).count() == 10
    assert t.read(range_filters={"lsn": (None, 9)}).count() == 10


def test_range_read_timestamp_bounds(spark, tmp_path):
    t = _mk_log_table(spark, tmp_path)
    t.append(_chunk(spark, 0, 100))
    t.append(_chunk(spark, 100, 100))
    lo, hi = _ts(50), _ts(149)
    out = t.read(range_filters={"warc_ts": (lo, hi)})
    assert out.count() == 100
    mn, mx = out.agg(F.min("warc_ts"), F.max("warc_ts")).first()
    assert (mn, mx) == (lo, hi)


def test_mor_bucket_filters_after_reconcile(spark, tmp_path):
    """A range filter whose upper bound excludes a key's newest
    version must drop the key entirely — never resurrect the older
    row a skipped generation would have exposed."""
    t = _mk_table(spark, tmp_path, n_buckets=2)
    merge_apply(t, _events_df(spark, [(1, "insert", "a", 10, "A1")]), mode="mor")
    merge_apply(t, _events_df(spark, [(2, "update", "a", 100, "A2")]), mode="mor")
    # bound excludes the update (warc_ts=100) but covers the insert
    out = t.read(range_filters={"warc_ts": (None, _ts(50))})
    assert out.count() == 0  # winner is out of range; old row must NOT surface
    # bound covering the winner returns exactly the winner
    rows = t.read(range_filters={"warc_ts": (_ts(50), None)}).collect()
    assert [bytes(r["html"]).decode() for r in rows] == ["A2"]


def test_stats_disjoint_logic():
    fe = {"stats": {"lsn": [100, 200]}}
    assert _stats_disjoint(fe, {"lsn": (201, None)})
    assert _stats_disjoint(fe, {"lsn": (None, 99)})
    assert not _stats_disjoint(fe, {"lsn": (150, 160)})
    assert not _stats_disjoint(fe, {"lsn": (200, 300)})  # touching edge
    assert not _stats_disjoint(fe, {"other": (0, 1)})  # no stats → keep
    assert not _stats_disjoint({}, {"lsn": (0, 1)})


def test_enc_stat_orders_timestamps():
    a = _enc_stat(dt.datetime(2024, 1, 1, 0, 0, 5))
    b = _enc_stat(dt.datetime(2024, 1, 1, 0, 0, 6))
    assert isinstance(a, int) and a < b
    assert _enc_stat(dt.date(1970, 1, 2)) == 1
    assert _enc_stat(True) == 1 and _enc_stat(3.5) == 3.5


def test_compact_restores_skippability_after_mor(spark, tmp_path):
    """MoR deltas disable skipping in their bucket; compaction folds
    them into base files whose fresh stats make the bucket skippable
    again."""
    t = _mk_table(spark, tmp_path, n_buckets=2)
    merge_apply(
        t,
        _events_df(spark, [(i, "insert", f"u{i}", i, f"B{i}") for i in range(40)]),
        mode="mor",
    )
    merge_apply(t, _events_df(spark, [(100, "update", "u3", 500, "N")]), mode="mor")
    t.compact(max_files_per_bucket=1)
    snap = t.snapshot()
    assert not any(fe.get("mor") for fl in snap.files.values() for fe in fl)
    assert all(
        "stats" in fe for fl in snap.files.values() for fe in fl
    )  # compacted files carry fresh bounds
    out = t.read(range_filters={"lsn": (100, None)})
    assert {r["url"] for r in out.collect()} == {"u3"}


def test_compact_writes_sorted_base_files(spark, tmp_path):
    """compact() defaults to the table's order columns as write sort
    order: every rewritten base file must hold rows non-decreasing in
    (warc_ts, lsn), so parquet row-group min/max bounds are monotone
    and a pushed time-range predicate prunes row groups inside the
    file (Iceberg write-sort-order analogue)."""
    import pyarrow.parquet as pq

    t = _mk_log_table(spark, tmp_path, n_buckets=2)
    # three epochs appended in deliberately shuffled lsn order
    rows = [(i, "insert", f"u{i}", i, f"B{i}") for i in range(90)]
    perm = [(i * 37) % 90 for i in range(90)]  # fixed permutation
    shuffled = [rows[p] for p in perm]
    for lo in (0, 30, 60):
        t.append(_events_df(spark, shuffled[lo : lo + 30]).drop("op"))
    t.compact(max_files_per_bucket=1)

    snap = t.snapshot()
    import os

    for fl in snap.files.values():
        for fe in fl:
            tbl = pq.read_table(
                os.path.join(t.root, fe["path"]), columns=["warc_ts", "lsn"]
            )
            ts = tbl.column("warc_ts").to_pylist()
            lsn = tbl.column("lsn").to_pylist()
            keys = list(zip(ts, lsn))
            assert keys == sorted(keys), f"unsorted base file {fe['path']}"
    # logical state untouched by the sorted rewrite
    assert sorted(r["lsn"] for r in t.read().collect()) == list(range(90))


def test_compact_sort_opt_out_and_explicit(spark, tmp_path):
    """sort_by=[] keeps the unsorted rewrite; an explicit column list
    overrides the order-column default."""
    import os

    import pyarrow.parquet as pq

    t = _mk_log_table(spark, tmp_path, n_buckets=1)
    rows = [(i, "insert", f"u{i}", i, f"B{i}") for i in range(40)]
    perm = [(i * 13) % 40 for i in range(40)]
    t.append(_events_df(spark, [rows[p] for p in perm[:20]]).drop("op"))
    t.append(_events_df(spark, [rows[p] for p in perm[20:]]).drop("op"))
    t.compact(max_files_per_bucket=1, sort_by=["url"])
    snap = t.snapshot()
    fe = next(fe for fl in snap.files.values() for fe in fl)
    urls = (
        pq.read_table(os.path.join(t.root, fe["path"]), columns=["url"])
        .column("url")
        .to_pylist()
    )
    assert urls == sorted(urls)


def test_range_predicate_pushed_to_parquet_scan(spark, tmp_path):
    """The row-level range enforcement in read() must reach the scan
    as PushedFilters — that is what turns the sorted row groups into
    actual skipped IO."""
    t = _mk_log_table(spark, tmp_path, n_buckets=2)
    t.append(_chunk(spark, 0, 60))
    t.compact()
    out = t.read(range_filters={"lsn": (10, 20)})
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in p and "GreaterThanOrEqual(lsn,10)" in p


def test_cow_merge_writes_sorted_buckets(spark, tmp_path):
    """The CoW MERGE rewrite keeps touched buckets in write sort order
    (table order columns) — the table stays range-prunable between
    maintenance compactions."""
    import os

    import pyarrow.parquet as pq

    t = _mk_table(spark, tmp_path, n_buckets=2)
    merge_apply(
        t,
        _events_df(
            spark,
            [(i, "insert", f"u{i}", (i * 29) % 50, f"B{i}") for i in range(50)],
        ),
    )
    merge_apply(
        t,
        _events_df(
            spark,
            [(100 + i, "update", f"u{i}", 100 + (i * 7) % 50, f"N{i}") for i in range(20)],
        ),
    )
    for fl in t.snapshot().files.values():
        for fe in fl:
            tbl = pq.read_table(
                os.path.join(t.root, fe["path"]), columns=["warc_ts", "lsn"]
            )
            keys = list(
                zip(tbl.column("warc_ts").to_pylist(), tbl.column("lsn").to_pylist())
            )
            assert keys == sorted(keys), f"unsorted CoW rewrite {fe['path']}"


# --------------------------------------------------------------------- zorder


def test_zorder_expr_matches_python_morton(spark):
    """zorder_expr must produce the Morton interleave of the columns'
    equi-depth ranks — checked against a pure-python reference on a
    small grid, including nulls (rank 0, sorts first)."""
    from realdeal_spark.lake.zorder import zorder_expr

    rows = [(i, float(i % 4), float(i // 4)) for i in range(16)] + [(16, None, 1.0)]
    df = spark.createDataFrame(rows, "id bigint, x double, y double")
    bounds = {"x": [0.0, 1.0, 2.0], "y": [0.0, 1.0, 2.0]}
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id", zorder_expr(["x", "y"], bounds, bits=2).alias("z")
        ).collect()
    }

    def rank(v, cuts):
        return 0 if v is None else sum(1 for c in cuts if v > c)

    def morton(rx, ry, bits=2):
        z = 0
        for b in range(bits):
            z |= ((rx >> b) & 1) << (2 * b)
            z |= ((ry >> b) & 1) << (2 * b + 1)
        return z

    for i, x, y in rows:
        assert got[i] == morton(rank(x, bounds["x"]), rank(y, bounds["y"])), i


def test_zorder_boundaries_validate_and_dedupe(spark):
    import pytest

    from realdeal_spark.lake.zorder import zorder_boundaries

    df = spark.createDataFrame(
        [(i, float(i % 2), "s") for i in range(100)],
        "id bigint, lowcard double, s string",
    )
    with pytest.raises(ValueError, match="cannot z-order"):
        zorder_boundaries(df, ["s"])
    with pytest.raises(ValueError, match="no such column"):
        zorder_boundaries(df, ["nope"])
    b = zorder_boundaries(df, ["lowcard"], bits=4)
    # only two distinct values -> cut list collapses after dedupe
    assert len(b["lowcard"]) <= 2


def test_compact_zorder_makes_both_dims_rowgroup_prunable(spark, tmp_path):
    """The scale claim, measured from parquet footers: after
    compact(zorder_by=[x, y]) every row group is tight in BOTH
    dimensions (mean per-row-group span << full span), whereas a
    linear sort_by=[x] leaves y unprunable (every row group spans
    ~the full y range).  Rows and range-filtered reads are unchanged
    by the rewrite."""
    import os

    import pyarrow.parquet as pq

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", "32768")  # force many row groups
    try:
        # a 200x200 grid: x and y genuinely independent (every y occurs
        # under every x), unlike two linear-mod functions of i which
        # would be bijectively correlated
        rows = [(i, i % 200, i // 200) for i in range(40000)]
        df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")

        def coverage(table, col):
            # only the files the CURRENT snapshot references — the
            # pre-compaction deltas stay on disk until expire_snapshots
            paths = [
                os.path.join(table.root, fe["path"])
                for fl in table.snapshot().files.values()
                for fe in fl
            ]
            spans, total_lo, total_hi = [], None, None
            if True:
                for p in paths:
                    md = pq.ParquetFile(p).metadata
                    names = {
                        md.row_group(0).column(ci).path_in_schema: ci
                        for ci in range(md.row_group(0).num_columns)
                    }
                    ci = names[col]
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(ci).statistics
                        spans.append((st.min, st.max))
                        total_lo = st.min if total_lo is None else min(total_lo, st.min)
                        total_hi = st.max if total_hi is None else max(total_hi, st.max)
            full = max(total_hi - total_lo, 1)
            assert len(spans) >= 8, f"want many row groups, got {len(spans)}"
            return sum(hi - lo for lo, hi in spans) / (len(spans) * full)

        # linear sort on x: x tight, y spans everything
        lin = LakeTable.create(
            spark, str(tmp_path / "lin"), "id bigint, x bigint, y bigint",
            key_columns=["id"], order_columns=["id"], n_buckets=1,
        )
        lin.append(df)
        lin.append(df.limit(1))  # second file so compact() has work
        lin.compact(sort_by=["x"])
        assert coverage(lin, "x") < 0.3
        assert coverage(lin, "y") > 0.7

        zt = LakeTable.create(
            spark, str(tmp_path / "z"), "id bigint, x bigint, y bigint",
            key_columns=["id"], order_columns=["id"], n_buckets=1,
        )
        zt.append(df)
        zt.append(df.limit(1))
        zt.compact(zorder_by=["x", "y"])
        cx, cy = coverage(zt, "x"), coverage(zt, "y")
        assert cx < 0.5 and cy < 0.5, (cx, cy)

        # semantics unchanged: same latest-state rows, range reads agree
        want = {r["id"]: (r["x"], r["y"]) for r in lin.read().collect()}
        got = {r["id"]: (r["x"], r["y"]) for r in zt.read().collect()}
        assert got == want
        flt = {(r["id"]) for r in zt.read(range_filters={"y": (100, 120)}).collect()}
        assert flt == {i for i, x, y in rows if 100 <= y <= 120}
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)


def test_mor_elsewhere_disables_skipping_table_wide(spark, tmp_path):
    """When ANY selected bucket is MoR the latest-per-key reconcile
    runs over the whole read — so even a non-MoR bucket holding the
    same key across plain-append file generations must not be
    file-skipped: pruning the winner's (out-of-range) file would
    resurrect the older in-range copy."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "mix"),
        "url string, warc_ts timestamp_ntz, lsn bigint, html binary, lang string",
        key_columns=["url"],
        order_columns=["warc_ts", "lsn"],
        n_buckets=8,
        soft_delete=True,  # merge_apply requires it
    )
    # two plain-append generations of the same key in one bucket
    t.append(_events_df(spark, [(1, "insert", "dup", 1, "OLD")]).drop("op"))
    t.append(_events_df(spark, [(1000, "insert", "dup", 1000, "NEW")]).drop("op"))
    # a MoR delta in a DIFFERENT bucket flips the table into reconcile mode
    def bucket_of(key):
        return str(
            spark.range(1)
            .select(F.pmod(F.xxhash64(F.lit(key)), F.lit(8)).cast("int"))
            .first()[0]
        )

    other = next(
        k for k in (f"elsewhere{i}" for i in range(32)) if bucket_of(k) != bucket_of("dup")
    )
    merge_apply(t, _events_df(spark, [(5, "insert", other, 5, "X")]), mode="mor")
    snap = t.snapshot()
    mor_buckets = {
        b for b, fl in snap.files.items() if any(fe.get("mor") for fe in fl)
    }
    assert bucket_of("dup") not in mor_buckets  # precondition: dup's bucket is plain
    # range covers only the OLD generation of 'dup'; its winner
    # (lsn=1000) is out of range, so the key must vanish — not
    # resurrect the pruned-away older row
    urls = {r["url"] for r in t.read(range_filters={"lsn": (None, 100)}).collect()}
    assert "dup" not in urls
    # and with no MoR anywhere, skipping still engages (files pruned)
    t2 = _mk_log_table(spark, tmp_path / "plain", n_buckets=2)
    t2.append(_chunk(spark, 0, 40))
    t2.append(_chunk(spark, 100, 40))
    out = t2.read(range_filters={"lsn": (110, 120)})
    total = sum(len(fl) for fl in t2.snapshot().files.values())
    assert len(out.inputFiles()) < total


def test_zorder_bits_clamped_to_long_range(spark):
    """bits * n_cols > 63 would wrap JVM shiftleft mod 64 and corrupt
    the Morton code; zorder_expr clamps per-column bits instead, and
    the clamped code must stay non-negative (bit 63 never set)."""
    import pytest

    from realdeal_spark.lake.zorder import zorder_expr

    cols = [f"c{i}" for i in range(8)]
    rows = [tuple([i] + [float((i * (j + 3)) % 97) for j in range(8)]) for i in range(64)]
    df = spark.createDataFrame(rows, "id bigint, " + ", ".join(f"{c} double" for c in cols))
    bounds = {c: [float(k) for k in range(0, 97, 7)] for c in cols}
    # default bits=8 over 8 columns would need 64 bit positions
    z = [r["z"] for r in df.select(zorder_expr(cols, bounds, bits=8).alias("z")).collect()]
    assert all(v >= 0 for v in z)
    # clamped depth must equal an explicit bits=63//n call
    z2 = [r["z"] for r in df.select(zorder_expr(cols, bounds, bits=7).alias("z")).collect()]
    assert z == z2
    with pytest.raises(ValueError, match="63-bit"):
        zorder_expr([f"x{i}" for i in range(64)], {f"x{i}": [0.0] for i in range(64)})
