"""Property-based replay equivalence (SURVEY §7.3 #2/#3).

For arbitrary small event histories — random ops, shuffled arrival
order, out-of-order timestamps, random epoch boundaries, every
conflation strategy — the final visible table state must equal the
sequential naive-replay oracle.  This is the engine's core contract:
*state is independent of how the log is chopped into epochs and of
arrival order within them*.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realdeal_spark.cdc.apply import CdcApplier
from realdeal_spark.cdc.events import EVENT_SCHEMA, naive_replay
from realdeal_spark.lake.table import LakeTable

URLS = [f"u{i}" for i in range(5)]
OPS = ["insert", "update", "delete"]
BASE = dt.datetime(2024, 1, 1)

event_lists = st.lists(
    st.tuples(
        st.integers(0, len(URLS) - 1),  # url
        st.integers(0, 2),  # op
        st.integers(-5, 30),  # ts offset (negatives → out-of-order)
    ),
    min_size=1,
    max_size=25,
)


def _df(spark, rows, perm_seed):
    events = []
    for lsn, (u, op, toff) in enumerate(rows):
        body = None if OPS[op] == "delete" else f"b{lsn}".encode()
        events.append(
            (lsn, OPS[op], URLS[u], BASE + dt.timedelta(minutes=lsn + toff), body, "en")
        )
    # shuffled arrival order inside the frame (deterministic per seed)
    events.sort(key=lambda e: hash((perm_seed, e[0])))
    return spark.createDataFrame(events, EVENT_SCHEMA)


def _expected(events_df):
    fin = naive_replay([r.asDict() for r in events_df.collect()])
    return {u: (v["warc_ts"], v["lsn"]) for u, v in fin.items()}


def _actual(table):
    return {r["url"]: (r["warc_ts"], r["lsn"]) for r in table.read().collect()}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=event_lists, epoch_size=st.integers(1, 30), seed=st.integers(0, 99))
def test_replay_equals_oracle_any_epoching(spark, tmp_path_factory, rows, epoch_size, seed):
    tmp = tmp_path_factory.mktemp("prop")
    table = LakeTable.create(
        spark,
        str(tmp / "t"),
        "url string, warc_ts timestamp_ntz, lsn bigint, html binary, lang string",
        ["url"],
        ["warc_ts", "lsn"],
        n_buckets=4,
        soft_delete=True,
    )
    events = _df(spark, rows, seed)
    strategy = ["max_by", "window", "light"][seed % 3]
    mode = ["cow", "mor"][(seed // 3) % 2]
    applier = CdcApplier(table, conflate_strategy=strategy, merge_mode=mode)
    applier.run(events, epoch_size=epoch_size, lsn_bounds=(0, len(rows) - 1))
    assert _actual(table) == _expected(events), f"strategy={strategy} mode={mode}"


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=event_lists, split=st.integers(1, 24), seed=st.integers(0, 99))
def test_two_different_epochings_converge(spark, tmp_path_factory, rows, split, seed):
    """The same log applied as one epoch vs two arbitrary epochs must
    produce identical state (epoch-boundary independence, incl. a
    delete in epoch 1 vs a stale update in epoch 2)."""
    tmp = tmp_path_factory.mktemp("prop2")
    mk = lambda name: LakeTable.create(
        spark,
        str(tmp / name),
        "url string, warc_ts timestamp_ntz, lsn bigint, html binary, lang string",
        ["url"],
        ["warc_ts", "lsn"],
        n_buckets=4,
        soft_delete=True,
    )
    events = _df(spark, rows, seed)
    hi = len(rows) - 1
    t1 = mk("one")
    CdcApplier(t1).apply_epoch(events, 0, hi)
    t2 = mk("two")
    cut = min(split, hi)
    # cross-mode convergence: chopped replay through MoR deltas must
    # equal the single CoW epoch
    a2 = CdcApplier(t2, merge_mode=["cow", "mor"][seed % 2])
    a2.apply_epoch(events, 0, cut)
    if cut < hi:
        a2.apply_epoch(events, cut + 1, hi)
    assert _actual(t1) == _actual(t2)
