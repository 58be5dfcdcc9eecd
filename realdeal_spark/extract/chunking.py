"""Document chunking and training-sequence packing.

The last mile of a pretraining data pipeline: documents become
fixed-size token chunks (with optional overlap for context
continuity), and chunks pack into fixed-length training sequences —
the unit the training run actually consumes.

Both operators are pure Catalyst:

- :func:`chunk_documents` is array expressions only (split →
  sequence of starts → slice per start) — no explode of tokens, no
  shuffle, no UDF; cost is O(tokens) map-side.
- :func:`pack_sequences` is GPT-style concat-and-split packing: lay
  every chunk on one global token tape in a deterministic hash order
  (documents shuffled, a document's chunks adjacent and ordered) and
  cut the tape every ``seq_len`` tokens.  A chunk spanning a cut is
  split across the two sequences — zero padding, every sequence
  exactly full.  The global running offset is the same distributed
  range-bucket prefix sum the sampling operators use
  (operators/sampling.py): no single reducer ever sorts the whole
  corpus, which is what makes this packing viable at 10^10 chunks.

Token = whitespace token of the normalized text (extract/textstats
conventions), standing in for a real BPE vocabulary the same way the
token-budget sampler does; swap ``tokens_expr`` for a tokenizer UDF
column and every downstream expression is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realdeal_spark.extract.textstats import tokens_expr
from realdeal_spark.operators.sampling import _with_stratum_prefix


def chunk_starts_expr(n_tokens: Column, max_tokens: int, overlap: int) -> Column:
    """Array of chunk start offsets for a document of ``n_tokens``:
    0, step, 2·step, … with ``step = max_tokens - overlap``, dropping
    any non-first start whose chunk is wholly contained in its
    predecessor (``s >= n - overlap`` ⇒ tokens [s, n) ⊆ the previous
    chunk's [s - step, s + overlap))."""
    step = max_tokens - overlap
    return F.filter(
        F.sequence(F.lit(0), n_tokens - 1, F.lit(step)),
        lambda s: (s == 0) | (s < n_tokens - overlap),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 256,
    overlap: int = 0,
) -> DataFrame:
    """One row per (document, chunk): ``(id_col, chunk_idx,
    chunk_text, n_tokens)``.

    Sliding window over the whitespace tokens: chunk *i* covers tokens
    ``[i·step, i·step + max_tokens)`` with ``step = max_tokens -
    overlap``; the final chunk may be shorter; a trailing window that
    would add no new tokens is dropped.  Documents with no tokens
    yield no chunks.  Deterministic and engine-portable (the DuckDB
    oracle replays it with list functions)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}"
        )
    toks = tokens_expr(text_col)
    # stage the token array once (multi-referenced non-cheap alias
    # blocks CollapseProject — the minhash_signatures lesson)
    staged = df.select(F.col(id_col), toks.alias("_tk")).where(
        F.size("_tk") > 0
    )
    starts = chunk_starts_expr(F.size("_tk"), max_tokens, overlap)
    return (
        staged.select(
            id_col, "_tk", F.posexplode(starts).alias("chunk_idx", "_s")
        )
        .select(
            id_col,
            "chunk_idx",
            F.array_join(
                F.slice("_tk", F.col("_s") + 1, max_tokens), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(max_tokens), F.size("_tk") - F.col("_s")
            ).cast("int").alias("n_tokens"),
        )
    )


def pack_sequences(
    chunks: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_idx",
    token_col: str = "n_tokens",
    salt: str = "pack-v1",
    skew_buckets: int = 1024,
) -> DataFrame:
    """Assign every chunk its place on the training-sequence tape:
    ``(seq_id, id_col, chunk_col, tok_start, tok_end, chunk_off)``.

    Chunks are laid end-to-end in (md5(salt‖id), id, chunk_idx) order
    — deterministic, layout-independent, documents shuffled but
    internally ordered — and the tape is cut every ``seq_len`` tokens.
    A chunk spanning a cut emits one row per overlapped sequence:
    ``[tok_start, tok_end)`` is the slice of sequence ``seq_id`` it
    fills and ``chunk_off`` is where that slice begins inside the
    chunk, so a writer can materialize any sequence by slicing its
    chunks — and the row count proves the packing (every sequence but
    the last is exactly full, no padding).

    The running offset is the sampling operators' range-bucket
    distributed prefix sum (exact, skew-safe); ``skew_buckets=0``
    forces the single-window plan — both return identical rows."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    rows = chunks.where(F.col(token_col) > 0)
    pref = _with_stratum_prefix(
        rows, [], id_col, salt, skew_buckets,
        val_col=token_col, order_tail=[chunk_col],
    ).select(
        F.col(id_col),
        F.col(chunk_col),
        (F.col("_prefix") - F.col(token_col)).alias("_st"),
        F.col("_prefix").alias("_en"),
    )
    # exact integer division (div), not floor(double /): the tape
    # offset is a long and must stay exact past 2^53 tokens
    seqs = F.sequence(
        F.expr(f"_st div {int(seq_len)}"),
        F.expr(f"(_en - 1) div {int(seq_len)}"),
    )
    return (
        pref.select(
            F.col(id_col),
            F.col(chunk_col),
            "_st",
            "_en",
            F.explode(seqs).alias("seq_id"),
        )
        .select(
            "seq_id",
            id_col,
            chunk_col,
            F.greatest(F.col("_st") - F.col("seq_id") * seq_len, F.lit(0))
            .cast("int")
            .alias("tok_start"),
            F.least(
                F.col("_en") - F.col("seq_id") * seq_len, F.lit(seq_len)
            )
            .cast("int")
            .alias("tok_end"),
            F.greatest(F.col("seq_id") * seq_len - F.col("_st"), F.lit(0))
            .cast("int")
            .alias("chunk_off"),
        )
    )
