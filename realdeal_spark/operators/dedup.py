"""Document deduplication family: exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Everything here is pure Catalyst column expressions over arrays — no
Python UDFs — so the hot path stays JVM-side and whole-stage-codegen.
Hash base is md5 (bit-identical in Spark and DuckDB), so every
operator has an exact cross-engine oracle.

Scale notes per operator are on the functions; the common theme:
shingle/signature explosion is bounded per document (k perms, b
bands), candidate generation is an equi-join on (band, hash) — a
shuffle on a well-distributed key — and only candidates pay the
verification cost.

The reference's dedup is key-based only (A1/A2: dedupe_properties.py,
notebook cell 4); the content-based family generalizes it per the
training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^61-1: modulus for the MinHash permutation family
# (a_i * h + b_i) mod P.  Small deterministic a/b below are shared
# with the DuckDB oracle SQL.
MERSENNE_61 = (1 << 61) - 1


def _hash64(c: Column) -> Column:
    """Portable 48-bit string hash: first 12 hex chars of md5.

    48 bits keeps the MinHash permutation ``a*h + b`` under 2^63
    (ANSI overflow-safe) while staying collision-safe for corpus-scale
    shingle sets.  DuckDB twin: ``('0x' || substr(md5(x), 1, 12))::bigint``.
    """
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("bigint")


def normalized_text(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id representative per normalized text value.

    Two narrow passes instead of carrying documents through the
    aggregate: (1) hash-groupBy min(id) — a fixed-width HashAggregate
    with map-side partial agg, shuffling (16B hash, 8B id) per row,
    never the document; (2) left-semi join the surviving ids back.
    (An earlier min_by(full-row-struct) form planned as SortAggregate
    and shuffled whole documents — 5× slower at bench scale and
    pathological at 100 TB.)"""
    h = F.md5(normalized_text(text_col)).alias("_th")
    survivors = (
        df.select(h, F.col(id_col).alias("_id"))
        .groupBy("_th")
        .agg(F.min("_id").alias(id_col))
        .select(id_col)
    )
    return df.join(survivors, on=id_col, how="left_semi")


def shingles_expr(col: str | Column, n: int = 3) -> Column:
    """n-token shingles of normalized text, as an array of strings.

    DuckDB twin: tokens via ``regexp_split_to_array``, shingles via
    ``list_transform(range(...), i -> array_to_string(tokens[i:i+n-1]
    , ' '))`` (see oracle SQL).
    """
    toks = F.split(normalized_text(col), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )


def minhash_signature_expr(
    col: str | Column, num_perm: int = 16, shingle_n: int = 3
) -> Column:
    """MinHash signature: array of ``num_perm`` bigints.

    perm_i(h) = (a_i * h + b_i) mod 2^61-1 with a_i = 2i+1,
    b_i = 1000003*i (deterministic, coprime to P) over the portable
    shingle hash.  min per permutation.
    """
    sh = shingles_expr(col, shingle_n)
    hashes = F.transform(sh, lambda s: _hash64(s))
    sigs = []
    for i in range(num_perm):
        a, b = 2 * i + 1, 1000003 * i
        sigs.append(
            F.array_min(
                F.transform(hashes, lambda h: (h * a + b) % MERSENNE_61)
            )
        )
    return F.array(*sigs)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(_id, _sig array) via **staged projections**: text → shingles →
    hashes → 16 permutation minima, one select each, every expensive
    alias referenced more than once downstream.  The staging is
    load-bearing: multi-referenced non-cheap aliases block Catalyst's
    CollapseProject, so the shingle/md5 arrays are computed once per
    row; a single fused expression tree re-evaluated them per
    permutation and per band (23× slower at bench — see BENCH notes).
    """
    def perm(a: int, b: int):
        return lambda h: (h * a + b) % MERSENNE_61

    sigs = []
    for i in range(num_perm):
        sigs.append(F.array_min(F.transform("_hs", perm(2 * i + 1, 1000003 * i))))
    return (
        df.select(
            F.col(id_col).alias("_id"), shingles_expr(text_col, shingle_n).alias("_sh")
        )
        .select("_id", F.transform("_sh", _hash64).alias("_hs"))
        .select("_id", F.array(*sigs).alias("_sig"))
    )


def _banded_minhash_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """(_id, band, bh) rows via an Arrow-batched mapInPandas pass.

    Bit-identical to the Catalyst expression path (md5 == md5; the
    permutation arithmetic stays in exact int64 — h < 2^48, a ≤ 2k+1,
    so h·a+b < 2^53), but ~10× faster: the expression path pays
    interpreted higher-order-function evaluation per shingle per
    permutation, while here the (shingles × permutations) matrix is
    one numpy broadcast per document.  This is the engine's
    documented exception to "stay JVM-side": vectorized Arrow UDFs
    where built-ins can't express the computation *efficiently*.
    Normalization matches ``normalized_text`` (ASCII ``\\s``, as in
    Java regex).

    The output ``_id`` field keeps the source id column's type (int
    family or string) — Arrow round-trips both losslessly; other id
    types should use the expression path.
    """
    import hashlib
    import re as _re
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    rows_per_band = num_perm // bands
    A = np.array([2 * i + 1 for i in range(num_perm)], dtype=np.int64)
    B = np.array([1000003 * i for i in range(num_perm)], dtype=np.int64)
    P = MERSENNE_61
    ws = _re.compile(r"\s+", _re.ASCII)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, band_ids, bhs = [], [], []
            for _id, text in zip(pdf[id_col], pdf[text_col]):
                norm = ws.sub(" ", (text or "").strip()).lower()
                toks = norm.split(" ")
                n_sh = max(len(toks) - (shingle_n - 1), 1)
                shingles = [" ".join(toks[i : i + shingle_n]) for i in range(n_sh)]
                H = np.array(
                    [
                        int(hashlib.md5(s.encode("utf-8")).hexdigest()[:12], 16)
                        for s in shingles
                    ],
                    dtype=np.int64,
                )
                sig = ((H[:, None] * A[None, :] + B[None, :]) % P).min(axis=0)
                for b in range(bands):
                    vals = sig[b * rows_per_band : (b + 1) * rows_per_band]
                    key = ",".join(str(int(v)) for v in vals)
                    ids.append(_id)
                    band_ids.append(b)
                    bhs.append(hashlib.md5(key.encode()).hexdigest())
            yield pd.DataFrame({"_id": ids, "band": band_ids, "bh": bhs})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        gen, schema=f"_id {id_type}, band int, bh string"
    )


def banded_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    use_arrow: bool = True,
) -> DataFrame:
    """The banded-LSH frame: one ``(_id, band, bh)`` row per document
    per band, where ``bh`` = md5 of the band's sub-signature values.

    This is the candidate-generation key both for the batch self-join
    (:func:`minhash_lsh_pairs`) and for the CDC-maintained dedup
    index (lake/dedupidx.py), so both stay bit-identical to the same
    DuckDB oracle.  Arrow fast path for ids that round-trip pandas
    losslessly; pure-Catalyst expression path otherwise.
    """
    arrow_ok = df.schema[id_col].dataType.simpleString() in {
        "tinyint", "smallint", "int", "bigint", "string"
    }
    if use_arrow and arrow_ok:
        return _banded_minhash_arrow(
            df, text_col, id_col, num_perm, bands, shingle_n
        )
    rows_per_band = num_perm // bands
    with_sig = minhash_signatures(df, text_col, id_col, num_perm, shingle_n)
    band_cols = []
    for b in range(bands):
        band_vals = F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band)
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *[
                    band_vals.getItem(i).cast("string")
                    for i in range(rows_per_band)
                ])).alias("bh"),
            )
        )
    return with_sig.select(
        "_id", F.explode(F.array(*band_cols)).alias("b")
    ).select("_id", "b.band", "b.bh")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    use_arrow: bool = True,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    Signature split into ``bands`` bands of num_perm/bands rows; a
    pair is a candidate iff some band's sub-signature matches
    exactly.  Join key is (band_id, md5(band values)) — short, well
    distributed; the self-join never sees full documents, only
    (id, band hash), and the banded frame is persisted so the two
    join sides share one signature computation.
    Output: (id_a, id_b) with id_a < id_b, distinct.
    """
    banded = banded_minhash(
        df, text_col, id_col, num_perm, bands, shingle_n, use_arrow
    )
    # localCheckpoint (eager): both self-join sides read one
    # materialization (~50B/doc/band), and — unlike .persist(), which
    # stays in the CacheManager until an explicit unpersist — the
    # checkpointed RDD is released by the ContextCleaner as soon as
    # the returned DataFrame is garbage-collected, so repeated calls
    # in a long-lived session don't leak executor storage.
    banded = banded.localCheckpoint(eager=True)
    l = banded.alias("l")
    r = banded.alias("r")
    pairs = (
        l.join(
            r,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bh") == F.col("r.bh"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    return pairs


def simhash_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """(id, simhash) with the token-hash array staged once (same
    CollapseProject reasoning as minhash_signatures — the one-shot
    :func:`simhash_expr` re-hashes the tokens per bit)."""
    def bit_vote(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j) % 2 == 1, 1
        ).otherwise(-1)

    votes = []
    for j in range(bits):
        vote = F.aggregate(F.col("_hs"), F.lit(0).cast("bigint"), bit_vote(j))
        votes.append(F.when(vote > 0, F.lit(1 << j)).otherwise(0).cast("bigint"))
    toks = F.split(normalized_text(text_col), r"\s+")
    out = votes[0]
    for v in votes[1:]:
        out = out + v
    return (
        df.select(F.col(id_col), toks.alias("_tk"))
        .select(id_col, F.transform("_tk", _hash64).alias("_hs"))
        .select(id_col, out.alias("simhash"))
    )


def simhash_expr(col: str | Column, bits: int = 16) -> Column:
    """SimHash over tokens: bit j set iff sum over tokens of
    (bit j of token hash ? +1 : -1) > 0.

    ``bits`` kept small (16) so the expression stays compact and the
    oracle SQL tractable; collision behavior is the same shape as 64.
    """
    toks = F.split(normalized_text(col), r"\s+")
    hashes = F.transform(toks, lambda t: _hash64(t))
    out = F.lit(0).cast("bigint")
    for j in range(bits):
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("bigint"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j) % 2 == 1, 1).otherwise(-1),
        )
        out = out + F.when(vote > 0, F.lit(1 << j)).otherwise(0).cast("bigint")
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """N-gram Jaccard similarity pairs ≥ threshold.

    Inverted-index join: explode distinct shingles, self-join on
    shingle, count intersections per pair, divide by union sizes.
    The shuffle key is the shingle, so one ultra-frequent shingle
    (a stopword trigram) makes the self-join quadratic on a single
    key — the classic skewed-key blowup.  ``max_df`` is the guard:
    shingles appearing in more than ``max_df`` documents are dropped
    from the index *and* from the per-document sizes, i.e. Jaccard is
    computed over the capped shingle space (the standard stop-shingle
    semantics; deterministic, and mirrored exactly in the DuckDB
    oracle).  The hot-shingle list is tiny by construction, so the
    drop is a broadcast anti-join — the document side never
    reshuffles for it.  ``max_df=None`` is the exact uncapped
    baseline; at scale always set a cap (pairs sharing only
    ultra-common shingles are noise anyway).
    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    # shingles are hashed to 48-bit ints before the explode: the
    # inverted-index self-join shuffles 8-byte keys instead of ~20-byte
    # strings, and the frame is localCheckpoint'ed so index, sizes,
    # and both join sides share one shingling pass (released by the
    # ContextCleaner when the result is GC'd — no cache leak across
    # calls, unlike .persist()).
    sh = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.array_distinct(
                    F.transform(shingles_expr(text_col, shingle_n), _hash64)
                )
            ).alias("sh"),
        )
    ).localCheckpoint(eager=True)
    if max_df is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") > max_df)
            .select("sh")
        )
        sh = sh.join(F.broadcast(hot), on="sh", how="left_anti")
    sizes = sh.groupBy("_id").agg(F.count("*").alias("n"))
    l = sh.alias("l")
    r = sh.alias("r")
    inter = (
        l.join(r, on=[F.col("l.sh") == F.col("r.sh"), F.col("l._id") < F.col("r._id")])
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold.

    Brute-force all-pairs within the frame — correct baseline, O(n²);
    the scale path buckets by LSH first (similarity.lsh_bucketed_knn
    shares the plane machinery).  Cosine is computed JVM-side with
    zip_with + aggregate.
    """
    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    a = v.alias("a")
    b = v.alias("b")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    norm = lambda x: F.sqrt(dot(x, x))
    cos = dot(F.col("a._v"), F.col("b._v")) / (
        norm(F.col("a._v")) * norm(F.col("b._v"))
    )
    return (
        a.join(b, F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def embedding_neardup_pairs_bucketed(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 4,
    n_tables: int = 2,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed — the scale path.

    Multi-table random-hyperplane LSH (similarity.hyperplane_bits_expr,
    table t = planes ``t*n_planes ..``): a pair is a candidate iff its
    two vectors land in the same bucket of *some* table; only
    candidates pay the exact-cosine verification.  Join shape mirrors
    minhash_lsh_pairs: the candidate self-join sees only
    (id, table, bucket int) — never vectors — then the distinct pairs
    join the vectors back by id (fixed-width shuffle, ~8·dim bytes a
    row).  No cartesian anywhere (asserted in tests/test_plans.py).
    Recall < 1 by construction; raise ``n_tables`` (linear candidate
    cost) or lower ``n_planes`` (exponential bucket-size cost) to
    trade cost for recall — measured in tests/test_operators.py.
    Bucket derivation is deterministic md5 planes, so the DuckDB
    oracle regenerates identical buckets.
    """
    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    from realdeal_spark.operators.similarity import cosine_expr, hyperplane_bits_expr

    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                hyperplane_bits_expr(
                    F.col("_v"), dim, n_planes, plane_offset=t * n_planes
                ).alias("bk"),
            )
            for t in range(n_tables)
        ]
    )
    banded = (
        v.select("_id", F.explode(buckets).alias("b"))
        .select("_id", "b.t", "b.bk")
        .localCheckpoint(eager=True)  # both join sides share one pass
    )
    l = banded.alias("l")
    r = banded.alias("r")
    cand = (
        l.join(
            r,
            on=[
                F.col("l.t") == F.col("r.t"),
                F.col("l.bk") == F.col("r.bk"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    va = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine_expr(F.col("_va"), F.col("_vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 8,
    min_hits: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Test-set decontamination: corpus documents sharing at least
    ``min_hits`` distinct ``shingle_n``-gram shingles with ANY
    benchmark document.  The canonical pre-training hygiene pass
    (n-gram overlap against eval sets); run it before training and
    drop the flagged ids.

    Output: (``id_col``, ``n_hits``) — n_hits = how many distinct
    shingles of the document also occur in the benchmark (evidence
    strength, useful for auditing threshold choices).

    Scale shape: both sides shingle → 48-bit hashes (the same
    portable md5 hash as the jaccard index, so the oracle replays
    it); the benchmark's distinct-shingle set is usually tiny
    relative to the corpus — ``broadcast_benchmark=True`` makes the
    probe a broadcast semi-join and the corpus is NEVER shuffled
    (flag off for benchmark sets beyond broadcast size: the same
    equi-join runs shuffled, still on 8-byte keys).  Raising
    ``shingle_n`` lowers false positives (an 8-gram collision is
    essentially always true contamination); ``min_hits`` filters
    boilerplate overlaps.
    """
    def hashed_shingles(df: DataFrame):
        return df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.array_distinct(
                    F.transform(shingles_expr(text_col, shingle_n), _hash64)
                )
            ).alias("sh"),
        )

    bench_sh = hashed_shingles(benchmark).select("sh").distinct()
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    hits = (
        hashed_shingles(corpus)
        .join(bench_sh, on="sh")
        .groupBy("_id")
        .agg(F.count("*").alias("n_hits"))
        .where(F.col("n_hits") >= min_hits)
    )
    return hits.select(F.col("_id").alias(id_col), "n_hits")
