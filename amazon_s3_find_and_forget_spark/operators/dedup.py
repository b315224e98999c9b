"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (100 TB):
- every candidate-generation step is a shuffle on a SMALL derived key
  (hash bucket / band), never an all-pairs product;
- signatures are computed with built-in expressions (``xxhash64``,
  ``transform``, ``array_min``) inside whole-stage codegen — the only
  Python is SimHash's Arrow-batched pandas_udf (bit-matrix numpy kernel);
- "keep the smallest id among duplicates" (not full connected
  components) is the dedup policy: a doc is dropped iff it duplicates a
  smaller-id doc. Deterministic, single join, no iterative convergence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def _spread(df: DataFrame) -> DataFrame:
    """Ensure CPU-bound per-doc work is spread across cores.

    A small corpus often arrives as one file -> one partition, which
    serializes signature computation on a single core. Repartition up to
    the cluster's parallelism when the input has too few partitions (a
    no-op shuffle of the doc table; at real scale the input already has
    more partitions than cores and this never triggers).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(target // 2, 2):
        return df.repartition(target)
    return df


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct content hash: the survivor id + group size."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Survivors only: the min-id doc of every exact-content group.

    Hash-groupBy + broadcast-back semi-join; the group relation is tiny
    relative to the corpus (one row per distinct hash), AQE will broadcast
    when it fits.
    """
    keep = exact_dup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


# --------------------------------------------------------------------------
# shingles + MinHash + LSH
# --------------------------------------------------------------------------

# xxhash64 each shingle ONCE, then derive the j-th permutation as
# (a_j * h + b_j) mod p over 31-bit space (the classic universal-hash
# scheme, same shape as Spark MLlib's MinHashLSH). One string hash per
# shingle instead of num_perm of them — at 100 TB the string hashing
# dominates, so this is a ~num_perm x cut of the hot loop — and every
# product stays < 2^62 (ANSI-mode safe).
_MINHASH_PRIME = 2038074743


def _affine_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(1, _MINHASH_PRIME)), int(rng.randint(0, _MINHASH_PRIME)))
        for _ in range(num_perm)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 64,
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures.

    Shape chosen for both CSE and scale: shingles are EXPLODED, the
    string hash is materialized once per shingle in a projection (inlining
    it into the 64 permutation expressions would recompute it 64x —
    Catalyst does not CSE lambda bodies), and the 64 permutations are
    ``min`` aggregates. Map-side partial aggregation reduces each doc to
    64 longs before any shuffle, so the shuffle carries signatures, not
    shingles.
    """
    # No array_distinct here: min over a multiset equals min over the set,
    # so duplicate shingles cannot change a MinHash signature. lower() is
    # pre-projected once per doc (a lambda-body reference would re-lower
    # the whole text per shingle).
    hashed = (
        _spread(df)
        .select(F.col(id_col).alias("_id"), F.lower(F.col(text_col)).alias("_lt"))
        .select(
            "_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(length(_lt) - {k - 1}, 1)), "
                    f"i -> substring(_lt, i, {k}))"
                )
            ).alias("_s"),
        )
        .select(
            "_id", F.pmod(F.xxhash64("_s"), F.lit(_MINHASH_PRIME)).alias("_h")
        )
    )
    aggs = [
        F.min(
            F.pmod(F.col("_h") * F.lit(a) + F.lit(b), F.lit(_MINHASH_PRIME))
        ).alias(f"_mh{j}")
        for j, (a, b) in enumerate(_affine_params(num_perm))
    ]
    sigs = hashed.groupBy("_id").agg(*aggs)
    return sigs.select(
        "_id", F.array(*[f"_mh{j}" for j in range(num_perm)]).alias("_sig")
    )


def _with_shingles(df: DataFrame, text_col: str, k: int) -> DataFrame:
    # sequence(1, greatest(len-k+1, 1)) then substring per index
    return df.withColumn(
        "_shingles",
        F.expr(
            f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
            f"i -> substring(lower({text_col}), i, {k})))"
        ),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    shingle -> minhash (num_perm perms) -> split into ``bands`` bands of
    r = num_perm/bands rows -> hash each band -> explode -> groupBy
    (band, hash) -> intra-bucket pairs (a < b). The shuffle key is the
    band hash; bucket sizes are bounded by collect_list, so the pair
    blow-up is local to genuinely-similar clusters.
    """
    assert num_perm % bands == 0
    sigs = minhash_signatures(df, text_col, id_col, k, num_perm)
    return band_pairs(sigs, bands, num_perm)


def band_pairs(sigs: DataFrame, bands: int, num_perm: int = 64) -> DataFrame:
    """Candidate pairs from precomputed signatures via LSH banding."""
    r = num_perm // bands
    banded = sigs.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.slice(F.col("_sig"), b * r + 1, r), F.lit(b))
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    buckets = banded.groupBy("band", "band_hash").agg(
        F.sort_array(F.collect_list("_id")).alias("ids")
    ).where(F.size("ids") > 1)
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (a, i) -> "
                "transform(slice(ids, i + 2, size(ids) - i - 1), b -> struct(a, b))))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b")).distinct()
    return pairs


def verified_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keeps >= threshold.

    Joins the (small) candidate relation back to the shingle sets twice;
    both joins broadcast the pair side.
    """
    sh = _with_shingles(_spread(df), text_col, k).select(
        F.col(id_col).alias("_jid"), F.col("_shingles").alias("_sh")
    )
    a = sh.withColumnRenamed("_jid", "id_a").withColumnRenamed("_sh", "_sh_a")
    b = sh.withColumnRenamed("_jid", "id_b").withColumnRenamed("_sh", "_sh_b")
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
    union = F.size(F.array_union("_sh_a", "_sh_b")).cast("double")
    return (
        joined.withColumn("jaccard", F.round(inter / union, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def signature_similarity_pairs(
    sigs: DataFrame, pairs: DataFrame, num_perm: int = 64, threshold: float = 0.8
) -> DataFrame:
    """Estimate Jaccard per candidate pair as the fraction of agreeing
    signature components (unbiased, se ~= sqrt(j(1-j)/num_perm)).

    O(num_perm) per pair against O(|shingle set|) for the exact check —
    at 100 TB this is the difference between joining 64-long signatures
    and re-shuffling full shingle sets. Use ``verified_jaccard_pairs``
    when exactness matters more than cost.
    """
    a = sigs.select(
        F.col("_id").alias("id_a"), F.col("_sig").alias("_sig_a")
    )
    b = sigs.select(
        F.col("_id").alias("id_b"), F.col("_sig").alias("_sig_b")
    )
    agree = F.size(
        F.filter(
            F.zip_with("_sig_a", "_sig_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard", F.round(agree / F.lit(float(num_perm)), 6)
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Survivors after near-dup removal: drop docs duplicating a smaller id.

    Signatures are computed once and persisted (they feed both the LSH
    banding and the similarity verify); the verify uses the signature
    estimate of Jaccard.
    """
    sigs = minhash_signatures(df, text_col, id_col, k, num_perm).persist()
    pairs = band_pairs(sigs, bands, num_perm)
    dups = signature_similarity_pairs(sigs, pairs, num_perm, threshold)
    # id_b > id_a by construction -> id_b is the duplicate to drop
    drop = dups.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, on=id_col, how="left_anti")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def _simhash64_kernel(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens — fully vectorized numpy kernel.

    All tokens of the Arrow batch are hashed in ONE ``pd.util.hash_array``
    call (C-level, deterministic fixed-key siphash), bit votes are summed
    per document with ``np.add.reduceat`` — no per-token Python loops.
    """
    token_lists = [
        str(t).lower().split() if t else [] for t in texts
    ]
    lengths = np.array([len(ts) for ts in token_lists], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.int64)
    nonempty = lengths > 0
    if not nonempty.any():
        return pd.Series(out)
    flat = np.concatenate(
        [np.asarray(ts, dtype=object) for ts in token_lists if ts]
    )
    hashes = pd.util.hash_array(flat)  # uint64, deterministic
    # bit matrix: (n_tokens, 64) of +-1 votes
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int8)
    votes = bits.astype(np.int32) * 2 - 1
    # per-document segment sums
    starts = np.concatenate([[0], np.cumsum(lengths[nonempty])[:-1]])
    seg = np.add.reduceat(votes, starts, axis=0)
    sims = (
        ((seg > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64))
        .sum(axis=1, dtype=np.uint64)
        .astype(np.int64)
    )
    out[nonempty] = sims
    return pd.Series(out)


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    # pandas_udf construction needs an active session -> build lazily
    simhash64 = pandas_udf(_simhash64_kernel, "long")
    return _spread(df).withColumn("simhash", simhash64(F.col(text_col)))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Hamming-LSH: band the 64-bit simhash into ``max_hamming + 1``
    chunks — by pigeonhole, any pair within the distance budget shares at
    least one exact chunk. Candidates verify with bit_count(xor) (JVM)."""
    n_chunks = max_hamming + 1
    chunk_bits = -(-64 // n_chunks)  # ceil
    mask = (1 << chunk_bits) - 1
    sh = with_simhash(df, text_col).select(
        F.col(id_col).alias("_id"), F.col("simhash")
    )
    chunks = sh.select(
        "_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), chunk_bits * c)
                    .bitwiseAND(F.lit(mask))
                    for c in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    buckets = (
        chunks.groupBy("chunk_idx", "chunk_val")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("_id", "simhash"))
            ).alias("items")
        )
        .where(F.size("items") > 1)
    )
    pairs = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (a, i) -> "
                    "transform(slice(items, i + 2, size(items) - i - 1), "
                    "b -> struct(a as a, b as b))))"
                )
            ).alias("p")
        )
        .select(
            F.col("p.a._id").alias("id_a"),
            F.col("p.b._id").alias("id_b"),
            F.bit_count(
                F.col("p.a.simhash").bitwiseXOR(F.col("p.b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


# --------------------------------------------------------------------------
# word n-gram Jaccard via inverted index
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_posting: int = 1000,
) -> DataFrame:
    """All pairs with word-n-gram Jaccard >= threshold, via inverted index.

    explode ngrams -> posting lists per ngram (capped at ``max_posting``
    to bound hot-key blowup; at 100 TB a stopword-like ngram would
    otherwise create a quadratic bucket) -> intra-list pairs -> count
    shared ngrams per pair -> jaccard = shared / (|a| + |b| - shared).
    """
    grams = _spread(df).select(
        F.col(id_col).alias("_id"),
        F.expr(
            f"array_distinct(transform(sequence(1, greatest(size(split(lower({text_col}), '\\\\s+')) - {n - 1}, 1)), "
            f"i -> array_join(slice(split(lower({text_col}), '\\\\s+'), i, {n}), ' ')))"
        ).alias("_grams"),
    )
    sizes = grams.select("_id", F.size("_grams").alias("_n"))
    posting = (
        grams.select("_id", F.explode("_grams").alias("g"))
        .groupBy("g")
        .agg(F.sort_array(F.collect_list("_id")).alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= max_posting))
    )
    pair_counts = (
        posting.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (a, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), b -> struct(a, b))))"
                )
            ).alias("p")
        )
        .groupBy("p.a", "p.b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    a_sz = sizes.withColumnRenamed("_id", "a").withColumnRenamed("_n", "n_a")
    b_sz = sizes.withColumnRenamed("_id", "b").withColumnRenamed("_n", "n_b")
    return (
        pair_counts.join(a_sz, "a")
        .join(b_sz, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("a").alias("id_a"), F.col("b").alias("id_b"), "jaccard"
        )
    )
