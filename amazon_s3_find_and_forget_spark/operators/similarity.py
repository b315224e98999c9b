"""Similarity search over an embedding column (``array<float>``).

- ``cosine_scores`` / ``cosine_topk`` — brute-force baseline. The dot
  product is a built-in ``aggregate(zip_with(...))`` expression: JVM-side,
  no Python in the loop, scans the embedding column once. At 100 TB this
  is a single map-only stage + a tiny top-k.
- ``hyperplane_bucket`` / ``lsh_topk`` — random-hyperplane LSH scale
  path: 2^bits buckets; the query probes its own bucket (plus optional
  multi-probe neighbors at hamming distance 1), so the scan prunes to
  ~1/2^bits of the corpus. Hyperplanes are seeded numpy normals —
  deterministic across runs/executors.
- ``embedding_near_duplicates`` — near-dup pairs by cosine >= threshold,
  candidates from shared LSH bucket.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_scores(
    df: DataFrame,
    query_vec: list[float],
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """cosine(emb, query) per row — map-only, JVM expressions throughout."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    emb = F.col(emb_col)
    cos = _dot(emb, q) / (_norm(emb) * F.lit(qn))
    return df.select(F.col(id_col), F.round(cos, 6).alias("cosine"))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force exact top-k (ties broken by id for determinism)."""
    return (
        cosine_scores(df, query_vec, emb_col, id_col)
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim)


def hyperplane_bucket(
    emb: Column, planes: np.ndarray
) -> Column:
    """LSH bucket id: sign bit of the dot product with each hyperplane."""
    bit_terms = []
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit_terms.append(
            F.when(_dot(emb, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    bucket = bit_terms[0]
    for t in bit_terms[1:]:
        bucket = bucket + t
    return bucket


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    bits: int = 8,
    emb_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    planes = _hyperplanes(dim, bits, seed)
    return df.withColumn("lsh_bucket", hyperplane_bucket(F.col(emb_col), planes))


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: scan only the query's LSH bucket (+ hamming-1
    neighbor buckets when ``multiprobe``). On a partitioned/bucketed
    layout keyed by ``lsh_bucket`` this is partition pruning."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, bits, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qbits = int(sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, q)) > 0))
    probes = [qbits] + (
        [qbits ^ (1 << i) for i in range(bits)] if multiprobe else []
    )
    bucketed = with_lsh_bucket(df, dim, bits, emb_col, seed)
    pruned = bucketed.where(F.col("lsh_bucket").isin(probes))
    return (
        cosine_scores(pruned, query_vec, emb_col, id_col)
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def embedding_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs (cosine >= threshold); candidates share a bucket."""
    bucketed = with_lsh_bucket(df, dim, bits, emb_col, seed).select(
        F.col(id_col).alias("_id"),
        F.col(emb_col).alias("_emb"),
        "lsh_bucket",
    )
    grouped = (
        bucketed.groupBy("lsh_bucket")
        .agg(F.sort_array(F.collect_list(F.struct("_id", "_emb"))).alias("items"))
        .where(F.size("items") > 1)
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (a, i) -> "
                "transform(slice(items, i + 2, size(items) - i - 1), "
                "b -> struct(a as a, b as b))))"
            )
        ).alias("p")
    ).select(
        F.col("p.a._id").alias("id_a"),
        F.col("p.b._id").alias("id_b"),
        (
            _dot(F.col("p.a._emb"), F.col("p.b._emb"))
            / (_norm(F.col("p.a._emb")) * _norm(F.col("p.b._emb")))
        ).alias("cosine"),
    )
    return (
        pairs.where(F.col("cosine") >= threshold)
        .withColumn("cosine", F.round("cosine", 6))
        .distinct()
    )
