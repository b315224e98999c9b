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
- ``train_pq_codebooks`` / ``with_pq_code`` / ``pq_topk`` — product
  quantization: sample-trained per-subspace codebooks, Arrow-batched
  encode to m tinyint codes, ADC shortlist scored by a literal (m, k)
  lookup table in pure JVM expressions, exact-cosine rerank.
- ``ivfpq_topk`` — IVF cell pruning composed with PQ ADC + rerank (the
  FAISS IVFPQ serving layout re-expressed as Spark partition pruning +
  expression scoring).
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


def _cosine_or_null(num: Column, denom: Column) -> Column:
    """Cosine is UNDEFINED for zero-norm vectors: yield NULL.

    Never a raw division — under ANSI mode (Spark 4 default) x/0 throws,
    and under IEEE semantics it yields inf/nan, which engines ORDER
    differently (DuckDB sorts nan above every number; Spark sorts NULL
    last). NULL is the one value with identical comparison/ordering
    semantics on both sides of the oracle."""
    return F.when(denom != 0, num / denom)


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
    cos = _cosine_or_null(_dot(emb, q), _norm(emb) * F.lit(qn))
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
    """LSH bucket id: sign bit of the dot product with each hyperplane.

    One Arrow-batched gemm per batch (``X @ planes.T``), with the plane
    matrix captured in the UDF closure — NOT spelled as per-plane literal
    arrays in the expression tree. At real embedding widths (dim 768,
    8 bits x 8 tables) the literal encoding is ~50k Catalyst nodes per
    query and kills plan compilation; the closure ships once per task
    instead. Same kernel shape as ``with_ivf_cell``.
    """
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64)
    weights = (1 << np.arange(P.shape[0])).astype(np.int64)

    def bucket(series):
        import pandas as pd

        if len(series) == 0:
            return pd.Series([], dtype="int32")
        X = np.array(list(series), dtype=np.float64)
        bits = (X @ P.T) > 0
        return pd.Series((bits @ weights).astype(np.int32))

    return pandas_udf(bucket, "int")(emb)


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
    n_tables: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs (cosine >= threshold); candidates share any bucket.

    Multi-table random-hyperplane LSH (the OR-construction): a pair at
    angle theta collides in one ``bits``-bit table with probability
    (1 - theta/pi)^bits, and across ``n_tables`` independent tables with
    1-(1-p)^T — recall is tunable without loosening the per-table
    precision. Every candidate is then verified with the exact cosine,
    so precision is 1.0; only recall is approximate.

    Pair generation is a bucket self-join (streams/spills instead of an
    O(s^2) per-bucket array — same shape as dedup.band_pairs); the
    shuffle key is (table, bucket), never the embedding. Candidates are
    DEDUPLICATED as bare id pairs BEFORE any scoring — a pair colliding
    in several tables is scored once, and the verify joins against a
    once-normalized vector relation so the per-pair work is a single dot
    product (the previous shape computed two norms + a dot per bucket
    COLLISION: ~6x the higher-order-expression work at 8 tables).
    Zero-norm vectors have no defined cosine and are excluded up front.
    """
    from .dedup import _eager

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(emb_col).alias("_emb"),
        _norm(F.col(emb_col)).alias("_n"),
    ).where(F.col("_n") > 0)
    table_keys = [
        F.xxhash64(
            F.lit(t),
            hyperplane_bucket(
                F.col("_emb"), _hyperplanes(dim, bits, seed + t)
            ),
        )
        for t in range(n_tables)
    ]
    # (id, 8 longs) rows: scalar-narrow, cheap to cache — persist the
    # PRE-explode keys so the 8 bucket gemms run once, not per join side
    keyed_base = base.select("_id", F.array(*table_keys).alias("_k")).persist()
    keyed = keyed_base.select(
        "_id", F.explode("_k").alias("lsh_bucket")
    )
    normed = base.select(
        "_id",
        F.transform(
            "_emb", lambda x: x.cast("double") / F.col("_n")
        ).alias("_u"),
    )
    try:
        cand = (
            keyed.select(F.col("_id").alias("id_a"), "lsh_bucket")
            .join(
                keyed.select(F.col("_id").alias("id_b"), "lsh_bucket"),
                "lsh_bucket",
            )
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        ua = normed.select(F.col("_id").alias("id_a"), F.col("_u").alias("_ua"))
        ub = normed.select(F.col("_id").alias("id_b"), F.col("_u").alias("_ub"))
        scored = (
            cand.join(ua, "id_a")
            .join(ub, "id_b")
            .select(
                "id_a",
                "id_b",
                _dot(F.col("_ua"), F.col("_ub")).alias("cosine"),
            )
        )
        return _eager(
            scored.where(F.col("cosine") >= threshold)
            .withColumn("cosine", F.round("cosine", 6))
        )
    finally:
        keyed_base.unpersist()


def lsh_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int | None = None,
    bits: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "query_id",
    q_emb_col: str = "query_embedding",
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k for a whole TABLE of queries in one plan.

    Single-query search scans one bucket; a training-data pipeline asks
    "nearest neighbors for these 10M new documents" — that is a JOIN,
    not a loop: bucket both sides with the same hyperplanes (queries
    additionally explode to their hamming-1 probe buckets), equi-join on
    the bucket, score candidates with exact cosine, keep k per query
    via a ranking window partitioned by query id. The shuffle key is the
    bucket (then the query id for the window) — embeddings cross the
    wire once; on a corpus pre-bucketed/partitioned by ``lsh_bucket``
    the corpus side doesn't even shuffle.
    """
    from pyspark.sql import Window

    if dim is None:
        dim = len(df.select(emb_col).first()[0])
    planes = _hyperplanes(dim, bits, seed)
    corpus = df.select(
        F.col(id_col).alias("_cid"),
        F.col(emb_col).alias("_cemb"),
        hyperplane_bucket(F.col(emb_col), planes).alias("bucket"),
        _norm(F.col(emb_col)).alias("_cn"),
    )
    qbucket = hyperplane_bucket(F.col(q_emb_col), planes)
    probes = [qbucket] + (
        [
            qbucket.bitwiseXOR(F.lit(1 << i)).cast("int")
            for i in range(bits)
        ]
        if multiprobe
        else []
    )
    qside = queries.select(
        F.col(q_id_col).alias("query_id"),
        F.col(q_emb_col).alias("_qemb"),
        F.explode(F.array(*[p.cast("int") for p in probes])).alias("bucket"),
        _norm(F.col(q_emb_col)).alias("_qn"),
    )
    cos = _cosine_or_null(
        _dot(F.col("_qemb"), F.col("_cemb")), F.col("_qn") * F.col("_cn")
    )
    scored = qside.join(corpus, "bucket").select(
        "query_id",
        F.col("_cid").alias(id_col),
        F.round(cos, 6).alias("cosine"),
    )
    # a probe set can reach the same candidate through several buckets
    scored = scored.dropDuplicates(["query_id", id_col])
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
    )


def cosine_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "query_id",
    q_emb_col: str = "query_embedding",
) -> DataFrame:
    """Exact top-k per query over a query TABLE — the brute-force
    baseline of ``lsh_topk_batch`` (full cross product + ranking window;
    quadratic, for ground-truth/recall measurement on samples)."""
    from pyspark.sql import Window

    corpus = df.select(
        F.col(id_col).alias("_cid"),
        F.col(emb_col).alias("_cemb"),
        _norm(F.col(emb_col)).alias("_cn"),
    )
    qside = queries.select(
        F.col(q_id_col).alias("query_id"),
        F.col(q_emb_col).alias("_qemb"),
        _norm(F.col(q_emb_col)).alias("_qn"),
    )
    cos = _cosine_or_null(
        _dot(F.col("_qemb"), F.col("_cemb")), F.col("_qn") * F.col("_cn")
    )
    scored = qside.crossJoin(corpus).select(
        "query_id",
        F.col("_cid").alias(id_col),
        F.round(cos, 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .drop("rank")
    )


def exact_near_duplicate_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs with cosine >= threshold, exact (id_a < id_b).

    The brute-force baseline that ``embedding_near_duplicates`` (LSH)
    approximates: every pair is evaluated, so recall is 1.0 by
    construction and the output is the ground truth for tuning
    ``bits``/``threshold`` on a sample. Quadratic in corpus size —
    run it on samples / small partitions, never the full 100 TB corpus;
    norms are precomputed per side so each pair costs one dot product.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(emb_col).alias("_emb"),
        _norm(F.col(emb_col)).alias("_n"),
    )
    a = base.select(
        F.col("_id").alias("id_a"),
        F.col("_emb").alias("_emb_a"),
        F.col("_n").alias("_n_a"),
    )
    b = base.select(
        F.col("_id").alias("id_b"),
        F.col("_emb").alias("_emb_b"),
        F.col("_n").alias("_n_b"),
    )
    cos = _cosine_or_null(
        _dot(F.col("_emb_a"), F.col("_emb_b")), F.col("_n_a") * F.col("_n_b")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .withColumn("cosine", F.round("cosine", 6))
    )


def quantize_embeddings(
    df: DataFrame, emb_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column.

    ``scale = max|x| / 127``; each component maps to
    ``floor(x / scale + 0.5)`` — floor (not round) so the result is
    deterministic across engines (no half-even/half-up ambiguity). At
    100 TB the int8 column is 4x fewer bytes than float32 through every
    shuffle and scan; dot products on int8 stay exact in int64, and the
    per-vector scale reconstructs approximate float scores.

    All JVM higher-order array expressions — map-only, no Python.
    Zero vectors quantize to all-zero with scale 0.
    """
    x = F.col(emb_col)
    absmax = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    scale = absmax / F.lit(127.0)
    q = F.when(
        absmax > 0,
        F.transform(
            x,
            lambda v: F.floor(v.cast("double") / scale + F.lit(0.5)).cast(
                "tinyint"
            ),
        ),
    ).otherwise(F.transform(x, lambda v: F.lit(0).cast("tinyint")))
    return df.select(
        F.col(id_col),
        scale.alias("q_scale"),
        q.alias("q_embedding"),
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) approximate nearest neighbor
# --------------------------------------------------------------------------


def _normalized_sample(
    df: DataFrame, emb_col: str, sample_size: int, seed: int
) -> np.ndarray:
    """Seeded, limit-bounded driver-side sample, L2-normalized — the
    shared training input for every sample-trained index (IVF coarse
    quantizer, PQ codebooks). NULL/empty embeddings are filtered before
    the sample (a lake WILL have them; on a clean corpus the filter is
    a no-op and the seeded sample is unchanged)."""
    rows = (
        df.select(emb_col)
        .where(F.col(emb_col).isNotNull() & (F.size(emb_col) > 0))
        .sample(fraction=1.0, seed=seed)
        .limit(sample_size)
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def _ivf_probes(
    query_vec: list[float], centroids: np.ndarray, nprobe: int
) -> list[int]:
    """The ``nprobe`` cells nearest the normalized query — shared by the
    plain-IVF and IVF+PQ search paths."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    cent = np.asarray(centroids, dtype=np.float64)
    return [int(c) for c in (cent @ q).argsort()[::-1][:nprobe]]


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 64,
    emb_col: str = "embedding",
    sample_size: int = 20000,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer: k-means (Lloyd) on a driver-side sample.

    IVF training is sample-based by design — at 100 TB the index is
    trained on ~10^4-10^5 sampled vectors, never the corpus. The sample
    arrives through one seeded, limit-bounded collect; Lloyd runs in
    numpy on the driver (k * dim floats, trivially small), and the
    centroid matrix broadcasts to executors inside the assignment UDF.
    """
    X = _normalized_sample(df, emb_col, sample_size, seed)
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ cent.T  # cosine on normalized vectors
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def with_ivf_cell(
    df: DataFrame, centroids: np.ndarray, emb_col: str = "embedding"
) -> DataFrame:
    """Assign each vector to its nearest coarse centroid (Arrow-batched
    matrix multiply — one gemm per batch, no per-row Python)."""
    from pyspark.sql.functions import pandas_udf

    cent = np.asarray(centroids, dtype=np.float64)

    def assign(series):
        import pandas as pd

        X = np.array(list(series), dtype=np.float64)
        if X.size == 0:
            return pd.Series([], dtype="int32")
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series((X @ cent.T).argmax(axis=1).astype(np.int32))

    cell = pandas_udf(assign, "int")
    return df.withColumn("ivf_cell", cell(F.col(emb_col)))


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: probe the ``nprobe`` nearest cells, exact cosine within.

    With the corpus written partitioned/bucketed by ``ivf_cell`` the
    ``isin`` compiles to partition pruning and the scan touches
    ~nprobe/n_centroids of the data; on an unpartitioned layout it is
    still a pushed-down dictionary filter.
    """
    probes = _ivf_probes(query_vec, centroids, nprobe)
    indexed = (
        df
        if "ivf_cell" in df.columns
        else with_ivf_cell(df, centroids, emb_col)
    )
    pruned = indexed.where(F.col("ivf_cell").isin(probes))
    return (
        cosine_scores(pruned, query_vec, emb_col, id_col)
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# semantic deduplication (SemDeDup)
# --------------------------------------------------------------------------


def semantic_dedup(
    df: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style survivors: cluster, then drop in-cluster near-twins.

    The public SemDeDup recipe (Abbas et al., arXiv:2303.09540): k-means
    the embedding space (the sample-trained ``train_ivf_centroids``
    quantizer — at 100 TB the clustering IS the scale lever: pairwise
    cosine runs only WITHIN a cluster, never across the corpus), then
    inside each cluster drop every vector that has a lower-id neighbor
    with cosine >= threshold; the lowest id of each near-twin group
    survives deterministically.

    The pair stage groups the once-normalized vector relation by
    cluster and runs one blocked numpy gemm per cluster inside an
    Arrow-batched ``applyInPandas`` (guide §4.2: the former cluster-
    keyed SQL self-join evaluated an interpreted ``aggregate(zip_with)``
    dot per pair — 2073 executor-CPU-seconds for ~50M pairs at the sf10
    lane, ~70% of the composed pipeline's executor time — where the
    per-cluster gemm is one BLAS call per column block; it also ships
    every row ONCE instead of once per join side, §2.3). The kernel
    replicates the SQL pair rule exactly: pairs are compared with
    ``NOT (sim < threshold)`` so a NaN cosine drops the higher id just
    as Spark's NaN-is-largest ordering did; rows whose normalized
    vector carries a NULL element are flagged JVM-side (``_bad``) and
    excluded as both dropper and droppee (their SQL dot was NULL);
    cross-dimension pairs are skipped (zip_with padded with NULLs →
    NULL dot). Cluster count should scale with corpus size
    (k ~ n / target_cluster_size) to bound the per-cluster quadratic
    verify — a single runaway cluster is quadratic work under either
    kernel; the column-blocked gemm bounds its memory. Zero-norm
    vectors have no cosine and pass through as survivors untouched.
    """
    import pandas as pd

    from .dedup import _eager

    # the k-means assignment (a pandas-UDF gemm over every embedding)
    # feeds both the pair stage and the survivor anti-join — persist
    # it; the eager result checkpoint below is the release point (same
    # cache discipline as the dedup operators)
    assigned = with_ivf_cell(df, centroids, emb_col).select(
        F.col(id_col).alias("_id"),
        F.col(emb_col).alias("_emb"),
        F.col("ivf_cell").alias("_cluster"),
        _norm(F.col(emb_col)).alias("_n"),
    ).persist()
    try:
        normed = assigned.where(F.col("_n") > 0).select(
            "_id",
            "_cluster",
            F.transform(
                "_emb", lambda x: x.cast("double") / F.col("_n")
            ).alias("_u"),
            # an element of _u is NULL iff the _emb element is NULL
            # (the _n > 0 filter guarantees a non-null divisor)
            F.exists("_emb", lambda x: x.isNull()).alias("_bad"),
        )
        thr = float(threshold)

        def _cluster_dropped(pdf: "pd.DataFrame") -> "pd.DataFrame":
            ids = pdf["_id"].to_numpy()
            good = ~pdf["_bad"].to_numpy(dtype=bool)
            us = pdf["_u"].to_numpy()
            lens = np.fromiter(
                (len(u) for u in us), dtype=np.int64, count=len(us)
            )
            out = []
            for dim in np.unique(lens[good]) if good.any() else []:
                sel = np.flatnonzero(good & (lens == dim))
                if len(sel) < 2 or dim == 0:
                    continue
                order = np.argsort(ids[sel])
                sub_ids = ids[sel][order]
                U = np.stack(
                    [np.asarray(us[i], np.float64) for i in sel[order]]
                )
                n = len(sub_ids)
                drop = np.zeros(n, dtype=bool)
                blk = max(1, 4_000_000 // n)  # ≤ ~32 MB sims per block
                for j0 in range(1, n, blk):
                    j1 = min(j0 + blk, n)
                    sims = U[:j1] @ U[j0:j1].T
                    lower = (
                        np.arange(j1)[:, None] < np.arange(j0, j1)[None, :]
                    )
                    # NOT (sim < thr): NaN counts as a hit, matching
                    # Spark's NaN-is-largest comparison on the old path
                    drop[j0:j1] = (~(sims < thr) & lower).any(axis=0)
                out.append(sub_ids[drop])
            vals = np.concatenate(out) if out else np.array([], ids.dtype)
            return pd.DataFrame({"_dropped": vals})

        id_type = df.schema[id_col].dataType.simpleString()
        dropped = normed.groupBy("_cluster").applyInPandas(
            _cluster_dropped, f"_dropped {id_type}"
        )
        return _eager(
            assigned.join(
                dropped, assigned._id == dropped._dropped, "left_anti"
            ).select(
                F.col("_id").alias(id_col),
                F.col("_cluster").alias("cluster"),
            )
        )
    finally:
        assigned.unpersist()


# --------------------------------------------------------------------------
# product quantization (PQ) — compressed-domain ANN
# --------------------------------------------------------------------------

def train_pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    emb_col: str = "embedding",
    sample_size: int = 20000,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace codebooks for product quantization (Jégou et al.
    2011, "Product Quantization for Nearest Neighbor Search" — public).

    The embedding is split into ``m`` contiguous subvectors; each
    subspace gets its own ``k``-centroid k-means codebook, trained on a
    seeded, limit-bounded driver-side sample exactly like the IVF coarse
    quantizer (sample-based by design: at 100 TB the codebooks train on
    ~10^4-10^5 vectors, never the corpus). Vectors are L2-normalized
    first so ADC inner products approximate cosine. Returns an
    ``(m, k, dim/m)`` float64 array, small enough to ride into executor
    closures as a broadcast literal.
    """
    X = _normalized_sample(df, emb_col, sample_size, seed)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        cent = S[rng.choice(len(S), size=min(k, len(S)), replace=False)]
        for _ in range(iters):
            # squared L2 assignment via the expansion trick
            d2 = (
                (S * S).sum(axis=1, keepdims=True)
                - 2.0 * (S @ cent.T)
                + (cent * cent).sum(axis=1)
            )
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = S[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        if len(cent) < k:  # degenerate tiny sample: pad by repetition
            cent = np.vstack([cent] * (k // len(cent) + 1))[:k]
        books[j] = cent
    return books


def with_pq_code(
    df: DataFrame, codebooks: np.ndarray, emb_col: str = "embedding"
) -> DataFrame:
    """Append ``pq_code`` (array<tinyint>, or array<smallint> when the
    codebooks have more than 128 centroids, length m): nearest centroid
    id per subspace of the L2-normalized vector.

    The kernel is one Arrow-batched numpy ``pandas_udf`` — a reshape +
    batched argmin over (batch, m, k) distances; the (m, k, dsub)
    codebook tensor is serialized once per executor inside the closure.
    Map-only: the coded column is 64x smaller than a float32 dim-64
    embedding, which is the whole point at 100 TB — downstream scans
    read m (or 2m) bytes per vector instead of 4*dim. The element type
    widens with k so a standard k=256 codebook can never silently wrap
    a code negative (int8 would turn code 200 into -56 and ADC would
    index the LUT from the wrong end).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, k, dsub = books.shape
    code_np = np.int8 if k <= 128 else np.int16
    code_sql = "array<tinyint>" if k <= 128 else "array<smallint>"
    cnorm2 = (books * books).sum(axis=2)  # (m, k)

    def encode(embs):
        X = np.array(embs.tolist(), dtype=np.float64)
        if X.size == 0:
            return pd.Series([], dtype=object)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        S = X.reshape(len(X), m, dsub)
        # (n, m, k) squared distances; ||s||^2 constant per argmin -> skip
        dots = np.einsum("nmd,mkd->nmk", S, books)
        codes = (cnorm2[None, :, :] - 2.0 * dots).argmin(axis=2)
        return pd.Series(list(codes.astype(code_np)))

    return df.withColumn(
        "pq_code", pandas_udf(encode, code_sql)(F.col(emb_col))
    )


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    shortlist: int = 100,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ search: ADC shortlist in the compressed domain, exact rerank.

    Asymmetric distance computation: the query's per-subspace inner
    products with every centroid form an (m, k) lookup table, embedded
    as a LITERAL nested-array column — so the shortlist scan is pure JVM
    expression work over the tinyint codes (no Python, no join, no
    shuffle beyond the top-``shortlist``). The shortlist then reranks
    with the exact cosine on the original embedding column (carried
    through the scan), so returned scores are bit-identical to the
    brute-force baseline — approximate recall, exact scores.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    books = np.asarray(codebooks, dtype=np.float64)
    m, kk, dsub = books.shape
    lut = np.einsum("md,mkd->mk", q.reshape(m, dsub), books)
    lut_col = F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in lut]
    )
    coded = df if "pq_code" in df.columns else with_pq_code(df, books, emb_col)
    adc = coded.withColumn(
        "_adc",
        sum(
            F.element_at(
                F.element_at(lut_col, j + 1),
                F.col("pq_code")[j].cast("int") + 1,
            )
            for j in range(m)
        ),
    )
    short = adc.orderBy(F.desc("_adc"), F.col(id_col)).limit(shortlist)
    return (
        cosine_scores(short, query_vec, emb_col, id_col)
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def ivfpq_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 100,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF + PQ composed — the standard billion-vector serving layout
    (FAISS's IVFPQ index family, public): the coarse quantizer prunes
    the scan to ``nprobe`` cells (partition pruning when the corpus is
    written partitioned by ``ivf_cell``), the PQ codes are ADC-scored
    inside the surviving cells with a literal lookup table (pure JVM
    over tinyint codes), and the exact-cosine rerank touches only the
    shortlist. Scan cost ~ nprobe/n_centroids of the corpus reading m
    bytes per vector; exactness of returned scores comes from the
    rerank, recall from (nprobe, shortlist) — each independently
    tunable.

    Accepts a corpus already carrying ``ivf_cell``/``pq_code`` columns
    (the precomputed-index layout) and computes them on the fly
    otherwise.
    """
    probes = _ivf_probes(query_vec, centroids, nprobe)
    indexed = (
        df if "ivf_cell" in df.columns else with_ivf_cell(df, centroids, emb_col)
    )
    pruned = indexed.where(F.col("ivf_cell").isin(probes))
    return pq_topk(
        pruned,
        query_vec,
        codebooks,
        k=k,
        shortlist=shortlist,
        emb_col=emb_col,
        id_col=id_col,
    )


def _gram_partials(
    df: DataFrame, emb_col: str, normalize: bool
) -> DataFrame:
    """The distributed half of :func:`gram_matrix`: ONE ``(n, g)`` row
    per input partition (the accumulator spans the partition's whole
    Arrow batch iterator), so collecting it is partition-count-bounded
    no matter how the corpus splits into record batches."""
    import pandas as pd

    def partials(batches):
        acc = None
        n_rows = 0
        for pdf in batches:
            rows = [
                np.asarray(v, dtype=np.float64)
                for v in pdf[emb_col]
                if v is not None and len(v)
            ]
            if not rows:
                continue
            X = np.stack(rows)
            if normalize:
                X = X / np.maximum(
                    np.linalg.norm(X, axis=1, keepdims=True), 1e-12
                )
            g = X.T @ X
            acc = g if acc is None else acc + g
            n_rows += len(X)
        if acc is not None:
            yield pd.DataFrame(
                {"n": [n_rows], "g": [acc.ravel().tolist()]}
            )

    return df.select(emb_col).mapInPandas(
        partials, "n long, g array<double>"
    )


def gram_matrix(
    df: DataFrame, emb_col: str = "embedding", normalize: bool = True
) -> tuple[np.ndarray, int]:
    """Exact FULL-CORPUS second-moment matrix ``X'X / n`` in one
    distributed pass — deliberately NOT the seeded sample the IVF/PQ
    trainers use: a dim x dim Gram is O(dim^2) floats per partition
    regardless of corpus size, so at 100 TB the exact matrix is one
    map pass + a tiny reduce, and the PCA built on it is exact rather
    than sample-approximate.

    Kernel: Arrow-batched ``mapInPandas`` accumulates ONE flattened
    partial Gram (plus its row count) across the partition's whole
    record-batch iterator and yields a single row per partition, so
    the driver-side second level of the tree aggregate sums a
    partition-count-bounded relation — NOT one row per Arrow batch,
    which would make the collect corpus-bounded (rows /
    maxRecordsPerBatch) and OOM the driver at lake scale. NULL and
    zero-length embeddings are skipped. Returns ``(gram, n_rows)``.
    """
    parts = _gram_partials(df, emb_col, normalize).collect()
    if not parts:
        raise ValueError("no non-empty embeddings to aggregate")
    n = sum(int(r["n"]) for r in parts)
    dim = int(round(len(parts[0]["g"]) ** 0.5))
    gram = np.zeros((dim, dim), dtype=np.float64)
    for r in parts:
        gram += np.asarray(r["g"], dtype=np.float64).reshape(dim, dim)
    return gram / n, n


def train_pca(
    df: DataFrame,
    d_out: int,
    emb_col: str = "embedding",
    normalize: bool = True,
) -> dict:
    """Exact PCA of the (optionally L2-normalized) embedding corpus:
    eigendecomposition of the distributed full-corpus Gram (driver-side
    ``eigh`` on the dim x dim matrix — trivial next to the scan), top
    ``d_out`` components by eigenvalue. Un-centered by design so the
    projection preserves cosine geometry (the same convention as every
    trainer in this module); pass vectors through your own centering
    first if you want covariance PCA.

    Returns a JSON-serializable model dict ``{"components": d_out x dim,
    "explained_variance": [...], "input_dim": dim, "normalize": bool}``.
    By the Eckart-Young/Rayleigh argument this is the orthonormal rank-
    ``d_out`` projection with minimal mean reconstruction error — the
    claim the catalog row asserts against a raw-dimension truncation.
    """
    gram, _ = gram_matrix(df, emb_col, normalize)
    dim = gram.shape[0]
    if not 1 <= d_out <= dim:
        raise ValueError(f"d_out={d_out} must be in [1, {dim}]")
    evals, evecs = np.linalg.eigh(gram)
    order = np.argsort(evals)[::-1][:d_out]
    return {
        "components": [evecs[:, i].tolist() for i in order],
        "explained_variance": [float(evals[i]) for i in order],
        "input_dim": dim,
        "normalize": bool(normalize),
    }


def project_embeddings(
    df: DataFrame,
    model: dict,
    emb_col: str = "embedding",
    out_col: str = "embedding_pca",
) -> DataFrame:
    """Map-only PCA projection: ``out = P @ x`` per vector, Arrow-batched
    matmul with the (d_out x dim) component matrix riding in the UDF
    closure. NULL/empty embeddings project to NULL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(model["components"], dtype=np.float64)
    normalize = bool(model.get("normalize", True))

    def proj(embs):
        out = []
        for v in embs:
            if v is None or not len(v):
                out.append(None)
                continue
            x = np.asarray(v, dtype=np.float64)
            if normalize:
                x = x / max(np.linalg.norm(x), 1e-12)
            out.append((P @ x).astype(np.float32).tolist())
        return pd.Series(out)

    return df.withColumn(
        out_col, pandas_udf(proj, "array<float>")(F.col(emb_col))
    )


def projection_mse(
    df: DataFrame,
    components: np.ndarray,
    emb_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Mean reconstruction error of an ORTHONORMAL projection over the
    corpus, as one map-only aggregate: by Parseval,
    ``||x - P'Px||^2 = ||x||^2 - ||Px||^2``, so no reconstruction is
    ever materialized — the kernel computes both norms per vector in
    one Arrow batch. Returns a 1-row ``(n_vecs, mse)`` DataFrame."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(components, dtype=np.float64)

    def err(embs):
        out = []
        for v in embs:
            if v is None or not len(v):
                out.append(None)
                continue
            x = np.asarray(v, dtype=np.float64)
            if normalize:
                x = x / max(np.linalg.norm(x), 1e-12)
            out.append(float(x @ x - ((P @ x) ** 2).sum()))
        return pd.Series(out, dtype="float64")

    e = df.select(pandas_udf(err, "double")(F.col(emb_col)).alias("_e"))
    return e.where(F.col("_e").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.round(F.avg("_e"), 6).alias("mse"),
    )


# --------------------------------------------------------------------------
# prototypicality pruning (embedding-space data selection)
# --------------------------------------------------------------------------


def prototypicality(
    df: DataFrame,
    centroids: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-example PROTOTYPICALITY (Sorscher et al. 2022, "Beyond
    neural scaling laws: beating power law scaling via data pruning",
    NeurIPS, public): assign each (L2-normalized) embedding to its
    nearest k-means prototype and score it by the cosine to that
    prototype — high ``proto_sim`` = close to the cluster center
    (easy/redundant under their self-supervised metric), low = far
    (hard/informative). Returns ``(id, ivf_cell, proto_sim)``; NULL and
    zero-length embeddings are dropped.

    One Arrow gemm per batch computes the argmax cell AND its
    similarity together (no second assignment pass — contrast
    ``with_ivf_cell``, which only needs the cell); the centroid matrix
    rides the UDF closure, k x dim floats. Map-only at any corpus
    size.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cent = np.asarray(centroids, dtype=np.float64)

    def score(it):
        for pdf in it:
            embs = pdf[emb_col]
            keep = [
                i for i, v in enumerate(embs)
                if v is not None and len(v)
            ]
            out = pd.DataFrame(
                {"ivf_cell": pd.Series(dtype="int32"),
                 "proto_sim": pd.Series(dtype="float64"),
                 "_keep": pd.Series(dtype="int64")}
            )
            if keep:
                X = np.array(
                    [np.asarray(embs.iloc[i], np.float64) for i in keep]
                )
                X = X / np.maximum(
                    np.linalg.norm(X, axis=1, keepdims=True), 1e-12
                )
                sims = X @ cent.T
                cells = sims.argmax(axis=1)
                out = pd.DataFrame({
                    "ivf_cell": cells.astype(np.int32),
                    "proto_sim": np.round(
                        sims[np.arange(len(cells)), cells], 6
                    ),
                    "_keep": np.asarray(keep, np.int64),
                })
            out["_id"] = pdf["_id"].iloc[out["_keep"]].values if len(out) else []
            yield out[["_id", "ivf_cell", "proto_sim"]]

    assigned = (
        df.select(F.col(id_col).alias("_id"), emb_col)
        .mapInPandas(
            score,
            f"_id {df.schema[id_col].dataType.simpleString()}, "
            "ivf_cell int, proto_sim double",
        )
    )
    return assigned.select(
        F.col("_id").alias(id_col), "ivf_cell", "proto_sim"
    )


def prune_prototypes(
    df: DataFrame,
    centroids: np.ndarray,
    keep_frac: float,
    mode: str = "hard",
    exact: bool = False,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    scored: DataFrame | None = None,
) -> DataFrame:
    """Density-based data pruning over embeddings (Sorscher et al.
    2022): keep the ``keep_frac`` HARDEST (lowest ``proto_sim``,
    ``mode='hard'`` — their recipe for large datasets) or EASIEST
    (``mode='easy'``, their small-data regime) fraction of every
    cluster. Per-cluster cuts preserve coverage of the embedding
    space; a global cut would empty whole clusters.

    Returns ``(id, ivf_cell, proto_sim)`` of the kept examples.

    Two physical strategies:

    - ``exact=False`` (default, the 100-TB path): per-cell
      ``percentile_approx`` threshold (one map-side-combinable
      aggregate over k cells) joined back broadcast, then a map-only
      filter — no per-cell total order anywhere. Kept count per cell
      is approximate within the sketch's rank error.
    - ``exact=True``: per-cell ``row_number`` window ordered by
      ``(proto_sim, id)`` — exact ``ceil(keep_frac * n_c)`` kept per
      cell, deterministic tie-break. A window partitioned by k cells
      concentrates the corpus onto k reducers, so this is for gate
      scale and claims, not the lake (the docstring the claims row
      leans on).
    """
    if not 0 < keep_frac <= 1:
        raise ValueError(f"keep_frac={keep_frac} must be in (0, 1]")
    if mode not in ("hard", "easy"):
        raise ValueError(f"mode must be 'hard' or 'easy', got {mode!r}")
    # Both strategies read the scored relation TWICE — once for the
    # per-cell threshold/count aggregate, once as the filter probe side.
    # The scorer is an Arrow gemm over every embedding (the operator's
    # dominant stage), so a lazy plan would run it twice (the round-14
    # double-compute seam). One pruned lazy localCheckpoint on the
    # 3-column scored relation materializes it on the aggregate job and
    # the probe side re-reads the blocks — the same one-barrier
    # discipline as the curation pipeline's scored relation; blocks are
    # released by the ContextCleaner when the result is dropped. The
    # aggregate (a broadcast-side query stage) and the probe run
    # CONCURRENTLY under AQE, so the checkpoint is populated first
    # (round-17 `_populated` discipline) — without it both stages
    # recompute the full gemm. A caller holding the scored relation
    # already (the claims rows score once and derive prune + expected
    # counts from the same relation) passes it via ``scored=`` and owns
    # its materialization; the values are identical by determinism of
    # ``prototypicality``.
    if scored is None:
        from .dedup import _populated

        scored = _populated(
            prototypicality(df, centroids, emb_col, id_col).localCheckpoint(
                eager=False
            )
        )
    asc = mode == "hard"
    if exact:
        from pyspark.sql import Window

        order = (
            [F.asc("proto_sim"), F.asc(id_col)]
            if asc
            else [F.desc("proto_sim"), F.asc(id_col)]
        )
        w = Window.partitionBy("ivf_cell").orderBy(*order)
        counts = scored.groupBy("ivf_cell").agg(
            F.count(F.lit(1)).alias("_n")
        )
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .join(F.broadcast(counts), "ivf_cell")
            .where(
                F.col("_rn")
                <= F.ceil(F.col("_n") * F.lit(float(keep_frac)))
            )
            .select(id_col, "ivf_cell", "proto_sim")
        )
    q = keep_frac if asc else 1.0 - keep_frac
    thr = scored.groupBy("ivf_cell").agg(
        F.percentile_approx("proto_sim", q, 10000).alias("_thr")
    )
    keep = (
        F.col("proto_sim") <= F.col("_thr")
        if asc
        else F.col("proto_sim") >= F.col("_thr")
    )
    return (
        scored.join(F.broadcast(thr), "ivf_cell")
        .where(keep)
        .select(id_col, "ivf_cell", "proto_sim")
    )
