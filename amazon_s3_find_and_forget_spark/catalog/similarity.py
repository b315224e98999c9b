"""Similarity-search and multimodal catalog rows.

Cosine/top-k, LSH/IVF/PQ/IVF+PQ ANN with recall gates, embedding
near-dup, quantization, and the multimodal feature/frame rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import multimodal, similarity
from .loader import _summary_row, load


def q_similarity_cosine(spark, sf_dir):
    embs = load(spark, sf_dir, "embeddings")
    qvec = embs.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    return similarity.cosine_scores(embs, [float(v) for v in qvec])


def q_embedding_near_dups(spark, sf_dir):
    embs = load(spark, sf_dir, "embeddings")
    dim = len(embs.limit(1).collect()[0]["embedding"])
    # the synthetic embeddings' closest pair sits ~0.51 cosine; 0.4 with
    # coarse buckets exercises the candidate-gen + verify path end-to-end
    return similarity.embedding_near_duplicates(embs, dim=dim, threshold=0.4, bits=4)



def q_embedding_incremental_complete(spark, sf_dir):
    """Incremental embedding near-dup screening quality (gate check).

    The screen (operators/incremental.py::incremental_embedding_dedup)
    drops an arriving vector only after an EXACT cosine verify against
    an LSH-colliding partner, so two deterministic claims hold under
    any seed: sound — every dropped arriving vector has a true-cosine
    partner >= threshold in the history or among smaller-id arrivals
    (checked against the brute-force pair set, independent of the LSH
    that proposed it); exact_complete — an arriving vector IDENTICAL to
    an indexed or smaller-id arriving one collides in every table and
    verifies at cosine 1.0, so it is always dropped. Sample-bounded
    (vec_id < 1000: the whole corpus at gate scale)."""
    from ..operators import incremental as inc

    embs = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 1000)
    hist = embs.where(F.col("vec_id") % 3 != 0)
    arriving = embs.where(F.col("vec_id") % 3 == 0)
    n_arriving = arriving.count()
    dim = len(embs.limit(1).collect()[0]["embedding"])
    index = inc.embedding_index(hist, dim=dim, bits=4)
    novel, _ = inc.incremental_embedding_dedup(
        arriving, index, dim=dim, threshold=0.4, bits=4
    )
    novel_ids = {r[0] for r in novel.select("vec_id").collect()}
    arr_ids = {r[0] for r in arriving.select("vec_id").collect()}
    dropped = arr_ids - novel_ids

    pairs = similarity.exact_near_duplicate_pairs(
        embs, threshold=0.4
    ).select("id_a", "id_b").collect()
    witnesses = {}
    for r in pairs:
        a, b = r["id_a"], r["id_b"]
        for x, y in ((a, b), (b, a)):
            # y is the screened side; x qualifies as its witness if x is
            # history or an earlier arrival
            if y % 3 == 0 and (x % 3 != 0 or x < y):
                witnesses.setdefault(y, set()).add(x)
    sound = all(d in witnesses for d in dropped)

    rows = embs.select("vec_id", "embedding").collect()
    by_vec = {}
    for r in rows:
        by_vec.setdefault(tuple(r["embedding"]), []).append(r["vec_id"])
    exact_complete = True
    for vec, ids in by_vec.items():
        if not any(vec):  # zero-norm vectors have no cosine: the screen
            continue  # documents them as pass-through-novel, not dups
        ids.sort()
        for d in ids[1:]:
            if d % 3 == 0 and any(
                x % 3 != 0 or x < d for x in ids if x != d
            ):
                exact_complete = exact_complete and (d in dropped)
    return _summary_row(
        spark,
        n_arriving=n_arriving,
        sound=sound,
        exact_complete=exact_complete,
    )


def q_similarity_batch_topk(spark, sf_dir):
    embs = load(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    return similarity.lsh_topk_batch(embs, queries, k=5, bits=4)


def q_similarity_batch_topk_exact(spark, sf_dir):
    embs = load(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    return similarity.cosine_topk_batch(embs, queries, k=5)


def q_embedding_near_dups_exact(spark, sf_dir):
    # the brute-force ground truth for the LSH variant above; DuckDB can
    # express it exactly, so this one is oracle-checked
    return similarity.exact_near_duplicate_pairs(
        load(spark, sf_dir, "embeddings"), threshold=0.4
    )


def q_similarity_quantize(spark, sf_dir):
    """Int8 quantization parity: integer sums over the quantized vectors
    are exact, so the driver hash-checks the quantizer bit-for-bit."""
    embs = load(spark, sf_dir, "embeddings")
    q = similarity.quantize_embeddings(embs)
    qe = F.col("q_embedding")
    return q.select(
        "vec_id",
        F.col("q_scale"),
        F.aggregate(
            qe, F.lit(0).cast("long"), lambda acc, v: acc + v.cast("long")
        ).alias("q_sum"),
        F.aggregate(
            qe,
            F.lit(0).cast("long"),
            lambda acc, v: acc + v.cast("long") * v.cast("long"),
        ).alias("q_l2"),
    )


def q_multimodal_features(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("content_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )
    return multimodal.extract_features(media).select(
        "media_id", "kind", "payload_sha256", "payload_bytes"
    )


def q_similarity_topk(spark, sf_dir):
    embs = load(spark, sf_dir, "embeddings")
    qvec = embs.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    scores = similarity.cosine_scores(embs, [float(v) for v in qvec])
    return scores.orderBy(F.desc("cosine"), F.col("vec_id")).limit(25)


def q_similarity_ivf_topk(spark, sf_dir):
    """IVF scale path: coarse quantizer + nprobe cell scan (approximate)."""
    embs = load(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in embs.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    cent = similarity.train_ivf_centroids(embs, n_centroids=16, sample_size=2000)
    return similarity.ivf_topk(embs, qvec, cent, k=10, nprobe=4)


def q_similarity_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH scale path with hamming-1 multiprobe (approximate)."""
    embs = load(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in embs.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return similarity.lsh_topk(embs, qvec, k=10, bits=6)


def q_multimodal_frame_sample(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("video/mp4").alias("content_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    ).where(F.col("media_id") < 50)
    return multimodal.frame_sample(media, every_ms=1000)


def _topk_quality(approx_df, exact_df, all_scores_df, id_col="vec_id"):
    """(recall, scores_match) of an approximate top-k vs the exact one.

    ``scores_match`` is the DETERMINISTIC half of the check: every
    approximate hit's cosine must EQUAL the brute-force cosine for that
    id (round-6 on both sides) — the pruned plan and the map-only plan
    must score identically. Recall is the statistical half; gate
    thresholds sit at ~2x margin under the measured value on the
    synthetic distribution, so they hold across data regenerations.
    """
    appr = {r[id_col]: r["cosine"] for r in approx_df.collect()}
    exact_ids = [r[id_col] for r in exact_df.collect()]
    truth = {
        r[id_col]: r["cosine"]
        for r in all_scores_df.where(
            F.col(id_col).isin(list(appr))
        ).collect()
    }
    recall = len(set(appr).intersection(exact_ids)) / max(len(exact_ids), 1)
    scores_match = all(truth.get(i) == c for i, c in appr.items())
    return recall, scores_match


def q_similarity_lsh_recall(spark, sf_dir):
    """Hyperplane-LSH top-k quality vs the exact scan (gate check).

    Single-table 6-bit LSH with hamming-1 multiprobe scans ~11% of a
    near-uniform synthetic corpus, so its measured recall@10 is ~0.2 —
    the gate floor is 0.1 (sanity, 2x margin); the exact-score equality
    of every returned hit is the deterministic half of the check.
    """
    embs = load(spark, sf_dir, "embeddings")
    n_vecs = embs.count()
    qvec = [
        float(v)
        for v in embs.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    appr = similarity.lsh_topk(embs, qvec, k=10, bits=6)
    exact = similarity.cosine_topk(embs, qvec, k=10)
    recall, scores_match = _topk_quality(
        appr, exact, similarity.cosine_scores(embs, qvec)
    )
    return _summary_row(
        spark,
        n_vecs=n_vecs,
        recall_ok=(recall >= 0.1),
        scores_ok=scores_match,
    )


def q_similarity_ivf_recall(spark, sf_dir):
    """IVF top-k quality vs the exact scan (gate check).

    nprobe=8 of 16 cells. For a NEAR-UNIFORM corpus IVF recall is
    essentially the probed-cell fraction (the true neighbors of a
    random query spread across all cells), so the claim must be sized
    to that worst case, not to the clustered synthetic corpus: the
    round-11 adversarial soak measured recall@10 of 0.3 at the old
    nprobe=4 (vs 0.7-0.8 on clustered data), below the old 0.4 floor.
    At nprobe=8 the measured spread is 0.5 (near-uniform adversarial)
    to 0.8-0.9 (stock/clustered); the floor is 0.2 — the query's own
    cell is always probed (1 guaranteed hit of 10) and the remaining 9
    are ~Binomial(9, probed-fraction), putting 0.2 at ~3 sigma below
    the worst-case expectation, stable under any data seed. Exact
    score equality of every returned hit remains the deterministic
    half of the check.
    """
    embs = load(spark, sf_dir, "embeddings")
    n_vecs = embs.count()
    qvec = [
        float(v)
        for v in embs.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    cent = similarity.train_ivf_centroids(embs, n_centroids=16, sample_size=2000)
    appr = similarity.ivf_topk(embs, qvec, cent, k=10, nprobe=8)
    exact = similarity.cosine_topk(embs, qvec, k=10)
    recall, scores_match = _topk_quality(
        appr, exact, similarity.cosine_scores(embs, qvec)
    )
    return _summary_row(
        spark,
        n_vecs=n_vecs,
        recall_ok=(recall >= 0.2),
        scores_ok=scores_match,
    )


def q_similarity_pq_recall(spark, sf_dir):
    """Product-quantization ADC top-k quality vs the exact scan.

    m=8 subspaces x 16 centroids, ADC shortlist of 10% of the corpus
    (floor 200), exact-cosine rerank. The round-12 sf0.1 soak caught
    the original fixed shortlist=50 failing its own 0.4 floor on the
    sf0.1 embedding distribution (recall 0.3 there vs 0.8 at sf0.01 —
    same corpus SIZE, harder content): a quality claim must carry
    parameters sized for the claim, not for one lucky corpus. Measured
    at shortlist=200: recall@10 = 1.0 (sf0.01) / 0.8 (sf0.1), floor 0.4
    = 2x margin on the worst measured point. Gate-scale corpora only —
    production shortlists are caller-chosen absolute sizes. The rerank
    recomputes true cosine on the shortlist, so every returned score
    must EQUAL the brute-force score (deterministic half of the check).
    """
    embs = load(spark, sf_dir, "embeddings")
    n_vecs = embs.count()
    qvec = [
        float(v)
        for v in embs.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    cb = similarity.train_pq_codebooks(embs, m=8, k=16, sample_size=2000)
    appr = similarity.pq_topk(
        embs, qvec, cb, k=10, shortlist=max(200, n_vecs // 10)
    )
    exact = similarity.cosine_topk(embs, qvec, k=10)
    recall, scores_match = _topk_quality(
        appr, exact, similarity.cosine_scores(embs, qvec)
    )
    return _summary_row(
        spark,
        n_vecs=n_vecs,
        recall_ok=(recall >= 0.4),
        scores_ok=scores_match,
    )


def q_similarity_pq_topk(spark, sf_dir):
    embs = load(spark, sf_dir, "embeddings")
    qvec = [
        float(v)
        for v in embs.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    cb = similarity.train_pq_codebooks(embs, m=8, k=16, sample_size=2000)
    return similarity.pq_topk(embs, qvec, cb, k=10, shortlist=50)


def q_similarity_ivfpq_recall(spark, sf_dir):
    """IVF+PQ composed search quality vs the exact scan.

    nprobe=8 of 16 cells + ADC shortlist=50 + exact rerank: measured
    recall@10 ~0.7 on the synthetic corpus, ~0.5 on a near-uniform
    adversarial one (recall degrades to the probed-cell fraction there
    — same sizing as q_similarity_ivf_recall, round-11 soak). Floor
    0.2: one hit is structural (the query's own cell + shortlist) and
    the rest is ~Binomial(9, probed-fraction), so 0.2 sits ~3 sigma
    under the worst-case expectation — stable across regenerations.
    Per-hit scores must equal brute force (rerank determinism), the
    deterministic half.
    """
    embs = load(spark, sf_dir, "embeddings")
    n_vecs = embs.count()
    qvec = [
        float(v)
        for v in embs.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    cent = similarity.train_ivf_centroids(embs, n_centroids=16, sample_size=2000)
    cb = similarity.train_pq_codebooks(embs, m=8, k=16, sample_size=2000)
    appr = similarity.ivfpq_topk(
        # shortlist as a corpus fraction (floor 50 = the original gate
        # value at sf0.01) — same scale-invariance fix as pq_recall
        embs, qvec, cent, cb, k=10, nprobe=8,
        shortlist=max(50, n_vecs // 40),
    )
    exact = similarity.cosine_topk(embs, qvec, k=10)
    recall, scores_match = _topk_quality(
        appr, exact, similarity.cosine_scores(embs, qvec)
    )
    return _summary_row(
        spark,
        n_vecs=n_vecs,
        recall_ok=(recall >= 0.2),
        scores_ok=scores_match,
    )


def q_similarity_batch_recall(spark, sf_dir):
    """Batched LSH top-k mean recall@5 vs the exact batch (gate check)."""
    embs = load(spark, sf_dir, "embeddings")
    n_vecs = embs.count()
    queries = embs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    appr = similarity.lsh_topk_batch(embs, queries, k=5, bits=4).select(
        "query_id", "vec_id"
    )
    exact = similarity.cosine_topk_batch(embs, queries, k=5).select(
        "query_id", "vec_id"
    )
    n_exact = exact.count()
    n_hit = exact.join(appr, ["query_id", "vec_id"], "left_semi").count()
    # measured mean recall ~0.64 on the synthetic corpus; floor 0.3
    return _summary_row(
        spark,
        n_vecs=n_vecs,
        recall_ok=(n_exact == 0 or n_hit / n_exact >= 0.3),
    )


def q_embedding_near_dups_recall(spark, sf_dir):
    """Embedding near-dup LSH quality vs the exact cross join (gate check).

    precision_ok is exact set containment (every candidate is verified
    with the true cosine, so LSH pairs must be a subset of the exact
    pairs — deterministic); recall_ok is >=50% of the exact pairs
    surfaced (measured ~0.75 on the synthetic corpus, 1.5x margin).
    The exact side is quadratic, so the corpus is sample-bounded
    (first 1000 ids — the whole corpus at gate scale).
    """
    embs = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 1000)
    n_vecs = embs.count()
    dim = len(embs.limit(1).collect()[0]["embedding"])
    lshp = similarity.embedding_near_duplicates(
        embs, dim=dim, threshold=0.4, bits=4
    ).select("id_a", "id_b")
    exact = similarity.exact_near_duplicate_pairs(embs, threshold=0.4).select(
        "id_a", "id_b"
    )
    n_exact = exact.count()
    n_hit = exact.join(lshp, ["id_a", "id_b"], "left_semi").count()
    spurious = lshp.exceptAll(exact).count()
    return _summary_row(
        spark,
        n_vecs=n_vecs,
        precision_ok=(spurious == 0),
        recall_ok=(n_exact == 0 or n_hit / n_exact >= 0.5),
    )


def q_similarity_pca_quality(spark, sf_dir):
    """Exact distributed PCA, gated by a THEOREM-backed claim: the
    top-32 eigenprojection's mean reconstruction error must beat a raw
    first-32-dimension truncation by >= 0.01 (Eckart-Young says PCA is
    the optimal orthonormal projection; measured margins 0.07-0.14 on
    the registry corpora, so the claim has both a proof and headroom).
    Orthonormality and eigenvalue ordering are asserted driver-side;
    n_vecs is exact and oracle-checked."""
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    model = similarity.train_pca(emb, 32)
    P = np.asarray(model["components"], dtype=np.float64)
    orth_ok = bool(
        np.abs(P @ P.T - np.eye(P.shape[0])).max() < 1e-8
    )
    ev = model["explained_variance"]
    ordered_ok = all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))
    trunc = np.eye(model["input_dim"])[:32]
    pca = similarity.projection_mse(emb, P).select(
        "n_vecs", F.col("mse").alias("_mse_pca")
    )
    raw = similarity.projection_mse(emb, trunc).select(
        F.col("mse").alias("_mse_trunc")
    )
    return pca.crossJoin(raw).select(
        "n_vecs",
        (F.col("_mse_pca") <= F.col("_mse_trunc") - 0.01).alias(
            "pca_better"
        ),
        F.lit(orth_ok).alias("orth_ok"),
        F.lit(ordered_ok).alias("var_ordered"),
    )


def q_similarity_prototype_prune(spark, sf_dir):
    """Density-based data pruning (Sorscher et al. 2022) gated by
    deterministic claims (the *_recall pattern — seeded k-means
    prototypes are engine-internal, so no SQL value oracle):

    - ``count_ok``: exact mode keeps EXACTLY sum over cells of
      ``ceil(0.5 * n_c)`` — the per-cluster cut is precise;
    - ``separation_ok``: within every cell, max(kept proto_sim) <=
      min(dropped proto_sim) — hard mode keeps the far-from-prototype
      examples and nothing else (ties may straddle, <= holds);
    - ``modes_ok``: mean proto_sim of the hard keep < mean of the easy
      keep — the two modes select opposite ends of the density axis;
    - ``approx_close_ok``: the percentile-threshold scale path keeps
      within 10% of the corpus of the exact count (sketch rank error
      at accuracy 10000 is far tighter; the band absorbs corpus
      regeneration).
    """
    embs = load(spark, sf_dir, "embeddings")
    cent = similarity.train_ivf_centroids(
        embs, n_centroids=8, sample_size=2000
    )
    scored = similarity.prototypicality(embs, cent).localCheckpoint(
        eager=False
    )
    n_vecs = scored.count()
    # one scoring pass: the populated scored relation above feeds the
    # hard/easy/approx prunes and the expected-count aggregate (the
    # internal prototypicality recompute per prune call was 3 more full
    # Arrow-gemm passes over the corpus — round-18, guide §1.2)
    hard = similarity.prune_prototypes(
        embs, cent, 0.5, mode="hard", exact=True, scored=scored
    ).localCheckpoint(eager=False)
    easy = similarity.prune_prototypes(
        embs, cent, 0.5, mode="easy", exact=True, scored=scored
    )
    # `or 0`: on a degenerate corpus (all-NULL/empty embeddings) the
    # sum aggregates over zero cells and returns None — the row must
    # report a claim over 0 expected, not die with a TypeError
    expected = int(
        scored.groupBy("ivf_cell")
        .agg(F.ceil(F.count(F.lit(1)) * 0.5).alias("_e"))
        .agg(F.sum("_e"))
        .collect()[0][0]
        or 0
    )
    n_hard = hard.count()
    # per-cell separation: join kept flags onto the scored relation
    flags = scored.join(
        hard.select("vec_id", F.lit(True).alias("_kept")),
        "vec_id",
        "left",
    )
    sep = (
        flags.groupBy("ivf_cell")
        .agg(
            F.max(F.when(F.col("_kept"), F.col("proto_sim"))).alias("_mk"),
            F.min(
                F.when(F.col("_kept").isNull(), F.col("proto_sim"))
            ).alias("_md"),
        )
        .agg(
            F.min(
                F.when(
                    F.col("_mk").isNull() | F.col("_md").isNull(), True
                ).otherwise(F.col("_mk") <= F.col("_md"))
            )
        )
        .collect()[0][0]
    )
    mean_hard = hard.agg(F.avg("proto_sim")).collect()[0][0]
    mean_easy = easy.agg(F.avg("proto_sim")).collect()[0][0]
    n_approx = similarity.prune_prototypes(
        embs, cent, 0.5, mode="hard", exact=False, scored=scored
    ).count()
    return _summary_row(
        spark,
        n_vecs=n_vecs,
        count_ok=(n_hard == expected),
        separation_ok=bool(sep),
        modes_ok=(mean_hard < mean_easy),
        approx_close_ok=(abs(n_approx - n_hard) <= max(1, n_vecs // 10)),
    )


def q_similarity_llm_pipeline(spark, sf_dir):
    """The embedding-side counterpart of ``text_llm_pipeline``: the
    composed pipeline an embedding-curation run actually executes —
    exact distributed PCA (64 -> 16, cosine-preserving) -> map-only
    projection -> prototypicality pruning (keep the hardest 60% of
    every cluster, exact mode at gate scale) -> SemDeDup on the pruned
    pool. Every stage is already gated alone
    (``similarity_pca_quality`` / ``similarity_prototype_prune`` /
    ``semantic_dedup_complete``); this row gates the COMPOSITION with
    deterministic claims (seeded trainers are engine-internal, so no
    SQL value oracle — the *_recall pattern):

    - ``prune_count_ok``: the pruned pool is exactly sum over cells of
      ``ceil(0.6 * n_c)`` of the projected corpus;
    - ``monotone_ok``: ``n_vecs >= n_pruned >= n_final >= 1`` — each
      stage only removes;
    - ``proj_dims_ok``: every projected vector has exactly 16 dims
      (SemDeDup's survivor relation carries ids + clusters only);
    - ``deterministic_ok``: a full second build returns the identical
      survivor id set (seeded k-means + exact PCA + hash-free rules —
      the whole chain is a pure function of the corpus).

    The cluster count SCALES with the corpus (k ~ n/500, floor 8 — so
    the gate corpora keep their original k=8 plan bit-for-bit): the
    SemDeDup pair stage is quadratic WITHIN a cluster, and a fixed k=8
    at the 200k-vector lane corpus means 25k-vector clusters — 312M
    in-cluster pairs, measured 790 s. k = n/500 caps clusters near the
    paper's operating point and the lane cell at ~50M pairs.
    """
    from concurrent.futures import ThreadPoolExecutor

    embs = load(spark, sf_dir, "embeddings")
    n_raw = embs.where(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    ).count()
    k = max(8, n_raw // 500)

    def build():
        model = similarity.train_pca(embs, 16)
        proj = similarity.project_embeddings(embs, model).select(
            "vec_id", F.col("embedding_pca").alias("embedding")
        ).where(F.col("embedding").isNotNull()).localCheckpoint(
            eager=False
        )
        cent = similarity.train_ivf_centroids(
            proj, n_centroids=k, sample_size=max(2000, 20 * k)
        )
        # score ONCE: the same scored relation feeds the prune (its
        # count aggregate + window probe) and the expected-count claim
        # below — the round-17 one-pass discipline; values identical
        # because prototypicality is a pure function of (proj, cent)
        scored = similarity.prototypicality(proj, cent).localCheckpoint(
            eager=False
        )
        scored.count()  # populate before concurrent consumers race it
        pruned = similarity.prune_prototypes(
            proj, cent, 0.6, mode="hard", exact=True, scored=scored
        )
        pool = proj.join(pruned.select("vec_id"), "vec_id")
        surv = similarity.semantic_dedup(pool, cent, threshold=0.92)
        return proj, cent, pruned, surv, scored

    # the determinism rebuild is a fully independent job chain — run it
    # on a driver thread so its stages back-fill the executor tail of
    # the first build's actions (guide §2.6); both builds compute the
    # same pure function of the corpus, so the claim is unchanged
    with ThreadPoolExecutor(max_workers=1) as pool_ex:
        fut2 = pool_ex.submit(
            lambda: {
                r["vec_id"] for r in build()[3].select("vec_id").collect()
            }
        )
        proj, cent, pruned, surv, scored = build()
        n_vecs = proj.count()
        n_pruned = pruned.count()
        surv_ids = {r["vec_id"] for r in surv.select("vec_id").collect()}
        # `or 0`: same degenerate-corpus guard as the prune row above
        expected = int(
            scored.groupBy("ivf_cell")
            .agg(F.ceil(F.count(F.lit(1)) * 0.6).alias("_e"))
            .agg(F.sum("_e"))
            .collect()[0][0]
            or 0
        )
        dims_ok = proj.where(F.size("embedding") != 16).count() == 0
        surv_ids2 = fut2.result()
    return _summary_row(
        spark,
        n_vecs=n_vecs,
        prune_count_ok=(n_pruned == expected),
        monotone_ok=(n_vecs >= n_pruned >= len(surv_ids) >= 1),
        proj_dims_ok=bool(dims_ok),
        deterministic_ok=(surv_ids == surv_ids2),
    )


QUERIES = {
    "embedding_near_dups_recall": q_embedding_near_dups_recall,
    "similarity_prototype_prune": q_similarity_prototype_prune,
    "similarity_llm_pipeline": q_similarity_llm_pipeline,
    "similarity_pca_quality": q_similarity_pca_quality,
    "embedding_incremental_complete": q_embedding_incremental_complete,
    "similarity_ivfpq_recall": q_similarity_ivfpq_recall,
    "similarity_cosine": q_similarity_cosine,
    "similarity_ivf_recall": q_similarity_ivf_recall,
    "similarity_lsh_recall": q_similarity_lsh_recall,
    "similarity_batch_recall": q_similarity_batch_recall,
    "similarity_pq_recall": q_similarity_pq_recall,
    "multimodal_features": q_multimodal_features,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "similarity_quantize": q_similarity_quantize,
    "similarity_topk": q_similarity_topk,
    "similarity_batch_topk_exact": q_similarity_batch_topk_exact,
    "embedding_near_dups_exact": q_embedding_near_dups_exact,
    "similarity_pq_topk": q_similarity_pq_topk,
    "similarity_ivf_topk": q_similarity_ivf_topk,
    "similarity_lsh_topk": q_similarity_lsh_topk,
    "similarity_batch_topk": q_similarity_batch_topk,
    "embedding_near_dups": q_embedding_near_dups,
}

ORACLES = {
    "similarity_prototype_prune": """
        SELECT CAST(count(*) AS BIGINT) AS n_vecs,
               TRUE AS count_ok, TRUE AS separation_ok,
               TRUE AS modes_ok, TRUE AS approx_close_ok
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) > 0
    """,
    "similarity_llm_pipeline": """
        SELECT CAST(count(*) AS BIGINT) AS n_vecs,
               TRUE AS prune_count_ok, TRUE AS monotone_ok,
               TRUE AS proj_dims_ok, TRUE AS deterministic_ok
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) > 0
    """,
    "similarity_pca_quality": """
        SELECT CAST(count(*) AS BIGINT) AS n_vecs,
               true AS pca_better, true AS orth_ok, true AS var_ordered
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) > 0
    """,
    "embedding_incremental_complete": """
        SELECT count(*) AS n_arriving, TRUE AS sound,
               TRUE AS exact_complete
        FROM embeddings WHERE vec_id < 1000 AND vec_id % 3 = 0
    """,
    "embedding_near_dups_recall": """
        SELECT count(*) AS n_vecs, TRUE AS precision_ok, TRUE AS recall_ok
        FROM embeddings WHERE vec_id < 1000
    """,
    "similarity_ivfpq_recall": """
        SELECT count(*) AS n_vecs, TRUE AS recall_ok, TRUE AS scores_ok
        FROM embeddings
    """,
    "similarity_cosine": """
        WITH s AS (
          SELECT e.vec_id,
                 list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) AS dp,
                 sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                       CAST(e.embedding AS DOUBLE[])))
                   * sqrt(list_dot_product(q.qv, q.qv)) AS den
          FROM embeddings e
          CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS qv
                      FROM embeddings WHERE vec_id = 0) q
        )
        SELECT vec_id,
               round(CASE WHEN den <> 0 THEN dp / den END, 6) AS cosine
        FROM s
    """,
    "similarity_ivf_recall": """
        SELECT count(*) AS n_vecs, TRUE AS recall_ok, TRUE AS scores_ok
        FROM embeddings
    """,
    "similarity_lsh_recall": """
        SELECT count(*) AS n_vecs, TRUE AS recall_ok, TRUE AS scores_ok
        FROM embeddings
    """,
    "similarity_batch_recall": """
        SELECT count(*) AS n_vecs, TRUE AS recall_ok FROM embeddings
    """,
    "similarity_pq_recall": """
        SELECT count(*) AS n_vecs, TRUE AS recall_ok, TRUE AS scores_ok
        FROM embeddings
    """,
    "multimodal_features": """
        SELECT doc_id AS media_id,
               list_extract(['image', 'audio', 'video'],
                            CAST(doc_id % 3 AS INT) + 1) AS kind,
               sha256(text) AS payload_sha256,
               CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
        FROM documents
    """,
    "multimodal_frame_sample": """
        -- frame digest = sha256(payload || frame_idx as 4 LE bytes);
        -- frame_idx < 128 here (max doc 540 chars -> 5 frames), so the
        -- ASCII chr() bytes equal the little-endian encoding
        WITH m AS (
          SELECT doc_id, text, CAST(n_chars * 10 AS BIGINT) AS duration_ms
          FROM documents WHERE doc_id < 50
        ), frames AS (
          SELECT doc_id, text,
                 unnest(generate_series(0, duration_ms // 1000 - 1)) AS f
          FROM m WHERE duration_ms >= 1000
        )
        SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
               CAST(f * 1000 AS BIGINT) AS frame_ts_ms,
               sha256(text || chr(CAST(f AS INT))
                      || chr(0) || chr(0) || chr(0)) AS frame_sha256
        FROM frames
    """,
    "similarity_quantize": """
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ), s AS (
          SELECT vec_id, e,
                 list_max(list_transform(e, x -> abs(x))) AS am
          FROM v
        ), q AS (
          SELECT vec_id, am,
                 CASE WHEN am > 0
                      THEN list_transform(e,
                           x -> CAST(floor(x / (am / 127.0) + 0.5) AS BIGINT))
                      ELSE list_transform(e, x -> CAST(0 AS BIGINT)) END AS qe
          FROM s
        )
        SELECT vec_id, am / 127.0 AS q_scale,
               CAST(list_sum(qe) AS BIGINT) AS q_sum,
               CAST(list_sum(list_transform(qe, y -> y * y)) AS BIGINT) AS q_l2
        FROM q
    """,
    "similarity_topk": """
        WITH s AS (
          SELECT e.vec_id,
                 list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) AS dp,
                 sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                       CAST(e.embedding AS DOUBLE[])))
                   * sqrt(list_dot_product(q.qv, q.qv)) AS den
          FROM embeddings e
          CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS qv
                      FROM embeddings WHERE vec_id = 0) q
        )
        SELECT vec_id,
               round(CASE WHEN den <> 0 THEN dp / den END, 6) AS cosine
        FROM s ORDER BY cosine DESC, vec_id LIMIT 25
    """,
    "similarity_batch_topk_exact": """
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS n
          FROM embeddings
        )
        SELECT q.vec_id AS query_id, c.vec_id,
               round(CASE WHEN q.n * c.n <> 0
                          THEN list_dot_product(q.e, c.e) / (q.n * c.n)
                     END, 6) AS cosine
        FROM v q CROSS JOIN v c
        WHERE q.vec_id < 5
        QUALIFY row_number() OVER (
          PARTITION BY q.vec_id
          ORDER BY round(CASE WHEN q.n * c.n <> 0
                              THEN list_dot_product(q.e, c.e) / (q.n * c.n)
                         END, 6) DESC,
                   c.vec_id) <= 5
    """,
    "embedding_near_dups_exact": """
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) AS n
          FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.e, b.e) / (a.n * b.n), 6) AS cosine
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE a.n <> 0 AND b.n <> 0
          AND list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.4
    """,
}
