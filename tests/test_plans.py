"""Plan-shape assertions: the physical plans the engine is supposed to
produce at scale — pushed filters, broadcast joins, partition pruning.
(The Spark analog of the reference's golden-SQL tests,
tests/unit/tasks/test_execute_query.py.)"""

import os

import pytest
from pyspark.sql import functions as F

from amazon_s3_find_and_forget_spark.matches import QueueItem, build_column_groups
from amazon_s3_find_and_forget_spark.plans.find import (
    find_affected_files,
    find_matching_rows,
)


@pytest.fixture()
def lake(tmp_path, spark, sf_dir):
    src = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    loc = str(tmp_path / "li")
    src.repartition(4).write.parquet(loc)
    return loc


@pytest.fixture()
def partitioned_lake(tmp_path, spark, sf_dir):
    src = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    loc = str(tmp_path / "li_part")
    src.write.partitionBy("l_returnflag").parquet(loc)
    return loc


def explain_str(df, mode="formatted"):
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def test_find_pushes_in_filter(spark, lake):
    df = spark.read.parquet(lake)
    groups = build_column_groups(
        df.schema, ["l_orderkey"], [QueueItem(match_id=k) for k in (1, 3, 5)]
    )
    plan = explain_str(find_affected_files(df, groups))
    assert "PushedFilters" in plan
    assert "In(l_orderkey" in plan  # match set reaches the parquet scan


def test_find_prunes_columns(spark, lake):
    df = spark.read.parquet(lake)
    groups = build_column_groups(
        df.schema, ["l_orderkey"], [QueueItem(match_id=1)]
    )
    plan = explain_str(find_affected_files(df, groups))
    # scan should read only the identifier column, not all 11
    assert "l_extendedprice" not in plan.split("PushedFilters")[0] or (
        "ReadSchema: struct<l_orderkey" in plan
    )


def test_find_semi_join_broadcasts(spark, lake):
    df = spark.read.parquet(lake)
    groups = build_column_groups(
        df.schema, ["l_orderkey"], [QueueItem(match_id=k) for k in range(100)]
    )
    plan = explain_str(
        find_affected_files(df, groups, predicate_value_limit=10)
    )
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_partition_pruning(spark, partitioned_lake):
    df = spark.read.parquet(partitioned_lake).where(F.col("l_returnflag") == "R")
    plan = explain_str(df)
    # static partition pruning: only the R partition is scanned
    assert "l_returnflag=R" in plan or "PartitionFilters" in plan
    groups = build_column_groups(
        df.schema, ["l_orderkey"], [QueueItem(match_id=1)]
    )
    rows = find_matching_rows(df, groups)
    base = spark.read.parquet(partitioned_lake)
    expected = base.where("l_returnflag = 'R' and l_orderkey = 1").count()
    assert rows.count() == expected


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    """The analytic star joins (TPC-H-shaped catalog queries) must plan
    every dimension side as a broadcast hash join — at this scale no
    dimension should ever trigger a sort-merge shuffle; the only
    exchange is the final aggregation's."""
    from amazon_s3_find_and_forget_spark.catalog import tpch

    df = tpch.q_tpch_q7(spark, sf_dir)
    df.collect()  # finalize the adaptive plan
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # one shuffle total: the groupBy; the five joins add none
    assert plan.count("Exchange hashpartitioning") <= 1


def test_whole_stage_codegen_in_find(spark, lake):
    df = spark.read.parquet(lake)
    groups = build_column_groups(
        df.schema, ["l_orderkey"], [QueueItem(match_id=1)]
    )
    out = find_matching_rows(df, groups)
    out.collect()  # finalize the adaptive plan
    # "*(n)" markers in simple mode = whole-stage-codegen'd stages
    plan = explain_str(out, "simple")
    assert "*(" in plan


def test_window_catalog_queries_single_shuffle(spark, sf_dir):
    """The moving-average and running-total catalog queries are ONE
    hash-partition exchange each (window over the partition key) — no
    extra repartition sneaks in between the scan and the window."""
    from amazon_s3_find_and_forget_spark import entry_queries

    for name in ("events_moving_avg", "orders_running_total"):
        df = entry_queries.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "Window" in plan, name


def test_curation_operators_shuffle_budget(spark, sf_dir):
    """pack_sequences and stratified_sample are ONE hash-partition
    exchange each (their window partition); contamination_screen's
    corpus side joins the benchmark grams by BROADCAST, so the only
    exchanges are the distinct on the (tiny) gram/hit sets."""
    from amazon_s3_find_and_forget_spark import entry_queries

    for name in ("text_pack", "text_stratified_sample"):
        df = entry_queries.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "Window" in plan, name

    df = entry_queries.QUERIES["text_contamination"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_q2_prunes_lineitem_before_aggregate(spark, sf_dir):
    """q2's scale shape: the lineitem scan is semi-joined to the
    broadcast filtered part keys BEFORE the per-(part,supplier)
    aggregation — the shuffle input is the sliver, not the fact table.
    In the physical plan that reads as a broadcast LeftSemi join BELOW
    the first hash aggregate."""
    from amazon_s3_find_and_forget_spark import entry_queries

    df = entry_queries.QUERIES["tpch_q2"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    semi = plan.find("LeftSemi")
    agg = plan.find("HashAggregate")
    assert semi != -1, "semi-join prune missing"
    assert "BroadcastHashJoin" in plan
    # the plan string prints top-down: the aggregate consuming the
    # semi-join output must appear ABOVE (before) the semi-join line
    assert agg < semi, "aggregate should consume the pruned scan"


def test_tpch_q20_broadcasts_excess_keys(spark, sf_dir):
    """q20's semi-join against the bounded excess-supplier key set is a
    broadcast, never a shuffled SortMergeJoin of the supplier table."""
    from amazon_s3_find_and_forget_spark import entry_queries

    df = entry_queries.QUERIES["tpch_q20"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # no shuffled semi-join of supplier anywhere
    for line in plan.splitlines():
        if "SortMergeJoin" in line and "LeftSemi" in line:
            raise AssertionError(f"shuffled semi-join: {line.strip()}")


def test_tpch_q21_anti_join_chain(spark, sf_dir):
    """q21 keeps the EXISTS/NOT-EXISTS pair as one semi + one anti join
    (no cartesian/nested-loop fallback for the non-equi residual)."""
    from amazon_s3_find_and_forget_spark import entry_queries

    df = entry_queries.QUERIES["tpch_q21"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_shuffles_cluster_key_not_embeddings(spark, sf_dir):
    """SemDeDup's pair join shuffles on the int cluster id; the
    normalized-embedding columns ride along but the join itself is an
    equi hash/sort-merge join on _cluster — never a cross join."""
    import numpy as np

    from amazon_s3_find_and_forget_spark import entry_queries
    from amazon_s3_find_and_forget_spark.operators import similarity

    embs = entry_queries.load(spark, sf_dir, "embeddings").limit(500)
    cents = similarity.train_ivf_centroids(embs, n_centroids=4,
                                           sample_size=500)
    df = similarity.semantic_dedup(embs, cents, threshold=0.9)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_unigram_lm_lookup_broadcasts(spark, sf_dir, monkeypatch):
    """The vocabulary-sized LM relation must broadcast (at this
    corpus/vocab ratio); the scoring scan never sort-merge-joins.
    _eager checkpoints the operator's output into an RDD scan since
    round 15 (the double-compute fix), so neutralize it to see the
    real join plan."""
    from amazon_s3_find_and_forget_spark import entry_queries
    from amazon_s3_find_and_forget_spark.operators import dedup

    monkeypatch.setattr(dedup, "_eager", lambda d: d)
    df = entry_queries.QUERIES["text_unigram_nll"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pq_shortlist_scan_is_expression_only(spark, sf_dir):
    """ADC scoring must be a literal-LUT expression over the code column:
    no join, no cartesian, exactly the encode UDF's Python stage."""
    from amazon_s3_find_and_forget_spark.entry_queries import load
    from amazon_s3_find_and_forget_spark.operators import similarity

    embs = load(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in embs.limit(1).collect()[0]["embedding"]]
    cb = similarity.train_pq_codebooks(embs, m=8, k=16, sample_size=500)
    df = similarity.pq_topk(embs, qvec, cb, k=5, shortlist=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # covers SortMerge/BroadcastHash/Cartesian
    assert plan.count("ArrowEvalPython") <= 1  # the encode kernel only


def test_funnel_frontier_joins_never_cartesian(spark, sf_dir):
    """Each funnel step is a user-keyed equi-join against the shrinking
    frontier — no cartesian/nested-loop anywhere in the chain."""
    from amazon_s3_find_and_forget_spark.entry_queries import load
    from amazon_s3_find_and_forget_spark.operators import funnel

    ev = load(spark, sf_dir, "events")
    # build the unexecuted frontier chain (funnel_counts materializes —
    # inspect the retention plan plus a manual 2-step frontier instead)
    from pyspark.sql import functions as F

    s1 = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("_prev")
    )
    step2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("_prev"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("_prev"))
    )
    plan = step2._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    r = funnel.cohort_retention(ev)
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_screens_never_shuffle_the_index(spark, sf_dir):
    """The incremental dedup screens' scale contract is physical: the
    index side must reach the probe as a plain scan — broadcast hash
    joins only, no SortMergeJoin, and the only hash exchanges are the
    BATCH's own (first-per-hash window + distinct)."""
    import re

    from amazon_s3_find_and_forget_spark.operators import (
        incremental as inc,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    hist = docs.where(F.col("doc_id") % 3 != 0)
    arr = docs.where(F.col("doc_id") % 3 == 0)

    # exact, broadcast path (forced past the In-predicate switch)
    novel, _ = inc.incremental_exact_dedup(
        arr, inc.exact_index(hist), predicate_value_limit=1
    )
    plan = explain_str(novel, "simple")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2  # semi probe + anti join
    # both hash exchanges belong to the batch (window + distinct), and
    # the checkpointed batch relation feeds them — the index subtree
    # contributes none
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2

    # minhash: the drop-set derivation is checkpointed inside the call,
    # so audit the candidate relation itself
    sigs = inc.minhash_index(hist)
    from pyspark.sql import functions as _F

    from amazon_s3_find_and_forget_spark.operators.dedup import (
        banded_signatures,
    )

    banded_idx = banded_signatures(sigs, 16, 64, with_sig=True).select(
        _F.col("_id").alias("id_a"), _F.col("_sig").alias("_sig_a"),
        "band_hash",
    )
    banded_new = banded_signatures(
        inc.minhash_index(arr.limit(100)), 16, 64, with_sig=True
    ).select(
        _F.col("_id").alias("id_b"), _F.col("_sig").alias("_sig_b"),
        "band_hash",
    )
    cand = banded_idx.join(_F.broadcast(banded_new), "band_hash")
    plan2 = explain_str(cand, "simple")
    assert "SortMergeJoin" not in plan2
    assert "BroadcastHashJoin" in plan2
    assert "Exchange hashpartitioning" not in plan2


def test_curation_pipeline_plan_shape(spark, sf_dir):
    """The composed curation row's claim is physical: every join plans
    as a broadcast (contamination semi-join + flag join), never a
    SortMergeJoin, and the only hash exchanges are the genuinely wide
    steps (dedup window, benchmark n-gram dedup)."""
    import re

    from amazon_s3_find_and_forget_spark import entry_queries as eq

    df = eq.QUERIES["text_curation_pipeline"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 3


def test_training_order_never_single_partition(spark, sf_dir):
    """training_order's global rank must NOT compile to the naive
    ``row_number() OVER (ORDER BY ...)`` Exchange SinglePartition — the
    whole-corpus-through-one-task shape. The bucketed two-level rank
    keeps every full-data stage distributed: the only SinglePartition
    exchange allowed is the per-bucket offset cumulation, whose input
    is bounded by the bucket-id space (<= 16^4 rows), which the plan
    shows as a window over the tiny aggregate, not over the input."""
    from amazon_s3_find_and_forget_spark.operators import text as text_ops

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    df = text_ops.training_order(docs, seed="plan", epoch=1)
    plan = explain_str(df)
    # the data side's rank window partitions by the bucket key
    # (hashpartitioning on _to_b — distributed), and the offsets reach
    # it through a broadcast join, not a shuffle.
    assert "hashpartitioning(_to_b" in plan
    assert "BroadcastHashJoin" in plan
    # at most ONE SinglePartition exchange: the offsets branch, which
    # must cumulate over an Aggregate (bounded by the bucket-id space),
    # never over the corpus scan directly.
    singles = plan.count("Exchange SinglePartition")
    assert singles <= 1
    if singles:
        below = plan.split("Exchange SinglePartition", 1)[1]
        assert "HashAggregate" in below


def test_training_order_matches_naive_rank(spark, sf_dir):
    """The bucketed rank must equal the naive global row_number rank."""
    from pyspark.sql import Window

    from amazon_s3_find_and_forget_spark.operators import text as text_ops

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {
        r["doc_id"]: r["order_rank"]
        for r in text_ops.training_order(docs, seed="x", epoch=3).collect()
    }
    key = F.col("doc_id").cast("string")
    h = F.md5(F.concat(key, F.lit("|x|3")))
    naive = {
        r["doc_id"]: r["rn"]
        for r in docs.withColumn(
            "rn", F.row_number().over(Window.orderBy(h, key))
        ).collect()
    }
    assert got == naive


def test_simhash_value_join_plan_shape(spark, sf_dir):
    """The round-11 simhash redesign's physical contract, pinned on the
    PRODUCTION plan builder (_simhash_pair_plan — the public operator
    eagerly checkpoints its result, discarding inspectable lineage):
    the combination join runs over DISTINCT simhash values and the
    verified value pairs expand through the membership relation as
    equi-joins — never a cartesian/nested-loop anywhere, so a
    mass-duplicated corpus cannot blow the candidate relation back up
    through the plan."""
    from pyspark.sql import functions as F

    from amazon_s3_find_and_forget_spark.entry_queries import load
    from amazon_s3_find_and_forget_spark.operators import dedup as dd

    docs = load(spark, sf_dir, "documents")
    sh = dd.with_simhash(docs).select(
        F.col("doc_id").alias("_id"), "simhash"
    )
    lazy = dd._simhash_pair_plan(sh, sh.select("simhash").distinct(), 3)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the combination join's inputs derive from the DISTINCT values
    # relation: the plan must aggregate (distinct) before exploding
    assert "HashAggregate" in plan and "Generate" in plan


def test_dsir_weights_plan_shape(spark, sf_dir):
    """DSIR's scale contract is physical: the <= B-row log-ratio model
    joins the gram stream as a BROADCAST (never a SortMergeJoin of the
    corpus-sized side), and the wide steps are bounded — the two
    bucket-count aggregates (each collapsing to <= n_buckets keys
    map-side) plus the doc-keyed weight sum."""
    import re

    from pyspark.sql import functions as F

    from amazon_s3_find_and_forget_spark.catalog.loader import load
    from amazon_s3_find_and_forget_spark.operators import text

    docs = load(spark, sf_dir, "documents")
    w = text.dsir_importance_weights(
        docs, docs.where(F.col("lang") == "en"), eager=False
    )
    plan = explain_str(w, "simple")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 5


def test_dsir_select_compiles_to_take_ordered(spark, sf_dir):
    """The selection must be TakeOrderedAndProject (per-partition top-k
    heaps), never a global Sort of the scored corpus."""
    from pyspark.sql import functions as F

    from amazon_s3_find_and_forget_spark.catalog.loader import load
    from amazon_s3_find_and_forget_spark.operators import text

    docs = load(spark, sf_dir, "documents")
    sel = text.dsir_select(docs, docs.where(F.col("lang") == "en"), 10)
    plan = explain_str(sel, "simple")
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan.replace("TakeOrderedAndProject", "")


def test_gopher_flags_plan_is_map_only(spark, sf_dir):
    """Every Gopher rule is a scalar expression: the whole operator
    must compile to ONE map-only projection — zero exchanges, zero
    joins, zero UDFs (scan + project inside WholeStageCodegen)."""
    from amazon_s3_find_and_forget_spark.catalog.loader import load
    from amazon_s3_find_and_forget_spark.operators import text

    docs = load(spark, sf_dir, "documents")
    plan = explain_str(text.gopher_quality_flags(docs), "simple")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "*(1)" in plan  # the whole projection in one codegen stage


def test_pca_projection_plan_is_map_only(spark, sf_dir):
    """PCA projection is one Arrow-batched map pass: no exchange, no
    join — the component matrix rides in the UDF closure."""
    from amazon_s3_find_and_forget_spark.catalog.loader import load
    from amazon_s3_find_and_forget_spark.operators import similarity

    emb = load(spark, sf_dir, "embeddings")
    model = similarity.train_pca(emb, 8)
    plan = explain_str(similarity.project_embeddings(emb, model), "simple")
    assert "Exchange" not in plan
    assert "Join" not in plan
