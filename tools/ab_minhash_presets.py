"""Measured num_perm/bands preset table for minhash_dedup.

For each preset: sf1-lane survivors wall-clock (min of AB_RUNS,
interleaved to control host drift) plus dedup quality vs the exact
shingle-Jaccard baseline on the first 1000 docs — the same methodology
as the `dedup_minhash_recall` gate row (threshold 0.5; recall measured
at J >= 0.65, precision partners at J >= 0.3). Feeds the preset table
in SCALE.md.

Usage: python tools/ab_minhash_presets.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from amazon_s3_find_and_forget_spark.entry_queries import load  # noqa: E402
from amazon_s3_find_and_forget_spark.operators import dedup  # noqa: E402
from amazon_s3_find_and_forget_spark.session import get_spark  # noqa: E402

PRESETS = [(64, 16), (128, 32), (64, 8), (128, 16), (32, 8)]
N = int(os.environ.get("AB_RUNS", "3"))


def quality(spark, docs, num_perm, bands):
    """Recall/precision vs exact Jaccard (gate-row methodology)."""
    eval_docs = docs.where(F.col("doc_id") < 1000).persist()
    survivors = dedup.minhash_dedup(
        eval_docs, num_perm=num_perm, bands=bands, threshold=0.5
    ).select("doc_id")
    dropped = eval_docs.select("doc_id").join(
        survivors, "doc_id", "left_anti"
    )
    sh = dedup._with_shingles(eval_docs, "text", 5).select(
        F.col("doc_id").alias("_id"), "_shingles"
    )
    a = sh.select(F.col("_id").alias("id_a"), F.col("_shingles").alias("_sa"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("_shingles").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    union = F.size(F.array_union("_sa", "_sb")).cast("double")
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (inter / union).alias("j"))
        .where(F.col("j") >= 0.3)
        .persist()
    )
    try:
        should_drop = pairs.where(F.col("j") >= 0.65).select(
            F.col("id_b").alias("doc_id")
        ).distinct()
        n_should = should_drop.count()
        n_caught = should_drop.join(dropped, "doc_id", "left_semi").count()
        partnered = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        n_dropped = dropped.count()
        n_partnered = dropped.join(partnered, "doc_id", "left_semi").count()
    finally:
        pairs.unpersist()
        eval_docs.unpersist()
    return (
        round(n_caught / n_should, 4) if n_should else 1.0,
        round(n_partnered / n_dropped, 4) if n_dropped else 1.0,
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/s3f2-sf1-bench"
    spark = get_spark(app_name="ab-presets", cpus=32, shuffle_partitions=32)
    docs = load(spark, sf_dir, "documents")
    spark.range(100000).repartition(32).select(
        F.pandas_udf(lambda s: s, "long")(F.col("id"))
    ).count()

    best = {p: None for p in PRESETS}
    for _ in range(N):  # interleaved: host drift hits every preset alike
        for num_perm, bands in PRESETS:
            t = time.perf_counter()
            dedup.minhash_dedup(docs, num_perm=num_perm, bands=bands).count()
            e = time.perf_counter() - t
            p = (num_perm, bands)
            best[p] = e if best[p] is None else min(best[p], e)
            spark.catalog.clearCache()
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()

    print(f"{'preset':>10} {'r':>3} {'wall_s':>8} {'recall@0.65':>12} "
          f"{'precision':>10}")
    for num_perm, bands in PRESETS:
        rec, prec = quality(spark, docs, num_perm, bands)
        print(f"{num_perm}/{bands:>6} {num_perm // bands:>3} "
              f"{best[(num_perm, bands)]:>8.3f} {rec:>12} {prec:>10}")


if __name__ == "__main__":
    main()
