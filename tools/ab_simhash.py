"""A/B harness for the simhash pair pipeline at sf0.1 (round-5 #3).

Times min-of-N for: (a) current implementation, (b) no pre-explode
persist, (c) no final distinct (dedup via groupBy min), (d) fewer
shuffle partitions on the bucket join. Prints one line per variant.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazon_s3_find_and_forget_spark.session import get_spark  # noqa: E402
from amazon_s3_find_and_forget_spark.entry_queries import load  # noqa: E402
from amazon_s3_find_and_forget_spark.operators import dedup  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_RUNS", "3"))


def variant_current(spark):
    return dedup.simhash_near_duplicates(
        load(spark, SF, "documents"), max_hamming=3
    )


def _pairs(keyed, max_hamming, dedup_how):
    a = keyed.select(
        F.col("_id").alias("id_a"), F.col("simhash").alias("_sim_a"), "bucket"
    )
    b = keyed.select(
        F.col("_id").alias("id_b"), F.col("simhash").alias("_sim_b"), "bucket"
    )
    j = (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_sim_a").bitwiseXOR(F.col("_sim_b"))).alias(
                "hamming"
            ),
        )
        .where(F.col("hamming") <= max_hamming)
    )
    if dedup_how == "distinct":
        return j.distinct()
    return j.groupBy("id_a", "id_b").agg(F.min("hamming").alias("hamming"))


def _keyed(df, persist):
    from itertools import combinations

    blocks, m = dedup._block_plan(3)
    combos = list(combinations(range(len(blocks)), m))

    def block_col(i):
        off, bits = blocks[i]
        return F.shiftrightunsigned(F.col("simhash"), off).bitwiseAND(
            F.lit((1 << bits) - 1)
        )

    keys = [
        F.xxhash64(F.lit(ci), *[block_col(i) for i in combo])
        for ci, combo in enumerate(combos)
    ]
    sh = dedup.with_simhash(df).select(
        F.col("doc_id").alias("_id"), F.col("simhash")
    )
    if persist:
        sh = sh.persist()
    keyed = sh.select(
        "_id", "simhash", F.explode(F.array(*keys)).alias("bucket")
    )
    return sh, keyed


def variant_nopersist(spark):
    df = load(spark, SF, "documents")
    sh, keyed = _keyed(df, persist=False)
    return dedup._eager(_pairs(keyed, 3, "distinct"))


def variant_groupby(spark):
    df = load(spark, SF, "documents")
    sh, keyed = _keyed(df, persist=True)
    try:
        return dedup._eager(_pairs(keyed, 3, "groupby"))
    finally:
        sh.unpersist()


def variant_fewparts(spark):
    df = load(spark, SF, "documents")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        sh, keyed = _keyed(df, persist=True)
        try:
            return dedup._eager(_pairs(keyed, 3, "distinct"))
        finally:
            sh.unpersist()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def variant_aqe_sizefirst(spark):
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
    )
    try:
        return variant_current(spark)
    finally:
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true"
        )


def variant_groupby_fewparts(spark):
    df = load(spark, SF, "documents")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        sh, keyed = _keyed(df, persist=True)
        try:
            return dedup._eager(_pairs(keyed, 3, "groupby"))
        finally:
            sh.unpersist()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def variant_nopersist_fewparts(spark):
    df = load(spark, SF, "documents")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        sh, keyed = _keyed(df, persist=False)
        return dedup._eager(_pairs(keyed, 3, "distinct"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab-simhash", cpus=int(cpus), shuffle_partitions=int(cpus)
    )
    variants = {
        "current": variant_current,
        "nopersist": variant_nopersist,
        "groupby": variant_groupby,
        "fewparts": variant_fewparts,
        "aqe_sizefirst": variant_aqe_sizefirst,
        "groupby_fewparts": variant_groupby_fewparts,
        "nopersist_fewparts": variant_nopersist_fewparts,
    }
    # warm the JVM/scan once
    variant_current(spark).count()
    for name, fn in variants.items():
        best, rows = None, None
        for _ in range(N):
            t0 = time.perf_counter()
            df = fn(spark)
            rows = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best:.3f}s ({rows} rows)")


if __name__ == "__main__":
    main()
