"""A/B: minhash_dedup signature reuse strategies at sf0.1.

current  = no persist (kernel runs once per join side)
lcp      = localCheckpoint(eager) the signature relation (RDD-format
           storage, not the columnar cache the round-4 A/B rejected)
persist  = plain persist() (the round-4 loser, re-measured for context)
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
N = int(os.environ.get("AB_RUNS", "5"))


def run(docs, sig_mode):
    k, num_perm, bands, threshold = 5, 64, 16, 0.8
    id_col = "doc_id"
    sigs = dedup.minhash_signatures(docs, "text", id_col, k, num_perm)
    release = None
    if sig_mode == "lcp":
        sigs = sigs.localCheckpoint(eager=True)
    elif sig_mode == "persist":
        sigs = sigs.persist()
        release = sigs
    r = num_perm // bands
    banded = sigs.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.slice(F.col("_sig"), b * r + 1, r), F.lit(b)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_hash"),
    )
    a = banded.select(
        F.col("_id").alias("id_a"), F.col("_sig").alias("_sig_a"), "band_hash"
    )
    b = banded.select(
        F.col("_id").alias("id_b"), F.col("_sig").alias("_sig_b"), "band_hash"
    )
    agree = F.size(
        F.filter(
            F.zip_with("_sig_a", "_sig_b", lambda x, y: x == y), lambda eq: eq
        )
    )
    dup_ids = (
        a.join(b, "band_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .where(agree / F.lit(64.0) >= 0.8)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    out = dedup._eager(docs.join(dup_ids, on=id_col, how="left_anti"))
    n = out.count()
    if release is not None:
        release.unpersist()
    return n


def time_kernel(docs, fn, runs):
    """Signature-kernel throughput: materialize every signature via a
    cheap aggregate (no driver collect of the arrays)."""
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(docs).agg(
            F.sum(F.element_at("_sig", 1)).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def kernel_ab(spark):
    """Round-8 ask: numpy pandas_udf kernel vs pure-JVM expression path
    (transform+xxhash64 shingles, aggregate/zip_with min-reduction)."""
    docs = load(spark, SF, "documents")
    variants = {
        "numpy_pandas_udf": lambda d: dedup.minhash_signatures(
            d, "text", "doc_id", 5, 64
        ),
        "jvm_expressions": lambda d: dedup.minhash_signatures_sql(
            d, "text", "doc_id", 5, 64
        ),
    }
    for name, fn in variants.items():
        time_kernel(docs, fn, 1)  # warm
        print(f"kernel {name}: {time_kernel(docs, fn, N):.3f}s")


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab-minhash", cpus=cpus, shuffle_partitions=cpus)
    if os.environ.get("AB_MODE", "") == "kernel":
        kernel_ab(spark)
        return
    docs = load(spark, SF, "documents")
    run(docs, "current")  # warm
    for mode in ("current", "lcp", "persist"):
        best, rows = None, None
        for _ in range(N):
            t0 = time.perf_counter()
            rows = run(docs, mode)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{mode}: {best:.3f}s ({rows} rows)")


if __name__ == "__main__":
    main()
