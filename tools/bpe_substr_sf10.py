"""BPE-unit ExactSubstr at the 100x decade (r16 verdict ask #7): the
round-16 SCALE entry priced the faithful operating point (trained
merge table, min_tokens=50 BPE tokens) at sf1 only; this harness
measures the same two-phase workflow — train_bpe_merges over the lane
corpus, then dedup_exact_substrings(tokenizer='bpe', merges=trained)
— at the sf10 lane (500k docs), with CPU/io probes recorded so the
datum is calibration-adjudicable like every other lane cell.

Usage: python tools/bpe_substr_sf10.py
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from amazon_s3_find_and_forget_spark import entry_queries  # noqa: E402
from amazon_s3_find_and_forget_spark.operators import dedup as dedup_ops  # noqa: E402
from amazon_s3_find_and_forget_spark.operators import text as text_ops  # noqa: E402
from amazon_s3_find_and_forget_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main():
    sf1 = bench.ensure_sf1("/root/testdata/sf0.1")
    sf10 = bench.ensure_sf10(sf1)
    if not sf10:
        print(json.dumps({"error": "sf10 lane unavailable"}))
        return 1
    spark = get_spark(
        app_name="bpe-substr-sf10", cpus=bench.CPUS,
        shuffle_partitions=bench.CPUS,
    )
    entry_queries.load(spark, "/root/testdata/sf0.1", "region").count()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("double")
    def _warm(v):
        return v * 0.0

    entry_queries.load(spark, "/root/testdata/sf0.1", "region").select(
        _warm(col("r_regionkey").cast("double"))
    ).count()

    cal = bench.calibration_probe(spark)
    docs = entry_queries.load(spark, sf10, "documents")
    n_docs = docs.count()

    t0 = time.perf_counter()
    merges = text_ops.train_bpe_merges(docs, n_merges=200, max_vocab=20_000)
    train_sec = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    out = dedup_ops.dedup_exact_substrings(
        docs, min_tokens=50, tokenizer="bpe", merges=merges
    )
    agg = out.agg(
        F.count("*").alias("rows"),
        F.sum("removed_tokens").alias("removed"),
    ).collect()[0]
    dedup_sec = round(time.perf_counter() - t0, 3)
    cal_post = bench.calibration_probe(spark)
    print(
        json.dumps(
            {
                "row": "dedup_exact_substrings_bpe_trained",
                "sf": 10,
                "n_docs": n_docs,
                "n_merges": len(merges),
                "train_sec": train_sec,
                "dedup_sec": dedup_sec,
                "rows": int(agg["rows"]),
                "removed_tokens": int(agg["removed"] or 0),
                "calibration_pre": cal,
                "calibration_post": cal_post,
                "r16_sf1": {"train_sec": 8.9, "dedup_sec": 21.2,
                            "n_docs": 50000},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
