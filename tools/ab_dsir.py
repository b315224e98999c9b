"""A/B: DSIR weight-computation strategies over a documents corpus.

recompute = no persist (the gram stream is re-tokenized for the fit
            aggregate and again for the scoring join)
persist   = DISK_ONLY persist of the (id, bucket) gram stream between
            fit and score (the shipped default: two longs per gram
            occurrence vs re-reading + re-tokenizing the text corpus)
xxhash64  = NO persist, with the codegen integer bucket hash instead
            of the engine-portable md5 (the oracle-portability trade;
            unpersisted so the digest cost is isolated against
            `recompute`, which is its md5 twin)

Round-13 measurements at 500k docs (/tmp/s3f2-sf10-bench): recompute
19.9 s, persist 8.8 s, xxhash64-without-persist 16.4 s — the explode
dominates the digest, so md5 stays the default and the persist is the
big lever. Set SPARK_GRAFT_SF_DIR to reproduce at other scales.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazon_s3_find_and_forget_spark.session import get_spark  # noqa: E402
from amazon_s3_find_and_forget_spark.entry_queries import load  # noqa: E402
from amazon_s3_find_and_forget_spark.operators import text  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_RUNS", "3"))


def main():
    spark = get_spark(app_name="ab-dsir", cpus=32, shuffle_partitions=32)
    docs = load(spark, SF, "documents")
    target = docs.where(F.col("lang") == "en")
    variants = {
        "recompute": dict(eager=False),
        "persist": dict(eager=True),
        "xxhash64": dict(eager=False, hash_fn="xxhash64"),
    }
    for name, kw in variants.items():
        runs = []
        for _ in range(N):
            t0 = time.perf_counter()
            n = text.dsir_importance_weights(docs, target, **kw).count()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name:10s} min {min(runs)}s rows={n} spread={runs}")
    spark.stop()


if __name__ == "__main__":
    main()
