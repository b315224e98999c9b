"""Same-session A/B adjudication of the dedup_span_removal sf10 drift
(r16 verdict ask #1): r15 recorded 16.75 s at CPU probe 0.558
(= 30.0 cal-sec); r16's closing min-of-2 recorded 29.99 s at probe
0.673 (= 44.6 cal-sec, ~1.49x calibrated) on a diff whose only touch
of this code path was parameter-plumbing with behavior-identical
defaults. This harness reruns the row standalone (quiet rig, repeated,
probes recorded) so the drift can be adjudicated weather-vs-plan by
the same treatment find_forget_job got in round 16 (SCALE.md).

Usage: python tools/adjudicate_span_removal.py [N_RUNS]
Prints one JSON line with probes + per-run seconds + cal-sec.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from amazon_s3_find_and_forget_spark import entry_queries  # noqa: E402
from amazon_s3_find_and_forget_spark.session import get_spark  # noqa: E402


def main():
    runs_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf1 = bench.ensure_sf1("/root/testdata/sf0.1")
    sf10 = bench.ensure_sf10(sf1)
    if not sf10:
        print(json.dumps({"error": "sf10 lane unavailable"}))
        return 1
    spark = get_spark(
        app_name="span-removal-ab", cpus=bench.CPUS,
        shuffle_partitions=bench.CPUS,
    )
    # same warm-up as the bench: JVM/codegen + Arrow worker pool
    entry_queries.load(spark, "/root/testdata/sf0.1", "region").count()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("double")
    def _warm(v):
        return v * 0.0

    entry_queries.load(spark, "/root/testdata/sf0.1", "region").select(
        _warm(col("r_regionkey").cast("double"))
    ).count()

    cal = bench.calibration_probe(spark)
    io_burst = bench.io_probe()
    fn = entry_queries.QUERIES["dedup_span_removal"]
    samples = []
    for i in range(runs_n):
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        n = fn(spark, sf10).count()
        samples.append(round(time.perf_counter() - t0, 3))
        print(f"# run {i}: {samples[-1]} s ({n} rows)", file=sys.stderr)
    cal_end = bench.calibration_probe(spark)
    out = {
        "row": "dedup_span_removal",
        "sf": 10,
        "samples": samples,
        "min": min(samples),
        "calibration_pre": cal,
        "calibration_post": cal_end,
        "io_burst": io_burst,
        "cal_sec_min": round(min(samples) / cal, 2),
        "r15_cell": {"raw": 16.75, "probe": 0.558, "cal_sec": 30.0},
        "r16_cell": {"raw": 29.99, "probe": 0.673, "cal_sec": 44.6},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
