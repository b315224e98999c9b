"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100 TB design point and merely parameterized
down for local testing:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and auto broadcast demotion/promotion.
- Arrow on: every pandas_udf / mapInPandas boundary is Arrow-batched.
- shuffle partitions sized to cores locally; on a real cluster this is
  overridden (or left to AQE's coalescing with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_memory(mem_total_bytes: int | None = None) -> str:
    """Driver-heap default for local[N]: min(24g, half of MemTotal),
    floor 2g, in whole GiB.

    24g is the measured local[32] sweet spot (round 17: 12-22 s of GC
    per sf1 stage at 8g, 5-30% interleaved A/B win at 24g — in
    local[N] this one heap IS all N executors). But a flat 24g default
    would fail to launch (or swap) on a 16-32 GB host (r17 verdict ask
    #7), so the default is capped at half the machine: the other half
    stays for Python workers and the page cache, the same split the
    128 GB bench host runs at. ``SPARK_DRIVER_MEMORY`` still overrides
    unconditionally."""
    if mem_total_bytes is None:
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemTotal:"):
                        mem_total_bytes = int(line.split()[1]) * 1024
                        break
        except OSError:
            pass
        if mem_total_bytes is None:
            return "24g"  # no /proc (non-Linux): keep the measured value
    gib = max(2, min(24, int(mem_total_bytes / 2 / (1 << 30))))
    return f"{gib}g"


def get_spark(
    app_name: str = "s3-find-and-forget-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # On a real cluster ALSO set
        # spark.sql.adaptive.coalescePartitions.parallelismFirst=false
        # (Spark's own production recommendation) so AQE coalesces to
        # advisoryPartitionSizeInBytes instead of keeping parallelism;
        # A/B-ed at sf0.1 local[32]: no local win (task scheduling in a
        # single JVM is too cheap for it to matter), so it is left to
        # cluster deployment rather than hardcoded here.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.caseSensitive", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # TIMESTAMP(NANOS) parquet columns surface as long nanos instead of
        # failing the scan (converted back to timestamps at load)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # In local[N] the driver JVM IS the executor: N concurrent
        # tasks share this one heap. The old 8g default left 256 MB per
        # task at N=32 — event logs showed 12-22 s of GC inside single
        # sf1 stages (up to half the stage's executor time), and an
        # interleaved 8g/24g A/B (round 17, two rounds each) measured
        # the shuffle-heaviest rows 5-30% faster at 24g with identical
        # plans. 24g keeps ~768 MB per concurrent task (the standard
        # ~1 GB/core sizing, guide §5/§9) while leaving the rest of a
        # 128 GB host to Python workers and the page cache. Still
        # env-overridable; on a real cluster executor memory is sized
        # separately and this default only shapes the driver. Capped
        # at half of MemTotal so a small host can still launch
        # (_default_driver_memory, r17 verdict ask #7).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY")
            or _default_driver_memory(),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
