"""Physical-layout helpers: bucketing and partitioned layouts.

At 100 TB the dominant join cost is the shuffle of the fact table.
Spark's bucketed tables persist a hash-partitioned layout so an
equi-join on the bucket keys is *co-located*: both sides scan their
matching buckets and join with NO Exchange in the plan. The engine's
repeated-join relations (lineitem x orders for deletion auditing,
embeddings x ivf_cell for ANN probes) are the candidates.

These helpers are deliberately thin wrappers over the public
``DataFrameWriter.bucketBy`` / ``partitionBy`` API — the value is the
tested *plan shape* (see tests/test_layout.py), not the code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    Sorting within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins. ``n_buckets`` should be sized so one bucket of the
    largest table fits an executor's memory at the target scale.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same keys/bucket-count.

    When both sides are bucketed on ``on`` with equal bucket counts,
    Catalyst's output-partitioning check elides both Exchanges — the
    join runs bucket-to-bucket. The merge hint matters: at toy scale the
    planner would otherwise pick a broadcast join and mark the buckets
    unused ("Bucketed: false (disabled by query planner)"); at real
    scale neither side broadcasts and sort-merge is what the planner
    picks anyway — the hint makes the test rig exercise the scale plan.
    """
    return spark.table(left_table).join(
        spark.table(right_table).hint("merge"), on, how
    )
