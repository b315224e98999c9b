"""Streaming Find: screen newly-landed lake files for queued matches.

The batch Find (plans/find.py) answers "which existing objects contain
matches". A live lake keeps receiving objects; screening each new file
as it lands turns the Find semi-join into a Structured Streaming
pipeline: file-source ``readStream`` discovers new files per
micro-batch, the SAME compiled match predicate runs over them (pushed
to the scan exactly as in batch — one logical plan, two execution
modes), and affected files append to a screening log the next deletion
job can consume instead of re-scanning the whole lake.

At scale this converts the reference's periodic full-lake Find
(156 GB scanned per job on the 10 TB scenario, COST_OVERVIEW.md) into
an incremental one: each object is scanned once, when it arrives;
``maxFilesPerTrigger`` bounds per-batch work and the checkpoint makes
discovery exactly-once across restarts.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..matches import ColumnGroup
from ..plans.find import PATH_COL, group_predicate


def screen_stream(
    spark,
    lake_dir: str,
    schema,  # DDL string or StructType — streams never infer
    groups: list[ColumnGroup],
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of rows in NEW files that match any group.

    Downstream consumers aggregate per file (``screened_files``) or
    alert per row; the predicate compiles into the stream's scan the
    same way the batch Find's does.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(lake_dir) if fmt == "parquet" else reader.json(lake_dir)
    )
    combined = reduce(or_, [group_predicate(g) for g in groups])
    return stream.where(combined).withColumn(
        PATH_COL, F.input_file_name()
    )


def screened_files(matched_stream: DataFrame) -> DataFrame:
    """Per-file match counts (complete-mode aggregate of the screen)."""
    return matched_stream.groupBy(PATH_COL).agg(
        F.count(F.lit(1)).alias("match_count")
    )


def run_screen_to_log(
    matched_stream: DataFrame, checkpoint: str, out_dir: str
) -> None:
    """Drain pending files into a parquet screening log (availableNow).

    Appends matched ROWS (with provenance); the distinct affected-file
    list is a trivial batch query over the log. Row-level append needs
    no watermark and keeps the sink exactly-once via the checkpoint.
    """
    (
        matched_stream.writeStream.outputMode("append")
        .format("parquet")
        .option("checkpointLocation", checkpoint)
        .option("path", out_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
