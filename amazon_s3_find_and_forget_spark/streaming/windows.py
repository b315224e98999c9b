"""Watermarked windowed aggregation over an event stream.

The reference has no windowed stream operators (SURVEY §2.7 "Absent"),
but a scaled deployment folding per-hour activity out of a live event
feed needs exactly this shape: ``readStream`` -> event-time tumbling
window + watermark (bounds state for late data) -> append-mode sink.
The aggregation logic is shared with the batch ``events_hourly`` query
so the two cannot drift — one definition, two execution modes, which is
the core promise of Structured Streaming.

State size is O(open windows x group cardinality): the watermark closes
windows ``late_threshold`` past the max observed event time, so state
never grows with stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_counts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """The shared batch/streaming aggregation: tumbling 1h event-time
    window x event_type -> count + value sum. Works on a static OR
    streaming DataFrame (Spark resolves the same logical plan both ways).
    """
    return (
        df.groupBy(
            F.window(F.col(ts_col), "1 hour").alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def hourly_counts_stream(
    spark,
    events_dir: str,
    schema,  # DDL string or StructType
    ts_col: str = "ts",
    late_threshold: str = "2 hours",
) -> DataFrame:
    """Streaming variant: file-source ``readStream`` with a watermark.

    Append output mode emits a window only once the watermark passes its
    end — exactly-once per window, late rows inside ``late_threshold``
    still counted, later ones dropped (the documented late-data policy).
    """
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return hourly_counts(
        stream.withWatermark(ts_col, late_threshold), ts_col
    )


def run_to_table(stream_df: DataFrame, checkpoint: str, out_dir: str) -> None:
    """Drain the stream with availableNow (batch-equivalent semantics)."""
    (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("checkpointLocation", checkpoint)
        .option("path", out_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
