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


def session_aggregate(
    df: DataFrame, gap: str = "30 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Event-time sessionization: per-user sessions closed by a ``gap``
    of inactivity, with per-session bounds and counts.

    Spark-first: the built-in ``session_window`` grouping (a merging
    event-time window Catalyst maintains natively) rather than a custom
    ``applyInPandasWithState`` fold — the same definition runs on a
    static frame (full-history sessionization) and on a watermarked
    stream (live sessions, state bounded by the watermark: a session
    emits once the watermark passes its close). NULL timestamps carry no
    event-time and are excluded, matching the batch catalog's
    sessionization semantics.
    """
    return (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def session_aggregate_stream(
    spark,
    events_dir: str,
    schema,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    late_threshold: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization over a file source with a watermark."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return session_aggregate(
        stream.withWatermark(ts_col, late_threshold), gap, ts_col
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
