"""Incremental funnel tracking over an event stream.

The batch operator (``operators/funnel.py``) recomputes conversion from
the full history; this one keeps one tiny state row per user —
``(depth, last_ts)`` — in Spark's checkpointed state store and advances
the greedy strictly-after matcher with each micro-batch. Same
first-touch semantics as the batch operator on in-order streams; the
state never stores events, so a user with millions of events costs the
same 16 bytes of state as a user with two.

Ordering contract (documented, standard for streaming funnels): events
are matched in timestamp order WITHIN each micro-batch, and batches are
assumed time-ordered per user. An event arriving in a later batch with
a timestamp before the user's matched frontier cannot retroactively
advance a step that was already passed over — exactly the tradeoff every
state-bounded streaming funnel makes; replay through the batch operator
for a late-data-exact answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("depth", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)

# depth reached so far + the timestamp of the last matched step,
# stored as epoch micros (state-store friendly scalar)
STATE_SCHEMA = StructType(
    [StructField("depth", LongType()), StructField("last_us", LongType())]
)


def event_stream(spark: SparkSession, events_dir: str):
    """The filtered JSONL event readStream shared by the incremental
    behavioral operators (funnel, retention): NULL users/timestamps are
    excluded up front — no sequence position without both."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(events_dir)
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    )


def streaming_funnel(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    steps: list[str],
    state_sink: dict | None = None,
):
    """Run the incremental funnel over a JSONL event directory.

    ``state_sink`` (a dict) receives refreshed ``user_id -> (depth,
    last_ts)`` rows via ``foreachBatch``; ``availableNow`` drains what
    is on disk and stops, and a restart resumes from the checkpoint
    with every user's frontier intact (exactly-once across restarts —
    the same recovery contract as the job-event fold).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = event_stream(spark, events_dir)

    def update(key, pdfs, state):
        if state.exists:
            depth, last_us = state.get
        else:
            depth, last_us = 0, None
        rows = []
        for pdf in pdfs:
            # column-wise zip, not iterrows(): a hot user's micro-batch
            # may carry very many events and per-row Series construction
            # would dominate the fold
            rows.extend(zip(pdf["ts"], pdf["event_type"]))
        rows.sort(key=lambda t: t[0])
        for ts, ty in rows:
            ts_us = int(ts.value // 1000)  # pandas Timestamp ns -> us
            if (
                depth < len(steps)
                and ty == steps[depth]
                and (last_us is None or ts_us > last_us)
            ):
                depth += 1
                last_us = ts_us
        state.update((depth, last_us))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "depth": depth,
                    "last_ts": (
                        pd.Timestamp(last_us, unit="us")
                        if last_us is not None
                        else pd.NaT
                    ),
                }
            ]
        )

    progressed = stream.groupBy("user_id").applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if state_sink is None:
            return
        for r in batch_df.collect():
            state_sink[r["user_id"]] = (r["depth"], r["last_ts"])

    return (
        progressed.writeStream.outputMode("update")
        .foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
