"""Incremental cohort retention over an event stream.

The batch operator (``operators/funnel.py::cohort_retention``) rescans
history; this one keeps per-user state — the cohort week plus the set of
week offsets already reported — and emits each (user, cohort, offset)
cell exactly once, the first time the user is seen active in that week.
Summing emitted cells per (cohort, offset) downstream reproduces the
batch triangle on an in-order stream.

State is bounded by the *campaign horizon*: one int64 cohort plus one
small int per distinct active week — a user active weekly for two years
holds ~100 ints. An event arriving with a timestamp BEFORE the user's
recorded cohort cannot move the cohort back (first-touch is pinned by
arrival order — the same in-order contract as the streaming funnel);
replay through the batch operator for late-data-exact cohorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from .funnel import event_stream

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("cohort_week", TimestampType()),
        StructField("week_offset", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("cohort_us", LongType()),
        StructField("offsets", ArrayType(LongType())),
    ]
)

_WEEK_US = 7 * 24 * 3600 * 1_000_000
# epoch (1970-01-01) was a Thursday; ISO weeks start Monday, which is
# epoch - 3 days
_MONDAY_SHIFT_US = 3 * 24 * 3600 * 1_000_000


def _week_start_us(ts_us: int) -> int:
    return ((ts_us + _MONDAY_SHIFT_US) // _WEEK_US) * _WEEK_US - _MONDAY_SHIFT_US


def streaming_retention(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    state_sink: dict | None = None,
):
    """Run the incremental retention fold over a JSONL event directory.

    ``state_sink`` receives ``(cohort_week, week_offset) -> count``
    increments via ``foreachBatch`` (each cell counted once per user
    ever, so summing across batches gives the triangle);
    ``availableNow`` drains and stops; restarts resume from the
    checkpoint with every user's cohort and emitted-set intact.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = event_stream(spark, events_dir)

    def update(key, pdfs, state):
        if state.exists:
            cohort_us, offsets = state.get
            seen = set(offsets)
        else:
            cohort_us, seen = None, set()
        ts_list = []
        for pdf in pdfs:
            ts_list.extend(pdf["ts"])
        ts_us = sorted(int(t.value // 1000) for t in ts_list)
        new_cells = []
        for t in ts_us:
            if cohort_us is None:
                cohort_us = _week_start_us(t)
            off = (_week_start_us(t) - cohort_us) // _WEEK_US
            if off >= 0 and off not in seen:
                seen.add(off)
                new_cells.append(off)
        state.update((cohort_us, sorted(seen)))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "cohort_week": pd.Timestamp(cohort_us, unit="us"),
                    "week_offset": off,
                }
                for off in new_cells
            ]
        )

    cells = stream.groupBy("user_id").applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if state_sink is None:
            return
        # foreachBatch is at-least-once: a trigger that fails after this
        # callback re-delivers the same batch_id on restart, and a +=
        # merge would double-count. Track consumed ids in the sink
        # itself so the replay is a no-op (the reserved key survives as
        # long as the caller's sink does — the same lifetime as the
        # counts it guards).
        done = state_sink.setdefault("_batches", set())
        if batch_id in done:
            return
        for r in (
            batch_df.groupBy("cohort_week", "week_offset")
            .count()
            .collect()
        ):
            k = (r["cohort_week"], r["week_offset"])
            state_sink[k] = state_sink.get(k, 0) + r["count"]
        done.add(batch_id)

    return (
        cells.writeStream.outputMode("append")
        .foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
