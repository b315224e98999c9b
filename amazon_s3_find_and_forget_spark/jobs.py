"""Event-sourced job log: emit, stats fold, status state machine, run_job.

The reference keeps one Job row plus append-only JobEvent rows keyed
``(Id, Sk="<epoch_millis>#<uuid>")`` in DynamoDB, folded by two lambdas:
- stats fold: sums 9 counters over events (jobs/stats_updater.py:27-120);
- status fold: ordered event names drive a locked state machine
  (jobs/status_updater.py:19-104).

Here the event log is a DataFrame (or a plain list for the driver-side
fold); the stats fold is a ``groupBy(Id).agg(sum(...))`` and the status
fold a pure function — both also usable under Structured Streaming
``foreachBatch`` (streaming/job_events.py).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- status state machine (parity: status_updater.py:19-51) ---------------

STATUS_MAP = {
    "FindPhaseFailed": "FIND_FAILED",
    "ForgetPhaseFailed": "FORGET_FAILED",
    "Exception": "FAILED",
    "JobStarted": "RUNNING",
    "ForgetPhaseEnded": "FORGET_COMPLETED_CLEANUP_IN_PROGRESS",
    "CleanupFailed": "COMPLETED_CLEANUP_FAILED",
    "CleanupSucceeded": "COMPLETED",
}

UNLOCKED_STATES = ["RUNNING", "QUEUED", "FORGET_COMPLETED_CLEANUP_IN_PROGRESS"]

SKIP_CLEANUP_STATES = [
    "FIND_FAILED",
    "FORGET_FAILED",
    "FAILED",
    "FORGET_PARTIALLY_FAILED",
]

TIME_STATUSES = {
    "JobStartTime": ["RUNNING"],
    "JobFinishTime": [
        "COMPLETED_CLEANUP_FAILED",
        "COMPLETED",
        "FAILED",
        "FIND_FAILED",
        "FORGET_FAILED",
        "FORGET_PARTIALLY_FAILED",
    ],
}

QUERY_EVENTS = ["QuerySucceeded", "QueryFailed"]
OBJECT_EVENTS = [
    "ObjectUpdated",
    "ObjectUpdateSkipped",
    "ObjectUpdateFailed",
    "ObjectRollbackFailed",
]

EVENT_SCHEMA = (
    "Id string, Sk string, EventName string, CreatedAt long, EventData string"
)


def make_event(job_id: str, name: str, data: dict | None = None, at: int | None = None):
    at = at if at is not None else int(time.time() * 1000)
    sk = f"{at}#{uuid.uuid4()}"  # parity: boto_utils.py:113
    import json

    return (job_id, sk, name, at, json.dumps(data or {}))


def fold_stats(events_df: DataFrame) -> DataFrame:
    """A5: sum the 9 job counters per job id — one hash aggregate.

    Parity: stats_updater.py:27-120. Query statistics arrive in EventData
    JSON as {"Statistics": {"DataScannedInBytes", "EngineExecutionTimeInMillis"}}.
    """
    name = F.col("EventName")
    stats = F.get_json_object(F.col("EventData"), "$.Statistics.DataScannedInBytes")
    millis = F.get_json_object(
        F.col("EventData"), "$.Statistics.EngineExecutionTimeInMillis"
    )
    one_if = lambda n: F.sum(F.when(name == n, 1).otherwise(0))  # noqa: E731
    return events_df.groupBy("Id").agg(
        F.sum(F.when(name.isin(QUERY_EVENTS), 1).otherwise(0)).alias(
            "TotalQueryCount"
        ),
        one_if("QuerySucceeded").alias("TotalQuerySucceededCount"),
        one_if("QueryFailed").alias("TotalQueryFailedCount"),
        F.sum(
            F.when(name.isin(QUERY_EVENTS), stats.cast("long")).otherwise(0)
        ).alias("TotalQueryScannedInBytes"),
        F.sum(
            F.when(name.isin(QUERY_EVENTS), millis.cast("long")).otherwise(0)
        ).alias("TotalQueryTimeInMillis"),
        one_if("ObjectUpdated").alias("TotalObjectUpdatedCount"),
        one_if("ObjectUpdateSkipped").alias("TotalObjectUpdateSkippedCount"),
        one_if("ObjectUpdateFailed").alias("TotalObjectUpdateFailedCount"),
        one_if("ObjectRollbackFailed").alias("TotalObjectRollbackFailedCount"),
    )


def fold_counters(events: list[dict]) -> dict:
    """A5, driver-side: the 9 job counters from a plain event list.

    Same fold as ``fold_stats`` (stats_updater.py:27-120) for when the
    events are already on the driver — a job emits O(files) events, so
    this never needs a cluster.
    """
    c = {
        "TotalQueryCount": 0,
        "TotalQuerySucceededCount": 0,
        "TotalQueryFailedCount": 0,
        "TotalQueryScannedInBytes": 0,
        "TotalQueryTimeInMillis": 0,
        "TotalObjectUpdatedCount": 0,
        "TotalObjectUpdateSkippedCount": 0,
        "TotalObjectUpdateFailedCount": 0,
        "TotalObjectRollbackFailedCount": 0,
    }
    for ev in events:
        name = ev["EventName"]
        data = ev.get("EventData") or {}
        if name in QUERY_EVENTS:
            c["TotalQueryCount"] += 1
            stats = data.get("Statistics") or {}
            c["TotalQueryScannedInBytes"] += int(
                stats.get("DataScannedInBytes", 0)
            )
            c["TotalQueryTimeInMillis"] += int(
                stats.get("EngineExecutionTimeInMillis", 0)
            )
        if name == "QuerySucceeded":
            c["TotalQuerySucceededCount"] += 1
        elif name == "QueryFailed":
            c["TotalQueryFailedCount"] += 1
        elif name == "ObjectUpdated":
            c["TotalObjectUpdatedCount"] += 1
        elif name == "ObjectUpdateSkipped":
            c["TotalObjectUpdateSkippedCount"] += 1
        elif name == "ObjectUpdateFailed":
            c["TotalObjectUpdateFailedCount"] += 1
        elif name == "ObjectRollbackFailed":
            c["TotalObjectRollbackFailedCount"] += 1
    return c


def fold_status(
    events: list[dict],
    counters: dict | None = None,
    initial: dict | None = None,
) -> dict:
    """A6: fold ordered events into {JobStatus, JobStartTime, JobFinishTime}.

    ``events``: [{"EventName","CreatedAt"}] in Sk order. ``counters``
    supplies the error counts used to derive FORGET_PARTIALLY_FAILED
    (status_updater.py:85-104). ``initial`` resumes from a prior fold's
    output (incremental/streaming use) — locked terminal states stay
    locked across batches.
    """
    counters = counters or {}
    out: dict = dict(initial or {})
    for ev in events:
        name = ev["EventName"]
        if name not in STATUS_MAP:
            continue
        new_status = STATUS_MAP[name]
        if name == "ForgetPhaseEnded" and (
            counters.get("TotalObjectUpdateFailedCount", 0) > 0
            or counters.get("TotalQueryFailedCount", 0) > 0
        ):
            new_status = "FORGET_PARTIALLY_FAILED"
        if not out.get("JobStatus") or out.get("JobStatus") in UNLOCKED_STATES:
            out["JobStatus"] = new_status
        for attr, statuses in TIME_STATUSES.items():
            if new_status in statuses and not out.get(attr):
                out[attr] = ev["CreatedAt"]
    return out


def list_events(
    events_df: DataFrame, job_id: str, watermark: str = "0", page_size: int = 20
) -> DataFrame:
    """W1: event-time ordered page forward from a Sk watermark."""
    return (
        events_df.where(F.col("Id") == job_id)
        .where(F.col("Sk") > watermark)
        .orderBy("Sk")
        .limit(page_size)
    )


def list_jobs(jobs_df: DataFrame, page_size: int = 10) -> DataFrame:
    """O1: newest-first top-K job listing."""
    return jobs_df.orderBy(F.desc("CreatedAt")).limit(page_size)


# --- end-to-end job runner ------------------------------------------------


@dataclass
class JobResult:
    job_id: str
    status: str
    file_stats: list = field(default_factory=list)
    events: list = field(default_factory=list)
    counters: dict = field(default_factory=dict)


def run_job(
    spark: SparkSession,
    mappers: list,
    queue_items: list,
    job_id: str | None = None,
    kms=None,
    manifest_dir: str | None = None,
    query_max_retries: int = 2,
    forget_parallelism: int | None = None,
    path_handoff_threshold: int = 100_000,
    manifest_table: str | None = None,
    store_factory=None,
) -> JobResult:
    """The whole deletion-job lifecycle as one driver program.

    Replaces the reference's 3 state machines / 8 lambdas / 2 queues
    (SURVEY.md §3.1): find affected files per mapper (broadcast semi-join
    or pushed predicates), surgically rewrite them, fold events into
    stats + status.

    Find->Forget handoff is hybrid: up to ``path_handoff_threshold``
    affected objects take the list path (driver-side paths, per-object
    events — reference parity, one SQS message per object). Above it the
    affected-path relation stays a DataFrame end to end
    (``forget_files_df``): the rewrite fans out via ``mapInPandas``, stats
    aggregate distributively, and only the per-status rollup reaches the
    driver — no driver-memory ceiling at millions of objects. Large jobs
    get per-status summary events instead of per-object ones.
    """
    from .matches import build_column_groups, route_items
    from .plans.find import find_affected_files
    from .plans.forget import forget_files, forget_files_df

    job_id = job_id or str(uuid.uuid4())
    events: list = []
    emit = lambda name, data=None: events.append(  # noqa: E731
        {"EventName": name, "CreatedAt": int(time.time() * 1000), "EventData": data or {}}
    )
    emit("JobStarted")
    all_stats: list = []
    counters: dict = {"TotalObjectUpdateFailedCount": 0, "TotalQueryFailedCount": 0}
    try:
        for mapper in mappers:
            routed = route_items(queue_items, mapper.mapper_id)
            if not routed:
                continue
            df = mapper.read(spark, kms=kms)
            groups = build_column_groups(
                df.schema, mapper.columns, routed
            )
            if manifest_dir or manifest_table:
                # the auditable stringified manifest, partitioned like the
                # reference's Glue JSONL manifest table (S7,
                # generate_queries.py:223-225 + templates/manifests.yaml)
                from .matches import (
                    build_manifest_df,
                    register_manifest_table,
                    write_manifest,
                )

                mdf = build_manifest_df(
                    spark, job_id, mapper.mapper_id, mapper.columns, routed
                )
                if manifest_dir:
                    write_manifest(mdf, manifest_dir)
                if manifest_table:
                    # catalog registration (generate_queries.py:288-326)
                    register_manifest_table(mdf, manifest_table)
            paths = None
            for attempt in range(query_max_retries + 1):
                # bounded retry budget, the AthenaQueryMaxRetries analog
                # (check_query_status.py:9-27 + state_machine.yaml:204-224);
                # Spark's own task retries handle executor-level failures,
                # this guards whole-query failures
                try:
                    # probe one past the threshold: a small job gets its
                    # complete list, a large one only proves it is large
                    paths = [
                        r[0]
                        for r in find_affected_files(df, groups)
                        .limit(path_handoff_threshold + 1)
                        .collect()
                    ]
                    emit("QuerySucceeded", {"DataMapperId": mapper.mapper_id})
                    break
                except Exception as e:  # noqa: BLE001
                    if attempt < query_max_retries:
                        # transient failure with retries left: record the
                        # attempt WITHOUT failing the query — the reference
                        # emits the error event only once the budget is
                        # exhausted (state_machine.yaml 'Retriable?' ->
                        # 'Emit Error'), so a recovered retry can still end
                        # in a clean COMPLETED job
                        emit(
                            "QueryRetried",
                            {"Error": str(e), "Attempt": attempt},
                        )
                    else:
                        counters["TotalQueryFailedCount"] += 1
                        emit(
                            "QueryFailed",
                            {"Error": str(e), "Attempt": attempt},
                        )
            if paths is None:
                # fail fast: a Find failure past its retry budget abandons
                # the job (parity: work_query_queue.py:38-42)
                emit("FindPhaseFailed")
                folded = fold_status(events, counters)
                return JobResult(
                    job_id=job_id,
                    status=folded.get("JobStatus", "FIND_FAILED"),
                    file_stats=all_stats,
                    events=events,
                    counters=counters,
                )
            if len(paths) <= path_handoff_threshold:
                stats = forget_files(
                    spark,
                    paths,
                    groups,
                    fmt=mapper.format,
                    ignore_not_found=mapper.ignore_object_not_found,
                    delete_old_versions=mapper.delete_old_versions,
                    kms=kms,
                    parallelism=forget_parallelism,
                    # cross-account mappers: each rewrite task builds its
                    # client from the ARN (reference main.py:140,154)
                    role_arn=getattr(mapper, "role_arn", ""),
                    store_factory=store_factory,
                    redact_columns=mapper.effective_redact_columns(),
                )
                all_stats.extend(stats)
                stats_rel = None
            else:
                # large-job path: the affected-path relation never leaves
                # the cluster; stats aggregate distributively below
                stats = None
                stats_rel = forget_files_df(
                    spark,
                    find_affected_files(df, groups),
                    groups,
                    fmt=mapper.format,
                    ignore_not_found=mapper.ignore_object_not_found,
                    delete_old_versions=mapper.delete_old_versions,
                    kms=kms,
                    parallelism=forget_parallelism,
                    role_arn=getattr(mapper, "role_arn", ""),
                    store_factory=store_factory,
                    redact_columns=mapper.effective_redact_columns(),
                )
            # the rewrite changed files behind Spark's back — drop any
            # cached file listing / metadata so subsequent reads in this
            # session see the new objects (S3's analog is read-after-write
            # consistency; Spark's is the catalog file-index cache)
            if mapper.location.startswith("table:"):
                spark.catalog.refreshTable(mapper.location[len("table:") :])
            else:
                spark.catalog.refreshByPath(mapper.location)
            if stats is not None:
                for row in stats:
                    status = row[4]
                    if status == "updated":
                        emit("ObjectUpdated", {"Object": row[0]})
                    elif status == "skipped":
                        emit("ObjectUpdateSkipped", {"Object": row[0]})
                    elif status == "rollback_failed":
                        counters["TotalObjectUpdateFailedCount"] += 1
                        emit("ObjectUpdateFailed", {"Object": row[0], "Error": row[5]})
                        emit("ObjectRollbackFailed", {"Object": row[0], "Error": row[5]})
                    else:
                        counters["TotalObjectUpdateFailedCount"] += 1
                        emit("ObjectUpdateFailed", {"Object": row[0], "Error": row[5]})
            else:
                # per-status rollup, computed on the cluster; only a handful
                # of rows ever reach the driver for a large job
                rollup = (
                    stats_rel.groupBy("status")
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum("processed_rows").alias("processed"),
                        F.sum("deleted_rows").alias("deleted"),
                        F.max("error").alias("sample_error"),
                    )
                    .collect()
                )
                for r in rollup:
                    data = {
                        "Status": r["status"],
                        "Objects": int(r["n"]),
                        "ProcessedRows": int(r["processed"] or 0),
                        "DeletedRows": int(r["deleted"] or 0),
                    }
                    if r["sample_error"]:
                        data["SampleError"] = r["sample_error"]
                    emit("ObjectUpdateSummary", data)
                    if r["status"] not in ("updated", "skipped"):
                        counters["TotalObjectUpdateFailedCount"] += int(r["n"])
                all_stats.append(
                    (
                        mapper.mapper_id,
                        mapper.format,
                        sum(int(r["processed"] or 0) for r in rollup),
                        sum(int(r["deleted"] or 0) for r in rollup),
                        "summary",
                        None,
                    )
                )
        emit("ForgetPhaseEnded")
        if (
            counters["TotalObjectUpdateFailedCount"] == 0
            and counters["TotalQueryFailedCount"] == 0
        ):
            emit("CleanupSucceeded")
    except Exception as e:  # noqa: BLE001
        emit("Exception", {"Error": str(e)})
    folded = fold_status(events, counters)
    return JobResult(
        job_id=job_id,
        status=folded.get("JobStatus", "QUEUED"),
        file_stats=all_stats,
        events=events,
        counters=counters,
    )
