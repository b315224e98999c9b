"""Streaming job-event fold (ST1-ST4) + listing APIs (W1/O1)."""

import json
import os
from datetime import timedelta

from pyspark.sql import functions as F

from amazon_s3_find_and_forget_spark.jobs import (
    fold_stats,
    list_events,
    list_jobs,
    make_event,
)
from amazon_s3_find_and_forget_spark.matches import MANIFEST_SCHEMA
from amazon_s3_find_and_forget_spark.streaming.job_events import (
    JobStateStore,
    cleanup_queue,
    stream_fold,
)


def write_events(path, events):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "batch.json"), "w") as f:
        for e in events:
            f.write(
                json.dumps(
                    {
                        "Id": e[0],
                        "Sk": e[1],
                        "EventName": e[2],
                        "CreatedAt": e[3],
                        "EventData": e[4],
                    }
                )
                + "\n"
            )


def test_windowed_stream_matches_batch(spark, tmp_path, sf_dir):
    """Streaming hourly windows (watermark + append mode) produce the
    same closed-window rows as the batch aggregation."""
    from amazon_s3_find_and_forget_spark import entry_queries
    from amazon_s3_find_and_forget_spark.streaming import windows

    ev = entry_queries.load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    src = str(tmp_path / "ev_src")
    ev.coalesce(2).write.parquet(src)
    stream = windows.hourly_counts_stream(
        spark, src, spark.read.parquet(src).schema
    )
    assert stream.isStreaming
    out = str(tmp_path / "ev_out")
    windows.run_to_table(stream, str(tmp_path / "ckpt"), out)

    got = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    batch = windows.hourly_counts(ev)
    max_ts = ev.agg(F.max("ts")).head()[0]
    # append mode only emits windows the final watermark closed
    expected = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
        if r.hour <= max_ts - timedelta(hours=3)
    }
    assert expected  # the synthetic feed spans enough hours to close some
    for k, v in expected.items():
        assert got[k] == v


def test_screen_stream_flags_only_new_matching_files(spark, tmp_path, sf_dir):
    """Incremental Find: files landing after the first drain are screened
    exactly once; the log's distinct file set equals the batch Find."""
    import shutil

    from amazon_s3_find_and_forget_spark.matches import (
        QueueItem,
        build_column_groups,
    )
    from amazon_s3_find_and_forget_spark.plans.find import find_affected_files
    from amazon_s3_find_and_forget_spark.streaming import screen

    lake = tmp_path / "lake"
    lake.mkdir()
    src = os.path.join(sf_dir, "nation.parquet")
    shutil.copy(src, lake / "a.parquet")
    static = spark.read.parquet(str(lake))
    groups = build_column_groups(
        static.schema, ["n_nationkey"], [QueueItem(match_id=3)]
    )

    stream = screen.screen_stream(spark, str(lake), static.schema, groups)
    assert stream.isStreaming
    ckpt, log = str(tmp_path / "ckpt"), str(tmp_path / "log")
    screen.run_screen_to_log(stream, ckpt, log)
    first = spark.read.parquet(log)
    assert first.count() == 1  # one matching row in the landed file

    # a second file lands; re-drain picks up ONLY the new file
    shutil.copy(src, lake / "b.parquet")
    screen.run_screen_to_log(
        screen.screen_stream(spark, str(lake), static.schema, groups),
        ckpt,
        log,
    )
    logged = spark.read.parquet(log)
    assert logged.count() == 2
    flagged = {
        r.file_path for r in logged.select("file_path").distinct().collect()
    }
    batch = {
        r.file_path
        for r in find_affected_files(
            spark.read.parquet(str(lake)), groups
        ).collect()
    }
    assert flagged == batch and len(flagged) == 2


def test_stream_fold_stats_and_status(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    evs = [
        make_event("j1", "JobStarted", at=1000),
        make_event("j1", "QuerySucceeded", {"Statistics": {"DataScannedInBytes": 64, "EngineExecutionTimeInMillis": 10}}, at=2000),
        make_event("j1", "ObjectUpdated", at=3000),
        make_event("j1", "ForgetPhaseEnded", at=4000),
        make_event("j1", "CleanupSucceeded", at=5000),
        make_event("j2", "JobStarted", at=1500),
        make_event("j2", "QueryFailed", at=2500),
        make_event("j2", "ForgetPhaseEnded", at=3500),
    ]
    write_events(events_dir, evs)
    state = JobStateStore()
    cleaned = []
    q = stream_fold(spark, events_dir, ckpt, state, queue_cleanup=cleaned.append)
    q.awaitTermination(60)

    assert state.stats["j1"]["TotalQueryScannedInBytes"] == 64
    assert state.stats["j1"]["TotalObjectUpdatedCount"] == 1
    assert state.status["j1"]["JobStatus"] == "COMPLETED"
    assert state.status["j1"]["JobStartTime"] == 1000
    assert state.status["j1"]["JobFinishTime"] == 5000
    # j2: failed query -> ForgetPhaseEnded derives FORGET_PARTIALLY_FAILED
    assert state.status["j2"]["JobStatus"] == "FORGET_PARTIALLY_FAILED"
    assert cleaned == ["j1"]


def test_stream_fold_incremental(spark, tmp_path):
    """Second batch continues from checkpoint — no double counting."""
    events_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    write_events(events_dir, [make_event("j1", "ObjectUpdated", at=1000)])
    state = JobStateStore()
    stream_fold(spark, events_dir, ckpt, state).awaitTermination(60)
    assert state.stats["j1"]["TotalObjectUpdatedCount"] == 1

    with open(os.path.join(events_dir, "batch2.json"), "w") as f:
        e = make_event("j1", "ObjectUpdated", at=2000)
        f.write(
            json.dumps(
                {"Id": e[0], "Sk": e[1], "EventName": e[2], "CreatedAt": e[3], "EventData": e[4]}
            )
            + "\n"
        )
    stream_fold(spark, events_dir, ckpt, state).awaitTermination(60)
    assert state.stats["j1"]["TotalObjectUpdatedCount"] == 2


def test_cleanup_queue(spark):
    queue = spark.createDataFrame(
        [("i1", "12345"), ("i2", "67890"), ("i3", "11111")],
        "DeletionQueueItemId string, MatchId string",
    )
    manifest = spark.createDataFrame(
        [(["c"], ["12345"], "i1", 1, "c", "12345", "j1", "m1"),
         (["c"], ["67890"], "i2", 1, "c", "67890", "j1", "m1")],
        MANIFEST_SCHEMA,
    )
    remaining = cleanup_queue(queue, manifest)
    assert [r.DeletionQueueItemId for r in remaining.collect()] == ["i3"]


def test_list_events_pagination(spark):
    rows = [
        ("j1", f"{1000 + i}#u{i}", "ObjectUpdated", 1000 + i, "{}")
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "Id string, Sk string, EventName string, CreatedAt long, EventData string"
    )
    page1 = list_events(df, "j1", watermark="0", page_size=4).collect()
    assert len(page1) == 4
    page2 = list_events(df, "j1", watermark=page1[-1].Sk, page_size=4).collect()
    assert len(page2) == 4
    assert page2[0].Sk > page1[-1].Sk


def test_list_jobs_topk(spark):
    df = spark.createDataFrame(
        [(f"j{i}", i) for i in range(20)], "Id string, CreatedAt long"
    )
    top = list_jobs(df, page_size=5).collect()
    assert [r.Id for r in top] == ["j19", "j18", "j17", "j16", "j15"]


def test_fold_stats_multiple_jobs(spark):
    evs = [
        make_event("a", "QuerySucceeded", {"Statistics": {"DataScannedInBytes": 10, "EngineExecutionTimeInMillis": 5}}),
        make_event("a", "QueryFailed"),
        make_event("b", "ObjectUpdateFailed"),
    ]
    df = spark.createDataFrame(
        evs, "Id string, Sk string, EventName string, CreatedAt long, EventData string"
    )
    out = {r.Id: r.asDict() for r in fold_stats(df).collect()}
    assert out["a"]["TotalQueryCount"] == 2
    assert out["a"]["TotalQuerySucceededCount"] == 1
    assert out["a"]["TotalQueryScannedInBytes"] == 10
    assert out["b"]["TotalObjectUpdateFailedCount"] == 1


def test_stateful_fold_incremental_across_restarts(spark, tmp_path):
    """applyInPandasWithState fold: state survives checkpointed restarts."""
    import json

    from amazon_s3_find_and_forget_spark.streaming.job_events import (
        stateful_fold,
    )

    events_dir = tmp_path / "events"
    ckpt = str(tmp_path / "ckpt")
    events_dir.mkdir()

    def write_batch(fname, rows):
        with open(events_dir / fname, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def ev(job, sk, name, data=None):
        return {"Id": job, "Sk": sk, "EventName": name,
                "CreatedAt": int(sk.split("#")[0]),
                "EventData": json.dumps(data or {})}

    # batch 1: job A starts and succeeds a query; job B starts
    write_batch("b1.jsonl", [
        ev("A", "1000#a", "JobStarted"),
        ev("A", "2000#b", "QuerySucceeded",
           {"Statistics": {"DataScannedInBytes": 111,
                           "EngineExecutionTimeInMillis": 5}}),
        ev("B", "1500#c", "JobStarted"),
    ])
    sink = {}
    q = stateful_fold(spark, str(events_dir), ckpt, state_sink=sink)
    q.awaitTermination(120)
    assert sink["A"]["JobStatus"] == "RUNNING"
    assert sink["A"]["TotalQuerySucceededCount"] == 1
    assert sink["A"]["TotalQueryScannedInBytes"] == 111
    assert sink["B"]["JobStatus"] == "RUNNING"

    # batch 2 (restart from checkpoint): job A finishes cleanly
    write_batch("b2.jsonl", [
        ev("A", "3000#d", "ObjectUpdated"),
        ev("A", "4000#e", "ForgetPhaseEnded"),
        ev("A", "5000#f", "CleanupSucceeded"),
    ])
    q2 = stateful_fold(spark, str(events_dir), ckpt, state_sink=sink)
    q2.awaitTermination(120)
    # counters are cumulative across batches, not recomputed from scratch
    assert sink["A"]["TotalQuerySucceededCount"] == 1
    assert sink["A"]["TotalObjectUpdatedCount"] == 1
    assert sink["A"]["JobStatus"] == "COMPLETED"
    assert sink["A"]["JobFinishTime"] == 5000

    # batch 3: a late event can NOT unlock the terminal status
    write_batch("b3.jsonl", [ev("A", "6000#g", "JobStarted")])
    q3 = stateful_fold(spark, str(events_dir), ckpt, state_sink=sink)
    q3.awaitTermination(120)
    assert sink["A"]["JobStatus"] == "COMPLETED"


def test_stream_dedup_keeps_first_arrival(spark, tmp_path, sf_dir):
    """Streaming content dedup drops later duplicates within the
    horizon and keeps exactly one survivor per distinct text."""
    from amazon_s3_find_and_forget_spark import entry_queries
    from amazon_s3_find_and_forget_spark.streaming import dedup as sdedup

    docs = (
        entry_queries.load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 40)
        .select(
            "doc_id",
            "text",
            F.expr("timestamp_micros(cast(1700000000000000 + doc_id * 1000000 as long))").alias("ts"),
        )
    )
    src = str(tmp_path / "docs_src")
    # second batch re-lands 20 of the same texts under new ids/times
    dup = docs.where(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        "text",
        F.expr("ts + interval 10 minutes").alias("ts"),
    )
    docs.coalesce(1).write.parquet(src)
    dup.coalesce(1).write.mode("append").parquet(src)

    stream = sdedup.dedup_stream(
        spark, src, spark.read.parquet(src).schema, dedup_horizon="1 hour"
    )
    assert stream.isStreaming
    out = str(tmp_path / "docs_out")
    sdedup.run_to_table(stream, str(tmp_path / "dedup_ckpt"), out)

    kept = spark.read.parquet(out)
    n_distinct = docs.unionByName(dup).select("text").distinct().count()
    assert kept.count() == n_distinct
    assert kept.select("content_hash").distinct().count() == n_distinct
    # survivors are the first arrivals: none of the re-landed ids remain
    assert kept.where(F.col("doc_id") >= 1000).count() == 0


def test_curation_ops_compose_with_streams(spark, tmp_path, sf_dir):
    """The map-only curation operators (chunking, redaction, lang-id,
    token counts) apply to a streaming DataFrame unchanged — stateless
    expression pipelines are engine-checked as stream-compatible, so the
    batch curation code IS the streaming curation code."""
    import os

    from amazon_s3_find_and_forget_spark.operators import text

    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.limit(50).write.parquet(os.path.join(src_dir, "batch0"))

    stream = spark.readStream.schema(docs.schema).parquet(src_dir + "/*")
    chunked = text.chunk_documents(
        text.redact_pii(stream).withColumnRenamed("text_redacted", "text2")
        .drop("text").withColumnRenamed("text2", "text"),
        max_tokens=32,
        overlap=8,
    )
    q = (
        chunked.writeStream.format("memory")
        .queryName("curated_chunks")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from curated_chunks").collect()
    # same rows as the batch plan over the same files
    want = text.chunk_documents(
        text.redact_pii(spark.read.schema(docs.schema).parquet(src_dir + "/*"))
        .withColumnRenamed("text_redacted", "text2")
        .drop("text").withColumnRenamed("text2", "text"),
        max_tokens=32,
        overlap=8,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0


def test_session_window_stream_matches_batch(spark, tmp_path, sf_dir):
    """Sessionization (built-in session_window) yields identical sessions
    on the static frame and on the drained stream over the same files."""
    import os

    from amazon_s3_find_and_forget_spark.entry_queries import load
    from amazon_s3_find_and_forget_spark.streaming import windows as W

    src = str(tmp_path / "events_in")
    os.makedirs(src)
    ev = load(spark, sf_dir, "events").where(F.col("user_id") < 20)
    ev.write.parquet(os.path.join(src, "batch0"))

    batch = W.session_aggregate(
        spark.read.parquet(src + "/*"), gap="30 minutes"
    ).collect()

    stream_df = W.session_aggregate_stream(
        spark, src + "/*", ev.schema, gap="30 minutes"
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    W.run_to_table(stream_df, ckpt, out_dir)
    got = spark.read.parquet(out_dir).collect()

    # append mode emits a session once the watermark passes its close;
    # after an availableNow drain the watermark rests at
    # max(event time) - late_threshold, so sessions closing inside that
    # final window are (correctly) still held in state
    max_ts = max(r.session_end for r in batch)
    import datetime as _dt

    horizon = max_ts - _dt.timedelta(hours=2)
    emitted = [r for r in batch if r.session_end <= horizon]
    assert sorted(map(tuple, got)) == sorted(map(tuple, emitted))
    assert len(got) > 0
    # sessions are disjoint per user and separated by > gap
    by_user = {}
    for r in batch:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    import datetime

    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 >= e1  # session_end includes the closing gap


def test_forget_queue_stream_drains_exactly_once(spark, tmp_path):
    """Queued matches stream into per-batch deletion jobs; the rewrite
    hits the lake, and a second run over the same checkpoint reprocesses
    nothing (exactly-once queue discovery)."""
    import shutil

    from amazon_s3_find_and_forget_spark.data_mappers import DataMapper
    from amazon_s3_find_and_forget_spark.streaming.forget_queue import (
        forget_queue_stream,
    )

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    shutil.copy(
        "/root/testdata/sf0.001/lineitem.parquet",
        os.path.join(lake, "part-0.parquet"),
    )
    before = spark.read.parquet(lake)
    keys = [r[0] for r in before.select("l_orderkey").distinct().limit(2).collect()]
    n_match = before.where(F.col("l_orderkey").isin(keys)).count()
    n_total = before.count()
    assert n_match > 0

    queue_dir = str(tmp_path / "queue")
    os.makedirs(queue_dir)
    with open(os.path.join(queue_dir, "items-0.json"), "w") as f:
        for k in keys:
            f.write(
                json.dumps(
                    {
                        "match_id": int(k),
                        "data_mapper_id": "lineitem",
                        "composite": False,
                    }
                )
                + "\n"
            )

    mapper = DataMapper("lineitem", lake, ["l_orderkey"], format="parquet")
    ckpt = str(tmp_path / "ckpt")
    handle = forget_queue_stream(
        spark, [mapper], queue_dir, ckpt, available_now=True
    )
    handle.await_termination(120)
    done = [j for j in handle.jobs if j.n_items]
    assert len(done) == 1 and done[0].n_items == 2
    assert done[0].result.status == "COMPLETED"
    after = spark.read.parquet(lake)
    assert after.count() == n_total - n_match
    assert after.where(F.col("l_orderkey").isin(keys)).count() == 0

    # second run, same checkpoint, queue unchanged -> no batch reprocessed
    handle2 = forget_queue_stream(
        spark, [mapper], queue_dir, ckpt, available_now=True
    )
    handle2.await_termination(120)
    assert [j.n_items for j in handle2.jobs if j.n_items] == []

    # a NEW queue file is picked up incrementally
    more = [r[0] for r in spark.read.parquet(lake)
            .select("l_orderkey").distinct().limit(1).collect()]
    with open(os.path.join(queue_dir, "items-1.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "match_id": int(more[0]),
                    "data_mapper_id": "lineitem",
                    "composite": False,
                }
            )
            + "\n"
        )
    handle3 = forget_queue_stream(
        spark, [mapper], queue_dir, ckpt, available_now=True
    )
    handle3.await_termination(120)
    done3 = [j for j in handle3.jobs if j.n_items]
    assert len(done3) == 1 and done3[0].n_items == 1
    final = spark.read.parquet(lake)
    assert final.where(F.col("l_orderkey") == more[0]).count() == 0


def test_forget_queue_stream_composite_match(spark, tmp_path):
    """A composite queue row (JSON-encoded column/value tuples) streams
    through to a composite deletion against the orders lake."""
    import shutil

    from amazon_s3_find_and_forget_spark.data_mappers import DataMapper
    from amazon_s3_find_and_forget_spark.streaming.forget_queue import (
        forget_queue_stream,
    )

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    shutil.copy(
        "/root/testdata/sf0.001/orders.parquet",
        os.path.join(lake, "part-0.parquet"),
    )
    before = spark.read.parquet(lake)
    combo = before.select("o_orderstatus", "o_orderpriority").first()
    pred = (F.col("o_orderstatus") == combo[0]) & (
        F.col("o_orderpriority") == combo[1]
    )
    n_match = before.where(pred).count()
    n_total = before.count()
    assert n_match > 0

    queue_dir = str(tmp_path / "queue")
    os.makedirs(queue_dir)
    with open(os.path.join(queue_dir, "item.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "match_id": json.dumps(
                        [
                            {"Column": "o_orderstatus", "Value": combo[0]},
                            {"Column": "o_orderpriority", "Value": combo[1]},
                        ]
                    ),
                    "data_mapper_id": "orders",
                    "composite": True,
                }
            )
            + "\n"
        )
    mapper = DataMapper(
        "orders", lake, ["o_orderstatus", "o_orderpriority"], format="parquet"
    )
    handle = forget_queue_stream(
        spark, [mapper], queue_dir, str(tmp_path / "ckpt"), available_now=True
    )
    handle.await_termination(120)
    done = [j for j in handle.jobs if j.n_items]
    assert len(done) == 1 and done[0].result.status == "COMPLETED"
    after = spark.read.parquet(lake)
    assert after.count() == n_total - n_match
    assert after.where(pred).count() == 0


def test_streaming_funnel_advances_across_restarts(spark, tmp_path):
    """Per-user funnel frontier lives in the state store: each drained
    batch advances the greedy matcher, restarts resume exactly."""
    import json

    from amazon_s3_find_and_forget_spark.streaming.funnel import (
        streaming_funnel,
    )

    events_dir = tmp_path / "events"
    ckpt = str(tmp_path / "ckpt")
    events_dir.mkdir()

    def write_batch(fname, rows):
        with open(events_dir / fname, "w") as f:
            for i, (u, ts, ty) in enumerate(rows):
                f.write(
                    json.dumps(
                        {
                            "event_id": i,
                            "ts": ts,
                            "user_id": u,
                            "event_type": ty,
                            "value": 1.0,
                            "props": "{}",
                        }
                    )
                    + "\n"
                )

    steps = ["view", "click", "purchase"]
    # batch 1: user 1 does view+click (click first in file — batch
    # matching must sort by ts); user 2 only view; user 3 noise
    write_batch(
        "b1.jsonl",
        [
            (1, "2024-01-01T10:01:00", "click"),
            (1, "2024-01-01T10:00:00", "view"),
            (2, "2024-01-01T10:00:00", "view"),
            (3, "2024-01-01T10:00:00", "error"),
        ],
    )
    sink = {}
    q = streaming_funnel(spark, str(events_dir), ckpt, steps, state_sink=sink)
    q.awaitTermination(120)
    assert sink[1][0] == 2
    assert sink[2][0] == 1
    assert sink[3][0] == 0

    # batch 2 (restart): user 1 purchases -> completes; user 2 sends a
    # LATE view dated before their frontier -> depth unchanged
    write_batch(
        "b2.jsonl",
        [
            (1, "2024-01-01T10:02:00", "purchase"),
            (2, "2024-01-01T09:00:00", "click"),
        ],
    )
    sink2 = {}
    q2 = streaming_funnel(spark, str(events_dir), ckpt, steps, state_sink=sink2)
    q2.awaitTermination(120)
    assert sink2[1][0] == 3
    # user 2's click predates the matched view -> strictly-after fails
    assert sink2[2][0] == 1


def test_streaming_funnel_agrees_with_batch_operator(spark, tmp_path, sf_dir):
    """On an in-order stream, the incremental funnel's final depths imply
    the same per-step user counts as the batch operator."""
    import json

    from amazon_s3_find_and_forget_spark.operators import funnel as bfunnel
    from amazon_s3_find_and_forget_spark.streaming.funnel import (
        streaming_funnel,
    )
    from amazon_s3_find_and_forget_spark.entry_queries import load

    steps = ["view", "click", "purchase"]
    ev = (
        load(spark, sf_dir, "events")
        .where("user_id is not null and ts is not null")
        .orderBy("ts")
        .limit(300)
    )
    rows = ev.collect()
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    with open(events_dir / "all.jsonl", "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {
                        "event_id": r.event_id,
                        "ts": r.ts.isoformat(),
                        "user_id": r.user_id,
                        "event_type": r.event_type,
                        "value": 1.0,
                        "props": "{}",
                    }
                )
                + "\n"
            )
    sink = {}
    q = streaming_funnel(
        spark, str(events_dir), str(tmp_path / "ckpt"), steps, state_sink=sink
    )
    q.awaitTermination(120)
    batch_df = spark.createDataFrame(
        [(r.user_id, r.ts, r.event_type) for r in rows],
        "user_id long, ts timestamp, event_type string",
    )
    expect = {
        r.step: r.users for r in bfunnel.funnel_counts(batch_df, steps).collect()
    }
    got = {
        i + 1: sum(1 for d, _ in sink.values() if d >= i + 1)
        for i in range(len(steps))
    }
    assert got == expect


def test_streaming_retention_agrees_with_batch(spark, tmp_path, sf_dir):
    """The incremental retention cells, summed per (cohort, offset),
    reproduce the batch triangle on an in-order stream — including
    across a checkpointed restart."""
    import json

    from amazon_s3_find_and_forget_spark.operators import funnel as bfunnel
    from amazon_s3_find_and_forget_spark.streaming.retention import (
        streaming_retention,
    )
    from amazon_s3_find_and_forget_spark.entry_queries import load

    ev = (
        load(spark, sf_dir, "events")
        .where("user_id is not null and ts is not null")
        .orderBy("ts")
        .limit(400)
    )
    rows = ev.collect()
    events_dir = tmp_path / "events"
    events_dir.mkdir()

    def dump(fname, chunk):
        with open(events_dir / fname, "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {
                            "event_id": r.event_id,
                            "ts": r.ts.isoformat(),
                            "user_id": r.user_id,
                            "event_type": r.event_type,
                            "value": 1.0,
                            "props": "{}",
                        }
                    )
                    + "\n"
                )

    # split in-order stream across two drained runs (restart in between)
    dump("b1.jsonl", rows[:200])
    sink = {}
    ckpt = str(tmp_path / "ckpt")
    q = streaming_retention(spark, str(events_dir), ckpt, state_sink=sink)
    q.awaitTermination(120)
    dump("b2.jsonl", rows[200:])
    q2 = streaming_retention(spark, str(events_dir), ckpt, state_sink=sink)
    q2.awaitTermination(120)

    batch_df = spark.createDataFrame(
        [(r.user_id, r.ts) for r in rows], "user_id long, ts timestamp"
    )
    expect = {
        (r.cohort_week, r.week_offset): r.active_users
        for r in bfunnel.cohort_retention(batch_df).collect()
    }
    cells = {k: v for k, v in sink.items() if k != "_batches"}
    assert cells == expect


def test_streaming_heavy_hitters_no_false_negatives_and_restart(
    spark, tmp_path
):
    """Misra-Gries summaries in the state store: bounded state, the heavy
    key always survives eviction pressure, restarts resume from the
    checkpointed summaries."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from amazon_s3_find_and_forget_spark.streaming.heavy_hitters import (
        heavy_hitters_stream,
        run_to_sink,
    )

    events_dir = tmp_path / "keys"
    ckpt = str(tmp_path / "ckpt")
    events_dir.mkdir()
    schema = "k string"

    def write_batch(fname, keys):
        pq.write_table(
            pa.table({"k": pa.array(keys, pa.string())}),
            str(events_dir / fname),
        )

    # ONE group so eviction pressure is real: capacity 4, 50 distinct
    # cold keys + a hot key at ~40% mass
    cold = [f"cold{i}" for i in range(50)]
    write_batch("b1.parquet", ["hot"] * 40 + cold)
    sink = {}
    q = run_to_sink(
        heavy_hitters_stream(
            spark, str(events_dir), schema, key_col="k",
            groups=1, capacity=4,
        ),
        ckpt,
        sink,
    )
    q.awaitTermination(120)
    by_key = {k: v for (_, k), v in sink.items()}
    assert "hot" in by_key
    mg, n = by_key["hot"]
    assert n == 90
    # MG bounds: no overcount; undercount <= n/(capacity+1)
    assert mg <= 40
    assert 40 - mg <= n / 5
    # bounded state: at most `capacity` keys tracked
    assert len(by_key) <= 4

    # restart from checkpoint: more hot + new cold mass, counts continue
    write_batch("b2.parquet", ["hot"] * 30 + cold)
    sink2 = {}
    q2 = run_to_sink(
        heavy_hitters_stream(
            spark, str(events_dir), schema, key_col="k",
            groups=1, capacity=4,
        ),
        ckpt,
        sink2,
    )
    q2.awaitTermination(120)
    by_key2 = {k: v for (_, k), v in sink2.items()}
    mg2, n2 = by_key2["hot"]
    assert n2 == 170  # 90 + 30 hot + 50 cold
    assert mg2 <= 70 and 70 - mg2 <= n2 / 5
    assert len(by_key2) <= 4


def test_mg_insert_semantics():
    from amazon_s3_find_and_forget_spark.streaming.heavy_hitters import (
        _mg_insert,
    )

    s = {}
    for k, c in [("a", 5), ("b", 3), ("c", 1)]:
        _mg_insert(s, k, c, capacity=3)
    # full summary, new key lighter than min: everything decrements,
    # min evicts, new key absorbed only by its excess (here none)
    _mg_insert(s, "d", 1, capacity=3)
    assert s == {"a": 4, "b": 2}
    # new key heavier than the whole summary: it must end up tracked
    _mg_insert(s, "e", 10, capacity=3)
    assert "e" in s and s["e"] <= 10
    # no overcount ever
    assert all(v > 0 for v in s.values())


def test_streaming_heavy_hitters_emptied_summary_clears_sink(
    spark, tmp_path
):
    """A batch that decrements a group's whole summary away must still
    refresh the sink (null-key sentinel) — stale keys may not linger."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from amazon_s3_find_and_forget_spark.streaming.heavy_hitters import (
        heavy_hitters_stream,
        run_to_sink,
    )

    events_dir = tmp_path / "keys2"
    ckpt = str(tmp_path / "ckpt2")
    events_dir.mkdir()

    def write_batch(fname, keys):
        pq.write_table(
            pa.table({"k": pa.array(keys, pa.string())}),
            str(events_dir / fname),
        )

    write_batch("b1.parquet", ["a", "b"])  # summary {a:1, b:1}, cap 2
    sink = {}
    run_to_sink(
        heavy_hitters_stream(
            spark, str(events_dir), "k string", key_col="k",
            groups=1, capacity=2,
        ),
        ckpt, sink,
    ).awaitTermination(120)
    assert {k for (_, k) in sink} == {"a", "b"}

    write_batch("b2.parquet", ["c"])  # decrements a,b to 0 -> empty
    sink2 = dict(sink)
    run_to_sink(
        heavy_hitters_stream(
            spark, str(events_dir), "k string", key_col="k",
            groups=1, capacity=2,
        ),
        ckpt, sink2,
    ).awaitTermination(120)
    assert sink2 == {}  # old keys evicted, nothing tracked


def test_index_dedup_stream_screens_across_batches(spark, tmp_path):
    """Lake-index streaming dedup: later micro-batches must drop content
    already seen by earlier ones (no watermark horizon), survivors are
    first arrivals, and the index grows append-only per batch."""
    from amazon_s3_find_and_forget_spark.streaming import dedup as sdedup

    src = str(tmp_path / "stream-in")
    os.makedirs(src)
    b0 = spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc"), (3, "alpha doc")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(10, "alpha doc"), (11, "gamma doc"), (12, "beta doc")],
        "doc_id long, text string",
    )
    b0.coalesce(1).write.parquet(os.path.join(src, "f0"))
    b1.coalesce(1).write.parquet(os.path.join(src, "f1"))

    index_dir = str(tmp_path / "index")
    novel_dir = str(tmp_path / "novel")
    q = sdedup.index_dedup_stream(
        spark,
        src + "/*",
        b0.schema,
        index_dir,
        novel_dir,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    novel = spark.read.parquet(novel_dir)
    # 3 distinct contents, first arrival each; the cross-batch duplicate
    # (10, 12) and within-batch duplicate (3) screened out. File order
    # within the stream is deterministic (listing order f0 then f1).
    assert sorted(r["doc_id"] for r in novel.collect()) == [1, 2, 11]
    idx = spark.read.parquet(index_dir)
    assert idx.count() == 3
    assert idx.select("batch_id").distinct().count() == 2

    # restart with a fresh file: the checkpoint resumes, the index
    # screens the re-landed content
    b2 = spark.createDataFrame(
        [(20, "gamma doc"), (21, "delta doc")], "doc_id long, text string"
    )
    b2.coalesce(1).write.parquet(os.path.join(src, "f2"))
    q2 = sdedup.index_dedup_stream(
        spark,
        src + "/*",
        b0.schema,
        index_dir,
        novel_dir,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q2.awaitTermination()
    novel2 = spark.read.parquet(novel_dir)
    assert sorted(r["doc_id"] for r in novel2.collect()) == [1, 2, 11, 21]


def test_index_bloom_dedup_stream_screens_across_batches(spark, tmp_path):
    """Streaming Bloom screen: later micro-batches drop content already
    folded into the bitmap (cross-batch AND within-batch), the delta is
    one bitmap row per batch, a checkpoint restart resumes against the
    OR of committed deltas, and a geometry change fails loudly."""
    import pytest as _pytest

    from amazon_s3_find_and_forget_spark.streaming import dedup as sdedup

    src = str(tmp_path / "bstream-in")
    os.makedirs(src)
    b0 = spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc"), (3, "alpha doc")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(10, "alpha doc"), (11, "gamma doc"), (12, "beta doc")],
        "doc_id long, text string",
    )
    b0.coalesce(1).write.parquet(os.path.join(src, "f0"))
    b1.coalesce(1).write.parquet(os.path.join(src, "f1"))
    index_dir = str(tmp_path / "bidx")
    novel_dir = str(tmp_path / "bnovel")
    kw = dict(capacity=10_000, fpp=0.001, max_files_per_trigger=1)
    q = sdedup.index_bloom_dedup_stream(
        spark, src + "/*", b0.schema, index_dir, novel_dir,
        str(tmp_path / "bckpt"), **kw,
    )
    q.awaitTermination()
    novel = spark.read.parquet(novel_dir)
    assert sorted(r["doc_id"] for r in novel.collect()) == [1, 2, 11]
    idx = spark.read.parquet(index_dir)
    assert idx.count() == 2  # one bitmap row per batch
    # restart: the checkpoint resumes, the OR'd bitmaps screen re-lands
    b2 = spark.createDataFrame(
        [(20, "gamma doc"), (21, "delta doc")], "doc_id long, text string"
    )
    b2.coalesce(1).write.parquet(os.path.join(src, "f2"))
    q2 = sdedup.index_bloom_dedup_stream(
        spark, src + "/*", b0.schema, index_dir, novel_dir,
        str(tmp_path / "bckpt"), **kw,
    )
    q2.awaitTermination()
    novel2 = spark.read.parquet(novel_dir)
    assert sorted(r["doc_id"] for r in novel2.collect()) == [1, 2, 11, 21]
    # geometry change against the same index dir must fail the batch
    b3 = spark.createDataFrame(
        [(30, "omega doc")], "doc_id long, text string"
    )
    b3.coalesce(1).write.parquet(os.path.join(src, "f3"))
    q3 = sdedup.index_bloom_dedup_stream(
        spark, src + "/*", b0.schema, index_dir, novel_dir,
        str(tmp_path / "bckpt"), capacity=50, fpp=0.5,
        max_files_per_trigger=1,
    )
    with _pytest.raises(Exception, match="geometry mismatch"):
        q3.awaitTermination()


def test_index_near_dedup_stream_screens_across_batches(spark, tmp_path):
    """Lake-index streaming NEAR-dedup: later batches drop near-matches
    of indexed survivors; signature index grows per batch."""
    from amazon_s3_find_and_forget_spark.streaming import dedup as sdedup

    base = (
        "spark structured streaming processes data incrementally with "
        "exactly once fault tolerance guarantees across micro batches"
    )
    other = "completely different subject matter about cooking pasta"
    third = "yet another unrelated text concerning mountain hiking"
    src = str(tmp_path / "nstream-in")
    os.makedirs(src)
    b0 = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(10, base + "?"), (11, third)], "doc_id long, text string"
    )
    b0.coalesce(1).write.parquet(os.path.join(src, "f0"))
    b1.coalesce(1).write.parquet(os.path.join(src, "f1"))

    index_dir = str(tmp_path / "nindex")
    novel_dir = str(tmp_path / "nnovel")
    q = sdedup.index_near_dedup_stream(
        spark,
        src + "/*",
        b0.schema,
        index_dir,
        novel_dir,
        str(tmp_path / "nckpt"),
        threshold=0.7,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    novel = spark.read.parquet(novel_dir)
    # 10 near-dups indexed 1 (screened); 11 is novel
    assert sorted(r["doc_id"] for r in novel.collect()) == [1, 2, 11]
    idx = spark.read.parquet(index_dir)
    assert sorted(r["_id"] for r in idx.collect()) == [1, 2, 11]


def test_index_dedup_stream_restart_across_compaction(spark, tmp_path):
    """The weak-mark fix: folding committed deltas into a base partition
    must keep (a) screen results identical, (b) the retry protocol
    intact across a checkpoint restart, and (c) the per-batch read at
    O(1) directories per compaction epoch instead of O(batches)."""
    from amazon_s3_find_and_forget_spark.operators.incremental import (
        compact_index,
    )
    from amazon_s3_find_and_forget_spark.streaming import dedup as sdedup

    src = str(tmp_path / "stream-in")
    ckpt = str(tmp_path / "ckpt")
    index_dir = str(tmp_path / "index")
    novel_dir = str(tmp_path / "novel")
    os.makedirs(src)
    schema = "doc_id long, text string"

    def land(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(src, name)
        )

    def drain():
        sdedup.index_dedup_stream(
            spark, src + "/*", schema, index_dir, novel_dir, ckpt,
            max_files_per_trigger=1,
        ).awaitTermination()

    def index_dirs():
        return sorted(
            d for d in os.listdir(index_dir) if d.startswith("batch")
        )

    land("f0", [(1, "alpha"), (2, "beta"), (3, "alpha")])
    land("f1", [(10, "alpha"), (11, "gamma")])
    drain()
    assert len(index_dirs()) == 2  # one delta per micro-batch

    stats = compact_index(spark, index_dir, checkpoint_dir=ckpt)
    # commit log says batches 0 and 1 committed -> fold bound K=1
    assert stats["BasePath"].endswith("batch_id=-2")
    assert (stats["BaseRows"], stats["FoldedDirs"]) == (3, 2)
    assert index_dirs() == ["batch_id=-2"]

    # restart from the checkpoint over the compacted index: batch ids
    # continue (2, 3), the base screens re-landed content, and the
    # epoch's read is base + residual deltas only
    land("f2", [(20, "gamma"), (21, "delta")])
    land("f3", [(30, "delta"), (31, "epsilon")])
    drain()
    novel = spark.read.parquet(novel_dir)
    assert sorted(r["doc_id"] for r in novel.collect()) == [1, 2, 11, 21, 31]
    assert index_dirs() == ["batch_id=-2", "batch_id=2", "batch_id=3"]

    # second epoch folds base + new deltas into one dir again
    stats2 = compact_index(spark, index_dir, checkpoint_dir=ckpt)
    assert stats2["BasePath"].endswith("batch_id=-4")
    assert (stats2["BaseRows"], stats2["FoldedDirs"]) == (5, 3)
    assert index_dirs() == ["batch_id=-4"]

    # and the screen is still exact after two compactions
    land("f4", [(40, "epsilon"), (41, "zeta")])
    drain()
    novel2 = spark.read.parquet(novel_dir)
    assert sorted(r["doc_id"] for r in novel2.collect()) == [
        1, 2, 11, 21, 31, 41,
    ]
    # re-compacting an already-base-only index is a no-op
    stats3 = compact_index(spark, index_dir, checkpoint_dir=ckpt)
    assert stats3["FoldedDirs"] == 0 or stats3["BaseRows"] == 6


def test_streaming_screen_feeds_redact_forget(spark, tmp_path):
    """The newly-landed-PII runbook, composed end to end: the incremental
    screen's novel-docs output becomes the match source for a
    REDACT-mode Forget over the landing lake — newly seen documents get
    their PII column nulled in place while duplicates of known content
    (already screened out) trigger no rewrite work at all."""
    from amazon_s3_find_and_forget_spark.api import Engine
    from amazon_s3_find_and_forget_spark.streaming import dedup as sdedup

    import glob
    import shutil

    src = str(tmp_path / "landing")
    os.makedirs(src)
    schema = "doc_id long, text string, email string"

    def land(name, rows):
        # flat files, as a real landing lake: the same directory must be
        # readable both by the stream and by a DataMapper (a plain
        # parquet read does not recurse into non-partition subdirs)
        tmpd = str(tmp_path / ("w_" + name))
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tmpd)
        part = glob.glob(os.path.join(tmpd, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, name + ".parquet"))

    # day 0: the standing corpus
    land("f0", [(1, "known doc alpha", "a@x"), (2, "known doc beta", "b@x")])
    # day 1: one duplicate of known content + two genuinely new docs
    land("f1", [
        (10, "known doc alpha", "dup@x"),
        (11, "fresh doc with pii", "pii@x"),
        (12, "another fresh doc", "pii2@x"),
    ])
    index_dir = str(tmp_path / "idx")
    novel_dir = str(tmp_path / "novel")
    sdedup.index_dedup_stream(
        spark, src, schema, index_dir, novel_dir,
        str(tmp_path / "ckpt"), max_files_per_trigger=1,
    ).awaitTermination()

    # the latest batch's novel docs are the newly-landed unique content
    new_docs = spark.read.parquet(f"{novel_dir}/batch_id=1")
    new_ids = sorted(r["doc_id"] for r in new_docs.collect())
    assert new_ids == [11, 12]  # the duplicate (10) was screened out

    # feed them into a redact-mode Forget over the landing lake
    eng = Engine(spark, str(tmp_path / "state"))
    eng.put_data_mapper("landing", {
        "Location": src,
        "Columns": ["doc_id"],
        "Format": "parquet",
        "DeleteMode": "redact",
        "RedactColumns": ["email"],
    })
    eng.enqueue_matches([{"MatchId": i} for i in new_ids])
    job = eng.process_queue()
    assert job["JobStatus"] == "COMPLETED"
    assert job["TotalObjectUpdatedCount"] == 1  # only f1 holds matches

    spark.catalog.clearCache()
    got = {
        r["doc_id"]: (r["text"], r["email"])
        for r in spark.read.parquet(src).collect()
    }
    # rows kept, PII column nulled for exactly the novel ids
    assert got[11] == ("fresh doc with pii", None)
    assert got[12] == ("another fresh doc", None)
    # everything else — including the screened-out duplicate — untouched
    assert got[1] == ("known doc alpha", "a@x")
    assert got[2] == ("known doc beta", "b@x")
    assert got[10] == ("known doc alpha", "dup@x")
    assert len(got) == 5


def test_index_embedding_dedup_stream_screens_and_compacts(spark, tmp_path):
    """Embedding screen completes the streaming trio: later micro-batches
    drop near-duplicate vectors (cosine >= threshold) of indexed ones,
    the index compacts protocol-aware mid-stream, and the screen stays
    exact across the restart."""
    from amazon_s3_find_and_forget_spark.operators.incremental import (
        compact_index,
    )
    from amazon_s3_find_and_forget_spark.streaming import dedup as sdedup

    src = str(tmp_path / "vec-in")
    os.makedirs(src)
    schema = "vec_id long, embedding array<float>"

    def land(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(src, name)
        )

    def drain():
        sdedup.index_embedding_dedup_stream(
            spark, src + "/*", schema, index_dir, novel_dir,
            str(tmp_path / "ckpt"), dim=4, threshold=0.95,
            max_files_per_trigger=1,
        ).awaitTermination()

    index_dir = str(tmp_path / "vidx")
    novel_dir = str(tmp_path / "vnovel")
    land("f0", [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])])
    land("f1", [
        (10, [0.99, 0.05, 0.0, 0.0]),   # near-dup of 1 (cos ~0.999)
        (11, [0.0, 0.0, 1.0, 0.0]),     # novel direction
    ])
    drain()
    novel = spark.read.parquet(novel_dir)
    assert sorted(r["vec_id"] for r in novel.collect()) == [1, 2, 11]

    stats = compact_index(
        spark, index_dir, checkpoint_dir=str(tmp_path / "ckpt")
    )
    assert stats["BaseRows"] == 3
    assert sorted(
        d for d in os.listdir(index_dir) if d.startswith("batch")
    ) == ["batch_id=-2"]

    # restart over the compacted index: re-landed directions screen out
    land("f2", [
        (20, [0.0, 0.0, 0.98, 0.02]),   # near-dup of 11
        (21, [0.0, 0.0, 0.0, 1.0]),     # novel
    ])
    drain()
    novel2 = spark.read.parquet(novel_dir)
    assert sorted(r["vec_id"] for r in novel2.collect()) == [1, 2, 11, 21]


def test_index_dedup_stream_in_protocol_compaction_long_stream(
    spark, tmp_path
):
    """compact_every cadence over a LONG stream: 50 micro-batches with
    compaction every 10, restarted mid-stream. The screen must stay
    exact across five compaction epochs, the per-trigger read must stay
    O(compact_every) directories instead of O(batches), and the epochs
    must continue across a checkpoint restart with no operator
    intervention."""
    from amazon_s3_find_and_forget_spark.streaming import dedup as sdedup

    src = str(tmp_path / "stream-in")
    ckpt = str(tmp_path / "ckpt")
    index_dir = str(tmp_path / "index")
    novel_dir = str(tmp_path / "novel")
    os.makedirs(src)
    schema = "doc_id long, text string"

    def land(i):
        # 7 distinct contents cycling over 50 batches: only the first
        # arrival of each content is novel
        spark.createDataFrame(
            [(i, f"content-{i % 7}")], schema
        ).coalesce(1).write.parquet(os.path.join(src, f"f{i:03d}"))

    def drain():
        sdedup.index_dedup_stream(
            spark, src + "/*", schema, index_dir, novel_dir, ckpt,
            max_files_per_trigger=1, compact_every=10,
        ).awaitTermination()

    def index_dirs():
        return sorted(
            d for d in os.listdir(index_dir) if d.startswith("batch")
        )

    for i in range(25):
        land(i)
    drain()
    # batches 0..24; compactions ran at 10 and 20 -> one base plus the
    # residual deltas 20..24 (compaction at 20 folds committed <= 19)
    dirs1 = index_dirs()
    assert sum(1 for d in dirs1 if "=-" in d) == 1
    assert len(dirs1) == 1 + 5

    for i in range(25, 50):
        land(i)
    drain()
    # batches 25..49 continue from the checkpoint; compactions at 30
    # and 40 -> one base + deltas 40..49
    dirs2 = index_dirs()
    assert sum(1 for d in dirs2 if "=-" in d) == 1
    assert len(dirs2) == 1 + 10
    # the bound a months-long run relies on: never more than
    # compact_every + 1 directories per trigger read
    assert len(dirs2) <= 11

    # exactness after five epochs: first arrival of each of the 7
    # contents survived, everything else screened out
    novel = spark.read.parquet(novel_dir)
    assert sorted(r["doc_id"] for r in novel.collect()) == list(range(7))
    # and the index still holds exactly one row per distinct content
    idx = spark.read.parquet(index_dir)
    assert idx.count() == 7

    # cadence parameter is validated up front
    import pytest

    with pytest.raises(ValueError, match="compact_every"):
        sdedup.index_dedup_stream(
            spark, src + "/*", schema, index_dir, novel_dir, ckpt,
            compact_every=0,
        )
