"""Streaming heavy hitters: bounded-state top-key tracking on a live feed.

The reference has no streaming analytics (SURVEY §2.7 "Absent"); a
training-data ingest pipeline wants live frequency skew monitoring —
which sources/domains/shingles dominate the feed RIGHT NOW — without
keeping one state row per distinct key (unbounded at corpus scale).

Spark-first shape: the key space is hash-partitioned into ``groups``
state rows, and each state row holds a Misra–Gries summary of
``capacity`` entries maintained by ``applyInPandasWithState``. Total
state is O(groups * capacity) REGARDLESS of key cardinality — the
whole point vs a naive ``groupBy(key).count()`` whose streaming state
grows with every distinct key ever seen.

Guarantees (classic Misra–Gries, preserved under batched arrival):
- no overcount: ``mg_count <= true_count`` always;
- bounded undercount: ``true_count - mg_count <= n_group/(capacity+1)``
  where ``n_group`` is the rows routed to that state row;
- therefore NO FALSE NEGATIVES above threshold: every key with
  ``true_count > n_group/(capacity+1)`` is present in the summary.

The emitted per-batch rows are (grp, key, mg_count, n_group); the
global heavy-hitter set is the union of the group summaries, exactly
re-countable downstream because the candidate list is tiny.

Batch counterpart: ``operators/sketches.py`` (Count-Min + freqItems);
the MG guarantee here is one-sided like freqItems', and the batch
agreement test pins the two paths to the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OUTPUT_SCHEMA = "grp long, key string, mg_count long, n_group long"
STATE_SCHEMA = "keys array<string>, counts array<long>, n long"


def _mg_insert(summary: dict, key: str, c: int, capacity: int) -> None:
    """Batched Misra–Gries insert: add ``c`` occurrences of ``key``."""
    if key in summary:
        summary[key] += c
        return
    if len(summary) < capacity:
        summary[key] = c
        return
    while c > 0:
        m = min(summary.values())
        d = min(c, m)
        if d == 0:  # pragma: no cover - zeros are evicted eagerly below
            d = c
        c -= d
        for k in list(summary):
            summary[k] -= d
            if summary[k] <= 0:
                del summary[k]
        if c > 0 and len(summary) < capacity:
            summary[key] = c
            return


def heavy_hitters_stream(
    spark: SparkSession,
    events_dir: str,
    schema,
    key_col: str = "event_type",
    groups: int = 8,
    capacity: int = 64,
) -> DataFrame:
    """Misra–Gries summaries over a file stream, one state row per group.

    Returns the unstarted streaming DataFrame (grp, key, mg_count,
    n_group) in update mode — each batch re-emits the refreshed
    summaries of the groups it touched.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .where(F.col(key_col).isNotNull())
        .withColumn(
            "grp", F.pmod(F.xxhash64(F.col(key_col)), F.lit(groups))
        )
    )

    def update(key, pdfs, state):
        if state.exists:
            keys, counts, n = state.get
            summary = dict(zip(keys, (int(c) for c in counts)))
            n = int(n)
        else:
            summary, n = {}, 0
        for pdf in pdfs:
            for k, c in pdf[key_col].value_counts().items():
                c = int(c)
                n += c
                _mg_insert(summary, str(k), c, capacity)
        items = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
        state.update(
            ([k for k, _ in items], [v for _, v in items], n)
        )
        if items:
            yield pd.DataFrame(
                [
                    {
                        "grp": key[0],
                        "key": k,
                        "mg_count": v,
                        "n_group": n,
                    }
                    for k, v in items
                ]
            )
        else:
            # a fully-decremented (empty) summary still must reach the
            # sink — an empty DataFrame is dropped by the serializer,
            # which would leave the sink's old keys stale forever; the
            # null-key sentinel says "group refreshed, nothing tracked"
            yield pd.DataFrame(
                [{"grp": key[0], "key": None, "mg_count": 0, "n_group": n}]
            )

    return stream.groupBy("grp").applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_to_sink(stream_df: DataFrame, checkpoint: str, sink: dict):
    """Drive the summary stream into a dict keyed by (grp, key) — a
    foreachBatch merge, so state recovers across checkpointed restarts
    (the memory sink cannot)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.collect()
        latest: dict = {}
        for r in rows:
            latest[r["grp"]] = max(latest.get(r["grp"], 0), r["n_group"])
        for r in rows:
            if r["key"] is not None:  # null key = emptied-summary sentinel
                sink[(r["grp"], r["key"])] = (r["mg_count"], r["n_group"])
        # drop keys evicted from a refreshed group summary (their stored
        # n_group predates this batch's)
        for (g, k), (_, ng) in list(sink.items()):
            if g in latest and ng < latest[g]:
                del sink[(g, k)]

    return (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
