"""Streaming deduplication of a live document feed.

The reference has no streaming dedup (SURVEY §2.7 "Absent"); a
training-data pipeline ingesting a continuous document feed needs it:
every newly-landed document must be dropped if its content was already
seen. Batch dedup (operators/dedup.py) re-scans the corpus; this
operator instead keeps a bounded state-store keyed by content hash and
screens arrivals incrementally.

Spark-first shape: ``readStream`` -> content hash (JVM-side ``md5``)
-> ``dropDuplicatesWithinWatermark`` on the hash. The watermark bounds
the dedup state: two identical documents arriving within
``dedup_horizon`` of each other dedup exactly; beyond the horizon the
key has been evicted and the duplicate passes (the documented
trade-off that keeps state O(docs-per-horizon), not O(corpus) — at
100 TB/day an unbounded exact-seen set would not fit any cluster, and
the horizon is the knob that prices recall against memory).

Survivor policy is FIRST ARRIVAL in stream order, the streaming analog
of batch ``exact_dedup``'s min-id rule (batch has a total order to
rank by; a stream only has arrival order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Shared batch/stream projection: add the dedup key (md5 of content).

    Same definition feeds the batch operators and the stream, so the
    two paths cannot disagree about what "identical content" means.
    """
    return df.withColumn("content_hash", F.md5(F.col(text_col)))


def dedup_stream(
    spark,
    docs_dir: str,
    schema,  # DDL string or StructType (file streams need a fixed schema)
    ts_col: str = "ts",
    text_col: str = "text",
    dedup_horizon: str = "1 hour",
) -> DataFrame:
    """Screen a document file-stream, emitting first-seen documents only.

    ``dropDuplicatesWithinWatermark`` keeps one state row per content
    hash and evicts it once the watermark passes the row's event time
    plus ``dedup_horizon`` — exactly-once emission per distinct content
    within the horizon, bounded state beyond it.
    """
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    return (
        with_content_hash(stream, text_col)
        .withWatermark(ts_col, dedup_horizon)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def run_to_table(stream_df: DataFrame, checkpoint: str, out_dir: str) -> None:
    """Drain with availableNow: batch-equivalent semantics, resumable
    from the checkpoint (restarts do not re-emit already-kept docs)."""
    (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("checkpointLocation", checkpoint)
        .option("path", out_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _index_screen_stream(
    spark,
    docs_dir: str,
    schema,
    index_dir: str,
    novel_dir: str,
    checkpoint: str,
    empty_index,
    screen,
    index_cols: list[str],
    available_now: bool,
    max_files_per_trigger: int | None,
    compact_every: int | None = None,
    index_col_defaults: dict[str, str] | None = None,
):
    """Shared engine for the lake-index screens: file stream ->
    per-micro-batch screen against the persisted index -> idempotent
    ``batch_id=N`` overwrite of novel rows and the index delta.

    Idempotent under foreachBatch's retry contract: batch N writes its
    outputs to ``batch_id=N`` partition directories with overwrite and
    SCREENS ONLY against deltas of batches < N — a retried batch never
    sees its own half-written output, so reruns produce byte-identical
    results. Micro-batch N+1 reads every delta <= N (the index grows
    append-only). Missing-vs-broken index classification is
    ``operators/incremental.read_index_or_empty`` (shared with the CLI
    ``dedup-screen``): only a never-committed index (missing dir, or a
    dir holding no committed parquet after a first-delta crash) becomes
    an empty index; any other read failure fails the batch so the
    checkpoint retries it.

    ``compact_every``: in-protocol compaction cadence. Every
    ``compact_every``-th micro-batch folds the committed deltas into a
    base partition (``operators/incremental.compact_index``) BEFORE
    screening, inside ``foreachBatch`` — the one window where no
    concurrent trigger can be mid-read. The fold is bounded by the
    stream's own commit log (last committed < current batch id), so the
    current batch's not-yet-committed delta can never fold into the
    base it screens against, preserving the retry contract; a retried
    trigger re-runs the fold, which converges (no-op over a base-only
    index). A screen that runs for months then reads O(compact_every)
    directories per trigger instead of O(total batches), with no
    operator intervention. ``None`` keeps compaction manual (CLI
    ``compact-index`` / ``Engine.compact_index`` between triggers).
    """
    from ..operators.incremental import compact_index, read_index_or_empty

    if compact_every is not None and compact_every < 1:
        raise ValueError(
            f"compact_every must be a positive batch count, got "
            f"{compact_every}"
        )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)

    def process_batch(batch_df, batch_id: int):
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            # batch_id >= 1 implies batch 0 has committed, so the
            # commit-log bound always exists here
            compact_index(
                batch_df.sparkSession, index_dir, checkpoint_dir=checkpoint
            )
        index = read_index_or_empty(
            batch_df.sparkSession,
            index_dir,
            F.col("batch_id") < batch_id,
            index_cols,
            lambda: empty_index(batch_df),
            defaults=index_col_defaults,
        )
        novel, delta = screen(batch_df, index)
        novel.write.mode("overwrite").parquet(
            f"{novel_dir}/batch_id={batch_id}"
        )
        delta.write.mode("overwrite").parquet(
            f"{index_dir}/batch_id={batch_id}"
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def index_dedup_stream(
    spark,
    docs_dir: str,
    schema,
    index_dir: str,
    novel_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    compact_every: int | None = None,
):
    """Unbounded-horizon streaming dedup: screen each micro-batch against
    the LAKE-persisted exact index (operators/incremental.py) instead of
    the state store.

    ``dedup_stream`` above prices recall against executor memory with a
    watermark horizon; this variant keeps the seen-set in the lake —
    O(40 bytes)/distinct document of parquet, no state-store growth, no
    horizon — and screens each micro-batch with the incremental
    operators (index probed via pushed predicate or broadcast, never
    shuffled). The trade is exactness for latency: each batch pays an
    index probe. Retry/ordering protocol: see ``_index_screen_stream``.
    """
    from ..operators import incremental as inc

    return _index_screen_stream(
        spark,
        docs_dir,
        schema,
        index_dir,
        novel_dir,
        checkpoint,
        empty_index=lambda b: inc.exact_index(b.limit(0), text_col, id_col),
        screen=lambda b, idx: inc.incremental_exact_dedup(
            b, idx, text_col, id_col
        ),
        index_cols=["content_hash", id_col],
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
        compact_every=compact_every,
    )


def index_bloom_dedup_stream(
    spark,
    docs_dir: str,
    schema,
    index_dir: str,
    novel_dir: str,
    checkpoint: str,
    capacity: int,
    fpp: float = 0.01,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    compact_every: int | None = None,
    assume_hash_scheme: int | None = None,
):
    """Streaming Bloom screen — the bounded-STATE point on the same
    trade curve as the two screens above: ``dedup_stream`` bounds state
    with a TIME horizon (exact within it, amnesiac past it),
    ``index_dedup_stream`` keeps the exact unbounded seen-set in the
    lake and pays an index probe per trigger; this variant keeps ONE
    fixed bitmap (``bloom_params(capacity, fpp)`` — 1.2 MB per million
    documents at 1 %) with no horizon and a map-only probe, at the
    price of a ~``fpp`` chance of wrongly dropping a novel document
    (never re-admitting a duplicate). The Dolma dedupe tool is exactly
    this screen run over a firehose.

    The per-batch delta is one bitmap row OR-composed at read time, so
    a screen that runs for months reads O(batches) one-row files —
    and ``compact_every`` folds them in-protocol like every other
    layout (``compact_index``'s concatenating fold is correct for
    bitmap rows). Geometry is FIXED per index dir: a delta whose
    (num_bits, num_hashes) disagrees fails the batch loudly rather
    than silently corrupting membership. Retry/ordering protocol:
    ``_index_screen_stream``.
    """
    import numpy as np

    from ..operators import incremental as inc

    num_bits, num_hashes = inc.bloom_params(capacity, fpp)
    geometry = (
        "bits binary, num_bits long, num_hashes int, hash_scheme int"
    )

    def screen(batch_df, index):
        rows = index.collect()  # one row per committed prior batch
        if rows:
            # refuse to probe bitmaps written under a different (or
            # unverifiable pre-stamp) h2 scheme — failing the batch
            # keeps the checkpoint intact; the operator rebuilds into
            # a fresh index dir (or blesses via assume_hash_scheme)
            inc.check_bloom_hash_scheme(rows, index_dir, assume_hash_scheme)
        bits = np.zeros(num_bits // 64, dtype=np.uint64)
        for r in rows:
            if (
                int(r["num_bits"]) != num_bits
                or int(r["num_hashes"]) != num_hashes
            ):
                raise ValueError(
                    f"bloom index geometry mismatch in {index_dir}: "
                    f"delta has ({r['num_bits']}, {r['num_hashes']}), "
                    f"stream configured ({num_bits}, {num_hashes}) — "
                    "a geometry change needs a fresh index dir"
                )
            bits |= np.frombuffer(bytes(r["bits"]), dtype=np.uint64)
        novel, delta_bits = inc.incremental_bloom_dedup(
            batch_df, bits, num_hashes, text_col, id_col
        )
        delta = batch_df.sparkSession.createDataFrame(
            [
                (
                    bytearray(delta_bits.tobytes()),
                    num_bits,
                    num_hashes,
                    inc.BLOOM_HASH_SCHEME,
                )
            ],
            geometry,
        )
        return novel, delta

    return _index_screen_stream(
        spark,
        docs_dir,
        schema,
        index_dir,
        novel_dir,
        checkpoint,
        empty_index=lambda b: b.sparkSession.createDataFrame([], geometry),
        screen=screen,
        index_cols=["bits", "num_bits", "num_hashes", "hash_scheme"],
        index_col_defaults={"hash_scheme": "int"},
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
        compact_every=compact_every,
    )


def _compat_latched(dedup_fn, probe_col: str):
    """One parameter-compat probe per stream RUN, shared by the
    signature and embedding screens: probe on the first micro-batch,
    latch ONLY once real index data was verified — an empty index view
    (first batch, or a restart landing at batch 0 over surviving
    later-batch deltas) passes vacuously and must keep probing until
    actual data is seen. ``dedup_fn(batch, index, check)`` runs the
    screen with the probe toggled; ``probe_col`` is the index column
    whose non-null presence proves the probe saw data."""
    state = {"done": False}

    def screen(b, idx):
        check = not state["done"]
        out = dedup_fn(b, idx, check)
        if check and idx.where(F.col(probe_col).isNotNull()).head(1):
            state["done"] = True
        return out

    return screen


def index_near_dedup_stream(
    spark,
    docs_dir: str,
    schema,
    index_dir: str,
    novel_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int | None = None,
    threshold: float = 0.8,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    compact_every: int | None = None,
):
    """Near-duplicate sibling of ``index_dedup_stream``: the lake index
    holds MinHash signatures and each micro-batch screens through
    ``incremental_minhash_dedup`` (banded batch signatures broadcast
    into the index scan, inline agreement verify — the index never
    shuffles). Same retry/ordering protocol (``_index_screen_stream``).

    Like the batch screen, semantics are survivor-based: a new document
    is screened against INDEXED survivors, not against documents the
    screen already dropped — the SemDeDup-style trade that keeps the
    index append-only.

    The index's num_perm compatibility probe (an eager one-row job)
    runs on the FIRST micro-batch of each stream run only: within a
    run the parameters are fixed and every appended delta is built
    with them, so re-probing per batch buys nothing; a restart from
    the checkpoint re-probes once (latch rule: ``_compat_latched``).
    """
    from ..operators import incremental as inc

    screen = _compat_latched(
        lambda b, idx, check: inc.incremental_minhash_dedup(
            b,
            idx,
            text_col,
            id_col,
            num_perm=num_perm,
            bands=bands,
            threshold=threshold,
            check_compat=check,
        ),
        "_sig",
    )

    return _index_screen_stream(
        spark,
        docs_dir,
        schema,
        index_dir,
        novel_dir,
        checkpoint,
        empty_index=lambda b: inc.minhash_index(
            b.limit(0), text_col, id_col, num_perm=num_perm
        ),
        screen=screen,
        index_cols=["_id", "_sig"],
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
        compact_every=compact_every,
    )


def index_embedding_dedup_stream(
    spark,
    vecs_dir: str,
    schema,
    index_dir: str,
    novel_dir: str,
    checkpoint: str,
    dim: int,
    threshold: float = 0.95,
    bits: int = 10,
    n_tables: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    compact_every: int | None = None,
):
    """Embedding sibling of ``index_near_dedup_stream``: the lake index
    holds LSH-keyed unit vectors (``incremental.embedding_index``) and
    each micro-batch screens through ``incremental_embedding_dedup``
    (exploded batch keys broadcast into the index scan, exact-cosine
    verify inline — precision 1.0, the index never shuffles). Completes
    the screen trio (exact / MinHash text / embedding) under ONE
    retry/ordering protocol (``_index_screen_stream``), so a multimodal
    ingest can run all three against the same checkpointed stream
    machinery.

    The hyperplane family is a pure function of ``(dim, bits, seed)``,
    so an index built by earlier runs and a batch keyed by this one
    land in the same buckets; the dim/n_tables compat probe follows the
    shared ``_compat_latched`` rule. A ``bits``/``seed`` mismatch is
    UNDETECTABLE from the keys (they are xxhash64 outputs) — match the
    index's build parameters or lose recall silently.
    """
    from ..operators import incremental as inc

    screen = _compat_latched(
        lambda b, idx, check: inc.incremental_embedding_dedup(
            b,
            idx,
            dim,
            threshold=threshold,
            bits=bits,
            n_tables=n_tables,
            emb_col=emb_col,
            id_col=id_col,
            seed=seed,
            check_compat=check,
        ),
        "_u",
    )

    return _index_screen_stream(
        spark,
        vecs_dir,
        schema,
        index_dir,
        novel_dir,
        checkpoint,
        empty_index=lambda b: inc.embedding_index(
            b.limit(0), dim, bits, n_tables, emb_col, id_col, seed
        ),
        screen=screen,
        index_cols=["_id", "_u", "_k"],
        available_now=available_now,
        max_files_per_trigger=max_files_per_trigger,
        compact_every=compact_every,
    )
