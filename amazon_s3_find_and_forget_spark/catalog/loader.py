"""Shared catalog infrastructure: schema-adaptive loaders and
cross-engine determinism helpers (see the package docstring in
``catalog/__init__.py`` for the rules they enforce)."""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


_LOG = logging.getLogger(__name__)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Make any SparkSession able to run the catalog, not just ours.

    The driver harness hands us a vanilla session: without
    ``nanosAsLong`` the events table (physical INT64 TIMESTAMP(NANOS))
    fails with PARQUET_TYPE_ILLEGAL, and without UTC the time-bucketing
    queries disagree with the DuckDB oracle. Both are runtime-settable.
    """
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf rejected (static conf)
            pass


def _load_events_via_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Fallback events reader when ``nanosAsLong`` is rejected.

    Reads the parquet through PyArrow, casts ns -> us driver-side, and
    re-creates the DataFrame. Only used when the conf path fails, so the
    driver-side materialization is an emergency path, not the hot path.
    """
    import pyarrow.compute  # noqa: F401  (ensure compute kernels loaded)
    import pyarrow.parquet as pq

    table = pq.read_table(path)
    fields = []
    for field in table.schema:
        if str(field.type).startswith("timestamp[ns"):
            import pyarrow as pa

            fields.append(field.with_type(pa.timestamp("us")))
        else:
            fields.append(field)
    import pyarrow as pa

    table = table.cast(pa.schema(fields))
    return spark.createDataFrame(table.to_pandas())


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Schema-adaptive table loader.

    The events table's ``ts`` column has shipped with different PHYSICAL
    parquet encodings across testdata generations (INT64 TIMESTAMP(NANOS),
    which Spark reads as BIGINT under ``nanosAsLong``; and plain
    timestamp[us], which reads as TIMESTAMP_NTZ or TIMESTAMP depending on
    ``inferTimestampNTZ``). Plan against the schema the read actually
    reports — the same schema-driven planning the reference does against
    Glue (reference: backend/lambdas/tasks/generate_queries.py:141-148) —
    never against an assumed encoding. All downstream catalog queries see
    one logical type: session-timezone TIMESTAMP (UTC, per
    ``_ensure_session_confs``), micros resolution.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    _ensure_session_confs(spark)
    if name != "events":
        return spark.read.parquet(path)
    try:
        df = spark.read.parquet(path)
        return _normalize_ts(df)
    except Exception as e:
        # the read itself failed (e.g. nanos parquet with nanosAsLong
        # rejected as a static conf) -> driver-side Arrow emergency path.
        # This materializes the whole table on the driver — an OOM at
        # scale — so it must never be taken silently.
        _LOG.warning(
            "distributed events read failed (%s: %s); falling back to "
            "DRIVER-SIDE Arrow materialization of %s — this path does not "
            "scale and indicates a session-conf or encoding problem",
            type(e).__name__,
            e,
            path,
        )
        return _load_events_via_arrow(spark, path)


def _normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the ``ts`` column to TIMESTAMP (micros, session-UTC)."""
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    dtype = df.schema[col].dataType
    if isinstance(dtype, TimestampType):
        return df
    if isinstance(dtype, TimestampNTZType):
        # NTZ -> TZ under a UTC session timezone is a pure re-tag: the
        # wall-clock micros are reinterpreted as UTC instants, matching
        # DuckDB's naive-timestamp epoch() semantics
        return df.withColumn(col, F.col(col).cast("timestamp"))
    if isinstance(dtype, LongType):
        # nanosAsLong read of INT64 TIMESTAMP(NANOS): integer ns -> us
        return df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    raise TypeError(f"unsupported physical type for '{col}': {dtype}")


def _dec2dbl(df: DataFrame) -> DataFrame:
    """Cast every top-level DecimalType output column to DOUBLE.

    Internal arithmetic stays exact-decimal (order-independent sums); only
    the FINAL projection is converted. At catalog magnitudes the decimal's
    unscaled value is < 2^53, so decimal->double is exact and bit-identical
    in Spark and DuckDB — which makes the driver's value hash stable, where
    decimal canonicalization (trailing zeros, precision) was not.

    The oracle SQL applies the same CAST(... AS DOUBLE) on its side.
    """
    from pyspark.sql.types import DecimalType

    if not any(isinstance(f.dataType, DecimalType) for f in df.schema.fields):
        return df
    return df.select(
        *[
            F.col(f.name).cast("double").alias(f.name)
            if isinstance(f.dataType, DecimalType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


#
# The LSH/IVF operators are APPROXIMATE: their row sets depend on seeded
# hyperplanes / permutations DuckDB cannot replicate, so value-for-value
# oracles are impossible by construction. What IS deterministic — and
# therefore driver-hashable — is the quality claim: each gate query below
# computes the operator's recall (or completeness) against the exact
# baseline COMPUTED IN THE SAME PLAN, and returns a single summary row
# whose oracle is the claim itself plus an engine-checkable input count.
# The exact baselines are independently value-checked by their own green
# rows (dedup_ngram_pairs, embedding_near_dups_exact,
# similarity_batch_topk_exact, similarity_topk). Thresholds carry wide
# noise margins so they hold under testdata regeneration, not just the
# current seed.
def _summary_row(spark, **cols):
    """One-row DataFrame of named long/boolean columns (dict order)."""
    from pyspark.sql import types as T

    fields = [
        T.StructField(
            k, T.BooleanType() if isinstance(v, bool) else T.LongType()
        )
        for k, v in cols.items()
    ]
    return spark.createDataFrame([tuple(cols.values())], T.StructType(fields))


def _floatsafe(fn):
    def wrapped(spark, sf_dir):
        return _dec2dbl(fn(spark, sf_dir))

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped
