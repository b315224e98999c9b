"""Temporal operators: as-of join (point-in-time lookup) and interval
(range) join — both expressed as shuffle-lean compositions of built-in
DataFrame ops, not theta joins.

The reference has no temporal joins (SURVEY §2.3 "Absent"), but a
training-data / feature pipeline needs them constantly: "for each
observation, the most recent feature row at or before its timestamp"
(point-in-time-correct feature lookup, attribution, slowly-changing
dimensions).

Spark has no ASOF JOIN primitive. The naive encodings both fail at
scale: a range join (``l.ts >= r.ts`` theta join) is O(|L|·|R|) per
key, and a per-key ``collect_list`` + UDF breaks on skewed keys. The
scalable shape is UNION + WINDOW:

    tag left/right -> unionByName -> window over (keys, ts) ->
    ``last(right_payload, ignorenulls=True)`` -> keep left rows.

One shuffle (on the join keys), linear work, skew handled by AQE like
any other window — the same plan shape Flink and kdb use for as-of.
Equal timestamps resolve right-before-left, so a right row AT the left
row's timestamp is visible (the conventional ``<=`` as-of semantics).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _floordiv(col, w: int):
    """Exact floor division of a long column by a positive int width.

    ``F.floor(col / w)`` divides in double precision; at epoch-microsecond
    magnitudes (~1e15) a quotient one ulp below an integer crosses the
    bucket boundary and can shift a bucket id by one. Subtracting the
    (integer-exact) Euclidean remainder first makes the numerator exactly
    divisible, and a double division of exactly-divisible longs below
    2^53 (year ~2255 in micros) is exact.
    """
    rem = ((col % w) + w) % w
    return ((col - rem) / w).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_cols: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``right_cols`` from the most
    recent right row with ``right.ts_col <= left.ts_col`` and equal
    ``on`` keys (null if none).

    ``tolerance`` (an INTERVAL literal body, e.g. ``"1 hour"``) bounds
    the lookback: an older match is nulled out, the left row kept.
    """
    on = list(on)
    right_cols = list(right_cols)
    payload = F.struct(
        F.col(ts_col).alias("_r_ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(1).alias("_is_r"),
        payload.alias("_r"),
    )
    left_cols = left.columns
    l = left.select(  # noqa: E741
        "*",
        F.lit(0).alias("_is_r"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
    )
    # right sorts before left at equal ts -> "<=" semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r.select(*on, ts_col, "_is_r", "_r"), allowMissingColumns=True).withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    )
    out = matched.where(F.col("_is_r") == 0)
    if tolerance is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_m._r_ts")
                >= F.col(ts_col) - F.expr(f"INTERVAL {tolerance}"),
                F.col("_m"),
            ),
        )
    return out.select(
        *left_cols,
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    right_cols: Sequence[str] = (),
    bucket_s: float | None = None,
) -> DataFrame:
    """Interval (range) join: all (left, right) pairs with equal ``on``
    keys and ``right_ts`` inside ``[left_ts + lower_s, left_ts +
    upper_s]`` (bounds in seconds, inclusive; negative = lookback).

    Scale shape: Spark plans a raw time-range predicate as a per-key
    theta join — O(|L|·|R|) per key. Here the range becomes an
    EQUI-join on (keys, time bucket): each left row emits the few
    buckets its window overlaps (≤2 when the bucket width covers the
    window span), each right row exactly one, and the exact bounds
    filter runs post-join. One hash-partition per side, candidate
    count linear in true matches per bucket.

    ``right_cols`` are the right-side payload columns to carry
    (right's ``on``/ts columns are internal); ``bucket_s`` overrides
    the bucket width (defaults to the window span).
    """
    assert upper_s >= lower_s
    on = list(on)
    right_cols = list(right_cols)
    w_us = int((bucket_s or max(upper_s - lower_s, 1.0)) * 1_000_000)
    lo = F.unix_micros(F.col(left_ts)) + int(lower_s * 1_000_000)
    hi = F.unix_micros(F.col(left_ts)) + int(upper_s * 1_000_000)
    l2 = left.withColumn(
        "_bk",
        F.explode(
            F.sequence(_floordiv(lo, w_us), _floordiv(hi, w_us))
        ),
    ).withColumn("_lo", lo).withColumn("_hi", hi)
    r_us = F.unix_micros(F.col("_r_ts"))
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c) for c in right_cols],
    ).withColumn("_bk", _floordiv(r_us, w_us))
    return (
        l2.join(r2, on=[*on, "_bk"])
        .where((r_us >= F.col("_lo")) & (r_us <= F.col("_hi")))
        .drop("_bk", "_lo", "_hi")
        .withColumnRenamed("_r_ts", f"{right_ts}_right")
    )
