"""Sequential event analytics: ordered funnels, transition timing, and
cohort retention.

Both operate on an ``events``-shaped table (``user_id bigint,
ts timestamp, event_type string``) and keep everything keyed by the
user column — the natural shard key for behavioral data — so every
shuffle is user-keyed and partial aggregation collapses per-user
event mass map-side before anything moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized(
    events: DataFrame, user_col: str, ts_col: str, type_col: str
) -> DataFrame:
    """NULL-free (user, ts, type) projection — sequence position is
    undefined for NULL users/timestamps."""
    return events.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_ty"),
    )


def _step_name(step) -> str:
    return step if isinstance(step, str) else "|".join(step)


def _frontier_chain(ev: DataFrame, steps: list) -> list[DataFrame]:
    """THE greedy strictly-after matcher, shared by every funnel
    operator so counts and timings can never desynchronize: step i's
    frontier is one row per user — the earliest matching event strictly
    after the user's step i-1 instant. A step is an event type OR a
    list of types (any-of matching — "view or open"). Each frontier is
    persist()-ed (it feeds both its own aggregate and the next step's
    join); the CALLER unpersists all of them after materializing its
    result.
    """
    frontier = None
    frontiers = []
    for step in steps:
        matched = ev.where(
            F.col("_ty") == step
            if isinstance(step, str)
            else F.col("_ty").isin(list(step))
        )
        if frontier is not None:
            matched = matched.join(
                frontier.select("_u", "_prev"), "_u"
            ).where(F.col("_ts") > F.col("_prev"))
        frontier = (
            matched.groupBy("_u").agg(F.min("_ts").alias("_prev")).persist()
        )
        frontiers.append(frontier)
    return frontiers


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion counts.

    For each prefix of ``steps``, the number of distinct users whose
    event stream contains the prefix as a STRICTLY time-increasing
    subsequence (first-touch semantics: each step matches at the
    earliest instant after the previous step's match — the standard
    greedy matching, which finds a subsequence iff one exists).

    Plan shape: one filtered min-aggregate per step, chained through
    user-keyed joins — the frontier relation is one row per surviving
    user and SHRINKS monotonically down the funnel, so every join after
    step 1 is against an ever-smaller right side (AQE broadcasts it
    when it fits). Never a per-user event-list collect: a hot user with
    millions of events costs one map-side partial min per step, not a
    sort or an array.

    NULL users/timestamps are excluded (sequence position undefined).

    Returns one row per step: (step, step_name, users), where ``step``
    is the 1-based prefix length.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = _normalized(events, user_col, ts_col, type_col)
    frontiers = _frontier_chain(ev, steps)
    rows = [
        frontier.agg(F.count(F.lit(1)).cast("long").alias("users")).select(
            F.lit(i + 1).cast("long").alias("step"),
            F.lit(_step_name(step)).alias("step_name"),
            "users",
        )
        for i, (step, frontier) in enumerate(zip(steps, frontiers))
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    try:
        # len(steps) rows — eager materialization doubles as the cache
        # release point (same discipline as the dedup operators)
        return out.orderBy("step").localCheckpoint(eager=True)
    finally:
        for fr in frontiers:
            fr.unpersist()


def _weekly_activity(
    events: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """(user, cohort_week, week_offset) per activity row — THE first-touch
    and week arithmetic shared by both retention triangles."""
    ev = events.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"))
    firsts = ev.groupBy("_u").agg(
        F.date_trunc("week", F.min("_ts")).alias("_cohort")
    )
    return ev.join(firsts, "_u").select(
        "_u",
        "_cohort",
        (
            F.datediff(F.date_trunc("week", F.col("_ts")), F.col("_cohort"))
            / 7
        )
        .cast("long")
        .alias("week_offset"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention triangle.

    A user's cohort is the Monday-truncated week of their FIRST event;
    for every (cohort, week offset) cell, the number of distinct cohort
    members active in that week. Offsets compare week-truncated dates,
    so they are exact week counts (both engines truncate weeks to
    Monday — the difference of two week-starts is always a multiple of
    7 days).

    Plan shape: one user-keyed min-aggregate (first touch), a user-keyed
    join back to the event stream, then a (cohort, offset)-keyed
    distinct-count. The firsts relation is one row per user — at any
    scale it is the smaller side and AQE broadcast-joins it; the
    distinct-count's expand shuffles (cohort, offset, user) triples,
    which partial aggregation dedups map-side first.

    Returns (cohort_week timestamp, week_offset long, active_users).
    """
    return (
        _weekly_activity(events, user_col, ts_col)
        .groupBy(F.col("_cohort").alias("cohort_week"), "week_offset")
        .agg(F.count_distinct(F.col("_u")).cast("long").alias("active_users"))
    )


def funnel_transition_stats(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert statistics for each funnel transition.

    For every consecutive step pair (i-1 -> i), over the users who
    reached step i under the same greedy strictly-after matching as
    ``funnel_counts``: how many converted, and the mean / exact median
    seconds between the two matched instants. The exact interpolated
    percentile (not an approximate sketch) keeps the result
    oracle-comparable; swap in ``percentile_approx`` when a sketch is
    acceptable at extreme group sizes.

    Same plan skeleton as ``funnel_counts`` — chained user-keyed
    min-aggregates; the extra work is one join per transition between
    two one-row-per-user frontiers (the smaller of which AQE
    broadcasts).

    Returns (step, step_name, n_users, avg_secs, p50_secs) for steps
    2..len(steps).
    """
    if len(steps) < 2:
        raise ValueError("need at least two steps for transitions")
    ev = _normalized(events, user_col, ts_col, type_col)
    frontiers = _frontier_chain(ev, steps)
    rows = []
    for i in range(1, len(steps)):
        delta = (
            frontiers[i]
            .join(
                frontiers[i - 1].select(
                    "_u", F.col("_prev").alias("_prev0")
                ),
                "_u",
            )
            .select(
                (
                    F.col("_prev").cast("double")
                    - F.col("_prev0").cast("double")
                ).alias("_secs")
            )
        )
        rows.append(
            delta.agg(
                F.count(F.lit(1)).cast("long").alias("n_users"),
                F.round(F.avg("_secs"), 4).alias("avg_secs"),
                F.round(F.percentile("_secs", F.lit(0.5)), 4).alias(
                    "p50_secs"
                ),
            ).select(
                F.lit(i + 1).cast("long").alias("step"),
                F.lit(_step_name(steps[i])).alias("step_name"),
                "n_users",
                "avg_secs",
                "p50_secs",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    try:
        return out.orderBy("step").localCheckpoint(eager=True)
    finally:
        for fr in frontiers:
            fr.unpersist()


def funnel_counts_by(
    events: DataFrame,
    steps: list,
    segments: DataFrame,
    segment_col: str = "segment",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion counts broken down by a user dimension.

    ``segments`` is a (user, segment) dimension relation — one row per
    user (a customer table, an experiment-arm assignment). The matcher
    is the SAME shared frontier chain as ``funnel_counts``; the segment
    only enters at count time, as a left join of each one-row-per-user
    frontier against the dimension — users without a dimension row
    count under 'unknown'. The join is left UNHINTED on purpose: AQE
    broadcasts the dimension whenever it fits and falls back to a
    shuffle join for dimensions past the broadcast limit — a forced
    F.broadcast() would hard-fail at ~8 GB instead of degrading.

    Returns (step, step_name, segment, users), ordered by step then
    segment.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = _normalized(events, user_col, ts_col, type_col)
    seg = segments.select(
        F.col(user_col).alias("_u"), F.col(segment_col).alias("_seg")
    )
    frontiers = _frontier_chain(ev, steps)
    rows = [
        frontier.join(seg, "_u", "left")
        .groupBy(
            F.coalesce("_seg", F.lit("unknown")).alias(segment_col)
        )
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .select(
            F.lit(i + 1).cast("long").alias("step"),
            F.lit(_step_name(step)).alias("step_name"),
            segment_col,
            "users",
        )
        for i, (step, frontier) in enumerate(zip(steps, frontiers))
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    try:
        return out.orderBy("step", segment_col).localCheckpoint(eager=True)
    finally:
        for fr in frontiers:
            fr.unpersist()


def cohort_retention_by(
    events: DataFrame,
    segments: DataFrame,
    segment_col: str = "segment",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """The retention triangle broken down by a user dimension.

    Same activity relation as ``cohort_retention`` (shared helper —
    the two triangles can never diverge on week arithmetic) with the
    (user, segment) dimension joined on before the distinct-count;
    users without a dimension row count under 'unknown'. Unhinted join:
    AQE broadcasts a fitting dimension, larger ones shuffle.

    Returns (cohort_week, week_offset, segment, active_users).
    """
    seg = segments.select(
        F.col(user_col).alias("_u"), F.col(segment_col).alias("_seg")
    )
    return (
        _weekly_activity(events, user_col, ts_col)
        .join(seg, "_u", "left")
        .select(
            "_u",
            "_cohort",
            "week_offset",
            F.coalesce("_seg", F.lit("unknown")).alias(segment_col),
        )
        .groupBy(
            F.col("_cohort").alias("cohort_week"), "week_offset", segment_col
        )
        .agg(F.count_distinct(F.col("_u")).cast("long").alias("active_users"))
    )
