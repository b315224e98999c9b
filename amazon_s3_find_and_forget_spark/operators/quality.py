"""Declarative data-quality checks over lake tables (Deequ/dbt-test
style, public pattern): each rule compiles to conditional aggregates so
the whole row-level rule set costs ONE scan of the table, plus one
keyed aggregate per uniqueness rule. Output is a tiny summary relation
— (rule, violations) — the shape a quality gate alerts on.

A deletion engine needs this surface twice over: pre-job (don't run
erasure against a corrupted table) and post-job (prove the rewrite
didn't damage what survived).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    ranges: dict[str, tuple] | None = None,
    accepted: dict[str, list] | None = None,
) -> DataFrame:
    """Violation counts for a declarative rule set.

    - ``not_null``: columns that must never be NULL.
    - ``unique``: column lists that must be row-unique (violations =
      surplus copies beyond the first of each duplicated key).
    - ``ranges``: ``col -> (lo, hi)`` inclusive bounds (NULLs are the
      not_null rule's business, not counted here).
    - ``accepted``: ``col -> [allowed values]`` (NULLs likewise skipped).

    Plan shape: every row-level rule becomes one conditional-sum column
    of a single aggregate — adding rules does not add scans; each
    uniqueness rule is one groupBy whose partial aggregation collapses
    duplicates map-side. Returns (rule string, violations long), one
    row per rule, deterministic rule order.
    """
    not_null = not_null or []
    unique = unique or []
    ranges = ranges or {}
    accepted = accepted or {}
    if len(set(not_null)) != len(not_null):
        raise ValueError("duplicate column in not_null rules")

    aggs = []
    names = []
    for c in not_null:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}")
        )
        names.append((f"nn_{c}", f"not_null({c})"))
    for c, (lo, hi) in ranges.items():
        aggs.append(
            F.sum(
                (
                    F.col(c).isNotNull()
                    & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi)))
                ).cast("long")
            ).alias(f"rg_{c}")
        )
        names.append((f"rg_{c}", f"range({c})"))
    for c, vals in accepted.items():
        aggs.append(
            F.sum(
                (F.col(c).isNotNull() & ~F.col(c).isin(list(vals))).cast(
                    "long"
                )
            ).alias(f"av_{c}")
        )
        names.append((f"av_{c}", f"accepted_values({c})"))

    rows = []
    if aggs:
        wide = df.agg(*aggs)
        rows.append(
            wide.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(rule).alias("rule"),
                                F.coalesce(
                                    F.col(alias), F.lit(0)
                                ).cast("long").alias("violations"),
                            )
                            for alias, rule in names
                        ]
                    )
                ).alias("_r")
            ).select("_r.rule", "_r.violations")
        )
    for cols in unique:
        dup = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > 1)
            .agg(
                F.coalesce(
                    F.sum(F.col("_n") - 1), F.lit(0)
                ).cast("long").alias("violations")
            )
            .select(
                F.lit(f"unique({', '.join(cols)})").alias("rule"),
                "violations",
            )
        )
        rows.append(dup)
    if not rows:
        raise ValueError("no rules given")
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("rule")
