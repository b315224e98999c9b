"""Find phase: which rows / files contain queued match ids.

Reference shape (backend/lambdas/tasks/execute_query.py:30-137): one
Athena SELECT per identifier column group, each an inner join of the lake
table against the match manifest on a stringified key, projecting
``DISTINCT "$path"``, UNION ALL'd across groups.

Spark-first re-expression:

- **Small match sets compile to predicates, not joins.** An ``isin`` on a
  typed column reaches the Parquet scan as an ``In`` pushed filter, so
  row groups whose min/max or dictionary exclude every match id are never
  read. At 100 TB this is the difference between scanning the identifier
  column of every file and skipping most files entirely. (The reference
  gets the analogous effect from Athena's pushdown.)
- **Large match sets switch to a broadcast left-semi join** against a
  typed in-memory match relation — the manifest is broadcast (it is tiny
  relative to the lake), the lake side never shuffles.
- All column groups that compile to predicates are OR-combined into ONE
  scan branch (single pass over the lake), instead of the reference's
  one-query-per-group fan-out; join-backed groups become additional
  branches, unioned, then ``distinct()`` on the file path.
- Partition pruning: apply ``partition_filter`` before calling — Catalyst
  turns it into static partition pruning, replacing the reference's
  one-query-per-partition fan-out (generate_queries.py:230-246).
"""

from __future__ import annotations

from functools import reduce
from operator import and_, or_

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from ..matches import ColumnGroup

# Above this many match values, an In-predicate stops pruning well and the
# broadcast semi-join path wins. Athena's practical bound on the same
# trade-off motivates the reference's manifest join design.
PREDICATE_VALUE_LIMIT = 2048

PATH_COL = "file_path"


def group_predicate(group: ColumnGroup) -> Column:
    """Compile a column group's match set to a boolean Column (P7/P8)."""
    if not group.composite:
        return F.col(group.columns[0]).isin(group.values)
    per_tuple = [
        reduce(
            and_,
            [F.col(c) == F.lit(v) for c, v in zip(group.columns, tup)],
        )
        for tup in group.values
    ]
    return reduce(or_, per_tuple)


def null_safe_predicate(group: ColumnGroup) -> Column:
    """Like group_predicate but never NULL (nulls never match — parity with
    the reference's typed compares where None is not in any match set)."""
    return F.coalesce(group_predicate(group), F.lit(False))


def matches_df(spark: SparkSession, group: ColumnGroup) -> DataFrame:
    """A typed in-memory relation of the group's match values (the Spark
    analog of one manifest partition, kept typed instead of stringified)."""
    fields = [
        StructField(f"_m{i}", dtype, False)
        for i, dtype in enumerate(group.types)
    ]
    rows = (
        [tuple(v) for v in group.values]
        if group.composite
        else [(v,) for v in group.values]
    )
    return spark.createDataFrame(rows, StructType(fields))


def _semi_join_branch(
    df: DataFrame, group: ColumnGroup, projection: list[Column]
) -> DataFrame:
    m = matches_df(df.sparkSession, group).dropDuplicates()
    t = df.alias("t")
    cond = reduce(
        and_,
        [
            F.col(f"t.{c}") == F.col(f"m._m{i}")
            for i, c in enumerate(group.columns)
        ],
    )
    return t.join(F.broadcast(m.alias("m")), cond, "left_semi").select(*projection)


def _branches(
    df: DataFrame,
    groups: list[ColumnGroup],
    projection: list[Column],
    predicate_value_limit: int,
) -> list[DataFrame]:
    predicate_groups = [g for g in groups if len(g.values) <= predicate_value_limit]
    join_groups = [g for g in groups if len(g.values) > predicate_value_limit]

    branches = []
    if predicate_groups:
        combined = reduce(or_, [group_predicate(g) for g in predicate_groups])
        branches.append(df.where(combined).select(*projection))
    for g in join_groups:
        branches.append(_semi_join_branch(df, g, projection))
    return branches


def find_affected_files(
    df: DataFrame,
    groups: list[ColumnGroup],
    predicate_value_limit: int = PREDICATE_VALUE_LIMIT,
) -> DataFrame:
    """J1/J2 + P1 + A1: distinct file paths containing >= 1 match.

    Returns a one-column DataFrame ``file_path``. The scan reads only the
    identifier columns (column pruning) and the pushed match predicates
    prune row groups / files.
    """
    if "_file_path" in df.columns:
        # non-native scans (e.g. the CSE-KMS mapInPandas decrypt) carry
        # provenance in an explicit column; input_file_name() is only
        # defined for native file-source scans
        projection = [F.col("_file_path").alias(PATH_COL)]
    else:
        projection = [F.input_file_name().alias(PATH_COL)]
    branches = _branches(df, groups, projection, predicate_value_limit)
    if not branches:
        return df.limit(0).select(*projection)
    return reduce(DataFrame.unionAll, branches).distinct()


def affected_partitions(df: DataFrame, partition_keys: list[str]) -> DataFrame:
    """A2: distinct combinations of a partition-key subset.

    When a mapper restricts ``PartitionKeys`` to a subset, several
    physical partitions collapse into one combination (reference
    generate_queries.py:230-241 — there it bounds the per-partition query
    fan-out; here it is exposed for batching/checkpointing granularity
    and job planning UIs). A distinct over partition columns is
    metadata-only for a partitioned scan: Catalyst answers it from the
    file index without reading data files.
    """
    return df.select(*partition_keys).distinct()


def find_matching_rows(
    df: DataFrame,
    groups: list[ColumnGroup],
    predicate_value_limit: int = PREDICATE_VALUE_LIMIT,
) -> DataFrame:
    """Row-granularity Find: the rows that WOULD be deleted (semi-join).

    Exposed for auditing ("which rows match?") and for oracle checking.
    """
    star = [F.col("*")]
    branches = _branches(df, groups, star, predicate_value_limit)
    if not branches:
        return df.limit(0)
    if len(branches) == 1:
        # single branch cannot produce duplicates — skip the wide dedup
        # (an all-columns hash aggregate + full shuffle at scale)
        return branches[0]
    return reduce(DataFrame.unionAll, branches).dropDuplicates()
