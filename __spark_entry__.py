"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end deletion job (Find ->
surgical per-file Forget -> event fold) against a throwaway copy of the
sf0.001 lineitem table and returns the per-file stats DataFrame.

``queries()`` / ``oracle_sql()`` expose the engine's operator catalog
(amazon_s3_find_and_forget_spark.entry_queries) for the DuckDB
correctness gate.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazon_s3_find_and_forget_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full find+forget deletion job on a copy of sf0.001."""
    from amazon_s3_find_and_forget_spark.data_mappers import DataMapper
    from amazon_s3_find_and_forget_spark.jobs import run_job
    from amazon_s3_find_and_forget_spark.matches import QueueItem
    from amazon_s3_find_and_forget_spark.plans.forget import stats_df

    src = "/root/testdata/sf0.001/lineitem.parquet"
    workdir = tempfile.mkdtemp(prefix="s3f2-entry-")
    lake = os.path.join(workdir, "lineitem")
    os.makedirs(lake)
    shutil.copy(src, os.path.join(lake, "part-0.parquet"))

    mapper = DataMapper("lineitem", lake, ["l_orderkey"], format="parquet")
    items = [QueueItem(match_id=k) for k in entry_queries.MATCH_ORDERKEYS]
    result = run_job(spark, [mapper], items)
    return stats_df(spark, result.file_stats)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(entry_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(entry_queries.ORACLES)
