"""DataMapper source options: explicit schema (no inference pass) and
catalog-table locations (the Glue-table pointer analog)."""

import os
import shutil

import pytest

from amazon_s3_find_and_forget_spark.data_mappers import DataMapper
from amazon_s3_find_and_forget_spark.jobs import run_job
from amazon_s3_find_and_forget_spark.matches import QueueItem


@pytest.fixture()
def json_lake(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "jlake")
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).coalesce(
        1
    ).write.json(lake)
    return lake


def test_json_mapper_explicit_schema_skips_inference(spark, json_lake):
    ddl = "n_nationkey bigint, n_name string, n_regionkey bigint, n_comment string"
    m = DataMapper("j", json_lake, ["n_nationkey"], format="json", schema=ddl)
    df = m.read(spark)
    # the declared schema is used verbatim (inference would also pull
    # column order from data; here order and types come from the DDL)
    assert [f.name for f in df.schema.fields] == [
        "n_nationkey",
        "n_name",
        "n_regionkey",
        "n_comment",
    ]
    assert df.schema["n_nationkey"].dataType.simpleString() == "bigint"
    assert df.where("n_nationkey = 3").count() == 1


def test_json_mapper_schema_end_to_end_job(spark, json_lake):
    ddl = "n_nationkey bigint, n_name string, n_regionkey bigint, n_comment string"
    m = DataMapper("j", json_lake, ["n_nationkey"], format="json", schema=ddl)
    before = spark.read.json(json_lake).count()
    result = run_job(spark, [m], [QueueItem(match_id=3), QueueItem(match_id=7)])
    assert result.status == "COMPLETED"
    after = m.read(spark)
    assert after.count() == before - 2
    assert after.where("n_nationkey in (3, 7)").count() == 0


def test_catalog_table_mapper_find_forget(spark, tmp_path, sf_dir):
    lake = str(tmp_path / "tlake")
    os.makedirs(lake)
    for name in ("a", "b"):
        shutil.copy(
            os.path.join(sf_dir, "supplier.parquet"),
            os.path.join(lake, f"{name}.parquet"),
        )
    spark.sql("DROP TABLE IF EXISTS s3f2_suppliers")
    spark.catalog.createTable(
        "s3f2_suppliers", path=lake, source="parquet"
    )
    try:
        m = DataMapper("t", "table:s3f2_suppliers", ["s_suppkey"])
        before = spark.table("s3f2_suppliers").count()
        result = run_job(spark, [m], [QueueItem(match_id=1)])
        assert result.status == "COMPLETED"
        spark.sql("REFRESH TABLE s3f2_suppliers")
        after = spark.table("s3f2_suppliers")
        # the match id existed once per copied file
        assert after.count() == before - 2
        assert after.where("s_suppkey = 1").count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS s3f2_suppliers")
