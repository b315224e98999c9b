"""End-to-end Find/Forget over Spark: semi-join plans, per-file rewrite,
job lifecycle — run against a throwaway copy of the sf0.001 tables."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from amazon_s3_find_and_forget_spark.data_mappers import DataMapper, check_no_overlap
from amazon_s3_find_and_forget_spark.jobs import fold_status, run_job
from amazon_s3_find_and_forget_spark.matches import (
    QueueItem,
    build_column_groups,
    build_manifest_df,
    route_items,
)
from amazon_s3_find_and_forget_spark.plans.find import (
    find_affected_files,
    find_matching_rows,
)
from amazon_s3_find_and_forget_spark.plans.forget import forget_files, forget_table


@pytest.fixture()
def lake(tmp_path, spark, sf_dir):
    """Copy lineitem into a multi-file lake we can rewrite."""
    src = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    loc = str(tmp_path / "lineitem")
    src.repartition(4).write.parquet(loc)
    return loc


def test_find_affected_files_predicate_path(spark, lake):
    df = spark.read.parquet(lake)
    items = [QueueItem(match_id=1), QueueItem(match_id=3)]
    groups = build_column_groups(df.schema, ["l_orderkey"], items)
    paths = find_affected_files(df, groups)
    assert paths.columns == ["file_path"]
    hit = [r[0] for r in paths.collect()]
    # every affected file really contains a match
    expected = {
        r[0]
        for r in df.where(F.col("l_orderkey").isin([1, 3]))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert set(hit) == expected and len(hit) >= 1


def test_find_semi_join_path_same_result(spark, lake):
    df = spark.read.parquet(lake)
    items = [QueueItem(match_id=i) for i in (1, 3, 5)]
    groups = build_column_groups(df.schema, ["l_orderkey"], items)
    pred = {r[0] for r in find_affected_files(df, groups).collect()}
    joined = {
        r[0]
        for r in find_affected_files(df, groups, predicate_value_limit=0).collect()
    }
    assert pred == joined


def test_find_matching_rows(spark, lake):
    df = spark.read.parquet(lake)
    items = [QueueItem(match_id=1)]
    groups = build_column_groups(df.schema, ["l_orderkey"], items)
    rows = find_matching_rows(df, groups)
    assert rows.count() == df.where("l_orderkey = 1").count()


def test_forget_table_null_safe(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",)], "customer_id string"
    )
    items = [QueueItem(match_id="a")]
    groups = build_column_groups(df.schema, ["customer_id"], items)
    out = forget_table(df, groups)
    assert sorted(
        [r[0] for r in out.collect()], key=lambda x: (x is None, x)
    ) == ["b", None]


def test_end_to_end_job(spark, lake):
    df = spark.read.parquet(lake)
    before = df.count()
    victims = df.where("l_orderkey in (1, 3)").count()
    assert victims > 0

    mapper = DataMapper("lineitem", lake, ["l_orderkey"], format="parquet")
    mapper.validate(spark)
    items = [QueueItem(match_id=1), QueueItem(match_id=3)]
    result = run_job(spark, [mapper], items)

    assert result.status == "COMPLETED"
    assert sum(s[3] for s in result.file_stats) == victims
    spark.catalog.clearCache()
    after = spark.read.parquet(lake)
    assert after.count() == before - victims
    assert after.where("l_orderkey in (1, 3)").count() == 0
    # schema preserved
    assert after.schema == df.schema


def test_job_composite(spark, tmp_path):
    loc = str(tmp_path / "people")
    spark.createDataFrame(
        [("John", "Doe", 1), ("Jane", "Doe", 2), ("John", "Smith", 3)],
        "first_name string, last_name string, id bigint",
    ).coalesce(1).write.parquet(loc)
    mapper = DataMapper("people", loc, ["id"], format="parquet")
    items = [
        QueueItem(
            match_id=[
                {"Column": "first_name", "Value": "John"},
                {"Column": "last_name", "Value": "Doe"},
            ],
            type="Composite",
            data_mappers=["people"],
        )
    ]
    result = run_job(spark, [mapper], items)
    assert result.status == "COMPLETED"
    spark.catalog.clearCache()
    kept = spark.read.parquet(loc).collect()
    assert sorted((r[0], r[1]) for r in kept) == [("Jane", "Doe"), ("John", "Smith")]


def test_job_find_forget_consistency_failure(spark, tmp_path):
    """Forget deleting 0 rows fails the object (main.py:182-187 parity)."""
    loc = str(tmp_path / "t")
    spark.createDataFrame([("a",), ("b",)], "customer_id string").coalesce(
        1
    ).write.parquet(loc)
    files = [
        r[0]
        for r in spark.read.parquet(loc)
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]
    items = [QueueItem(match_id="zzz")]
    df = spark.read.parquet(loc)
    groups = build_column_groups(df.schema, ["customer_id"], items)
    stats = forget_files(spark, files, groups, fmt="parquet")
    assert stats[0][4] == "failed"
    assert "no rows deleted" in stats[0][5]


def test_routing(spark):
    items = [
        QueueItem(match_id="a"),
        QueueItem(match_id="b", data_mappers=["m1"]),
        QueueItem(match_id="c", data_mappers=["m2"]),
    ]
    routed = route_items(items, "m1")
    assert [i.match_id for i in routed] == ["a", "b"]


def test_manifest_roundtrip(spark, tmp_path):
    items = [
        QueueItem(match_id="12345"),
        QueueItem(
            match_id=[
                {"Column": "last_name", "Value": "Doe"},
                {"Column": "first_name", "Value": "John"},
            ],
            type="Composite",
            data_mappers=["m1"],
        ),
    ]
    mdf = build_manifest_df(spark, "job1", "m1", ["customer_id"], items)
    rows = {r["QueryableColumns"]: r for r in mdf.collect()}
    assert rows["customer_id"]["QueryableMatchId"] == "12345"
    # composite columns canonically sorted (O2)
    assert rows["first_name_S3F2COMP_last_name"]["QueryableMatchId"] == (
        "John_S3F2COMP_Doe"
    )
    path = str(tmp_path / "manifests")
    mdf.write.partitionBy("JobId", "DataMapperId").json(path)
    back = spark.read.json(path)
    assert back.count() == 2


def test_overlap_check():
    a = DataMapper("a", "/lake/x", ["c"])
    b = DataMapper("b", "/lake/x/sub", ["c"])
    c = DataMapper("c", "/lake/y", ["c"])
    check_no_overlap([a, c])
    with pytest.raises(ValueError, match="overlap"):
        check_no_overlap([a, b])


def test_status_fold():
    evs = [
        {"EventName": "JobStarted", "CreatedAt": 1},
        {"EventName": "ForgetPhaseEnded", "CreatedAt": 2},
        {"EventName": "CleanupSucceeded", "CreatedAt": 3},
    ]
    out = fold_status(evs)
    assert out["JobStatus"] == "COMPLETED"
    assert out["JobStartTime"] == 1
    assert out["JobFinishTime"] == 3


def test_status_fold_partial_failure():
    evs = [
        {"EventName": "JobStarted", "CreatedAt": 1},
        {"EventName": "ForgetPhaseEnded", "CreatedAt": 2},
    ]
    out = fold_status(evs, {"TotalObjectUpdateFailedCount": 1})
    assert out["JobStatus"] == "FORGET_PARTIALLY_FAILED"
    assert out["JobFinishTime"] == 2


def test_status_fold_locked_terminal():
    evs = [
        {"EventName": "JobStarted", "CreatedAt": 1},
        {"EventName": "FindPhaseFailed", "CreatedAt": 2},
        {"EventName": "CleanupSucceeded", "CreatedAt": 3},
    ]
    out = fold_status(evs)
    assert out["JobStatus"] == "FIND_FAILED"  # terminal state locked


def test_single_column_composite_folds_into_simple_group(spark, tmp_path, sf_dir):
    """A one-column Composite match must not poison the simple group's
    scalar isin with tuples (regression: LITERAL_TYPE ArrayList error)."""
    import os
    import shutil

    from amazon_s3_find_and_forget_spark.data_mappers import DataMapper
    from amazon_s3_find_and_forget_spark.jobs import run_job
    from amazon_s3_find_and_forget_spark.matches import (
        QueueItem,
        build_column_groups,
    )

    lake = tmp_path / "li"
    lake.mkdir()
    shutil.copy(os.path.join(sf_dir, "lineitem.parquet"), lake / "p.parquet")
    df = spark.read.parquet(str(lake))
    items = [
        QueueItem(match_id=1),
        QueueItem(
            match_id=[{"Column": "l_orderkey", "Value": 3}],
            type="Composite",
            data_mappers=["li"],
        ),
    ]
    groups = build_column_groups(df.schema, ["l_orderkey"], items)
    assert len(groups) == 1 and not groups[0].composite
    assert groups[0].values == [1, 3]

    result = run_job(spark, [DataMapper("li", str(lake), ["l_orderkey"])], items)
    assert result.status == "COMPLETED", result.events
    after = spark.read.parquet(str(lake))
    assert after.where("l_orderkey in (1, 3)").count() == 0


def test_transient_query_failure_recovers_to_completed(
    spark, tmp_path, monkeypatch
):
    """A Find attempt that fails once and succeeds on retry must end the
    job COMPLETED (QueryFailed only fires when the budget is exhausted —
    reference state_machine.yaml 'Retriable?' -> 'Emit Error')."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from amazon_s3_find_and_forget_spark.data_mappers import DataMapper
    from amazon_s3_find_and_forget_spark.jobs import run_job
    from amazon_s3_find_and_forget_spark.matches import QueueItem
    from amazon_s3_find_and_forget_spark.plans import find as find_mod

    lake = tmp_path / "lake"
    lake.mkdir()
    pq.write_table(
        pa.table({"customer_id": pa.array([1, 2, 3], pa.int64())}),
        str(lake / "f.parquet"),
    )
    real = find_mod.find_affected_files
    calls = {"n": 0}

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient query failure")
        return real(*args, **kwargs)

    monkeypatch.setattr(find_mod, "find_affected_files", flaky)
    result = run_job(
        spark,
        [DataMapper("t", str(lake), ["customer_id"])],
        [QueueItem(match_id=2)],
        query_max_retries=2,
    )
    assert calls["n"] == 2
    assert result.status == "COMPLETED", result.events
    assert result.counters["TotalQueryFailedCount"] == 0
    names = [e["EventName"] for e in result.events]
    assert "QueryRetried" in names and "QueryFailed" not in names
    assert "CleanupSucceeded" in names


def test_dataframe_handoff_matches_list_path(spark, tmp_path):
    """Forcing the large-job path (threshold 0) must rewrite the same
    rows with equal counters/status as the driver-list path — with the
    path list never collected and per-status summary events instead of
    per-object ones."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from amazon_s3_find_and_forget_spark.data_mappers import DataMapper
    from amazon_s3_find_and_forget_spark.jobs import run_job
    from amazon_s3_find_and_forget_spark.matches import QueueItem

    results = {}
    for mode, threshold in (("list", 100_000), ("dataframe", 0)):
        lake = tmp_path / f"lake-{mode}"
        lake.mkdir()
        for i, ids in enumerate(([1, 2, 3, 4], [5, 6, 7, 8])):
            pq.write_table(
                pa.table({"customer_id": pa.array(ids, pa.int64())}),
                str(lake / f"part-{i}.parquet"),
            )
        result = run_job(
            spark,
            [DataMapper(f"m{mode}", str(lake), ["customer_id"])],
            [QueueItem(match_id=2), QueueItem(match_id=7)],
            path_handoff_threshold=threshold,
        )
        assert result.status == "COMPLETED", result.events
        survivors = sorted(
            r.customer_id for r in spark.read.parquet(str(lake)).collect()
        )
        results[mode] = (survivors, result.counters)
    assert results["list"][0] == results["dataframe"][0] == [1, 3, 4, 5, 6, 8]
    assert results["list"][1] == results["dataframe"][1]


def test_manifest_registered_as_catalog_table(spark, tmp_path):
    """S7 closure: manifests land in the metastore partitioned by
    (JobId, DataMapperId) — one partition per job/mapper, read back via
    spark.table with partition pruning."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from amazon_s3_find_and_forget_spark.data_mappers import DataMapper
    from amazon_s3_find_and_forget_spark.jobs import run_job
    from amazon_s3_find_and_forget_spark.matches import QueueItem

    table = "s3f2_manifests_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    lake = tmp_path / "lake"
    lake.mkdir()
    pq.write_table(
        pa.table({"customer_id": pa.array([1, 2, 3], pa.int64())}),
        str(lake / "f.parquet"),
    )
    for job, match in (("job-a", 2), ("job-b", 3)):
        run_job(
            spark,
            [DataMapper("m1", str(lake), ["customer_id"])],
            [QueueItem(match_id=match)],
            job_id=job,
            manifest_table=table,
        )
    man = spark.table(table)
    assert {"JobId", "DataMapperId", "MatchId", "QueryableMatchId"} <= set(
        man.columns
    )
    jobs = {r.JobId for r in man.select("JobId").distinct().collect()}
    assert jobs == {"job-a", "job-b"}
    one = man.where(
        (man.JobId == "job-a") & (man.DataMapperId == "m1")
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "job-a" in plan  # pruning, not scan
    assert [r.QueryableMatchId for r in one.collect()] == ["2"]
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_job_on_schema_evolved_lake(spark, tmp_path):
    """A lake whose older files predate a later-added column: the job
    must find matches across both vintages, rewrite each file with ITS
    OWN schema (an old file must not grow the new column), and leave
    survivors intact."""
    loc = str(tmp_path / "evolved")
    os.makedirs(loc)
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "cid long, name string"
    ).coalesce(1).write.parquet(loc + "/old")
    spark.createDataFrame(
        [(4, "d", "x@y.z"), (5, "e", "p@q.r")],
        "cid long, name string, email string",
    ).coalesce(1).write.parquet(loc + "/new")

    mapper = DataMapper(
        mapper_id="ev",
        location=loc + "/*/*.parquet",
        columns=["cid"],
        format="parquet",
        schema="cid bigint, name string, email string",
    )
    items = [QueueItem(match_id=2), QueueItem(match_id=5)]
    result = run_job(spark, [mapper], items)
    assert result.status == "COMPLETED"

    survivors = spark.read.schema("cid long, name string, email string").parquet(
        loc + "/old", loc + "/new"
    )
    assert sorted(r.cid for r in survivors.collect()) == [1, 3, 4]
    # the old file keeps its 2-column schema — no silent widening
    import pyarrow.parquet as pq_mod
    import glob as glob_mod

    old_file = glob_mod.glob(loc + "/old/*.parquet")[0]
    assert pq_mod.read_schema(old_file).names == ["cid", "name"]
    new_file = glob_mod.glob(loc + "/new/*.parquet")[0]
    assert pq_mod.read_schema(new_file).names == ["cid", "name", "email"]


def test_forget_table_redact_mode(spark):
    df = spark.createDataFrame(
        [("a", "s1", 1), (None, "s2", 2), ("b", "s3", 3)],
        "customer_id string, secret string, n bigint",
    )
    items = [QueueItem(match_id="a")]
    groups = build_column_groups(df.schema, ["customer_id"], items)
    out = forget_table(df, groups, redact_columns=["customer_id", "secret"])
    rows = sorted(out.collect(), key=lambda r: r["n"])
    # matched row: both columns nulled, row kept; NULL identifier never
    # matches (null-safe), untouched row intact
    assert [tuple(r) for r in rows] == [
        (None, None, 1),
        (None, "s2", 2),
        ("b", "s3", 3),
    ]
    assert out.count() == 3
    assert out.schema == df.schema


def test_forget_table_redact_nested_field(spark):
    df = spark.createDataFrame(
        [(1, {"email": "e1", "age": 30}), (2, {"email": "e2", "age": 40})],
        "id bigint, user struct<email: string, age: bigint>",
    )
    items = [QueueItem(match_id=1)]
    groups = build_column_groups(df.schema, ["id"], items)
    out = forget_table(df, groups, redact_columns=["user.email"])
    rows = {r["id"]: r["user"].asDict() for r in out.collect()}
    assert rows[1] == {"email": None, "age": 30}
    assert rows[2] == {"email": "e2", "age": 40}
    assert out.schema == df.schema


def test_job_redact_mode_end_to_end(spark, tmp_path):
    loc = str(tmp_path / "people")
    spark.createDataFrame(
        [("u1", "a@x", "bio1"), ("u2", "b@x", "bio2"), ("u3", "c@x", "bio3")],
        "user_id string, email string, bio string",
    ).coalesce(1).write.parquet(loc)
    mapper = DataMapper(
        "people",
        loc,
        ["user_id"],
        format="parquet",
        delete_mode="redact",
        redact_columns=["email", "bio"],
    )
    mapper.validate(spark)
    items = [QueueItem(match_id="u1"), QueueItem(match_id="u3")]
    result = run_job(spark, [mapper], items)
    assert result.status == "COMPLETED"
    # stats count redacted rows through the same deleted_rows channel
    assert sum(s[3] for s in result.file_stats) == 2
    spark.catalog.clearCache()
    after = spark.read.parquet(loc)
    assert after.count() == 3  # no row deleted
    got = {r["user_id"]: (r["email"], r["bio"]) for r in after.collect()}
    assert got == {
        "u1": (None, None),
        "u2": ("b@x", "bio2"),
        "u3": (None, None),
    }


def test_job_redact_default_columns_are_identifiers(spark, tmp_path):
    loc = str(tmp_path / "t")
    spark.createDataFrame(
        [("u1", 1), ("u2", 2)], "user_id string, n bigint"
    ).coalesce(1).write.parquet(loc)
    mapper = DataMapper(
        "t", loc, ["user_id"], format="parquet", delete_mode="redact"
    )
    result = run_job(spark, [mapper], [QueueItem(match_id="u1")])
    assert result.status == "COMPLETED"
    spark.catalog.clearCache()
    got = sorted(
        spark.read.parquet(loc).collect(), key=lambda r: r["n"]
    )
    assert [tuple(r) for r in got] == [(None, 1), ("u2", 2)]


def test_redact_mapper_validation():
    with pytest.raises(ValueError, match="delete mode"):
        DataMapper("x", "/tmp/x", ["a"], delete_mode="purge")
    with pytest.raises(ValueError, match="RedactColumns requires"):
        DataMapper("x", "/tmp/x", ["a"], redact_columns=["b"])
    with pytest.raises(ValueError, match="partition key"):
        DataMapper(
            "x",
            "/tmp/x",
            ["a"],
            partition_keys=["dt"],
            delete_mode="redact",
            redact_columns=["dt"],
        )


# --- chaos tests: the distributed (DataFrame) Forget handoff ---------------


def _chaos_synthetic_factory():
    """store_factory for the 100k-path scale test, pickled BY VALUE into
    each task (the test module is not importable from executor workers,
    so everything — including the store class — is defined inside the
    closure): serves the same tiny closure-captured parquet object for
    every path; one path has vanished mid-job and one hits a
    concurrent-writer conflict at commit time."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(
        pa.table({"customer_id": pa.array([1, 2, 3], pa.int64())}), buf
    )
    blob = buf.getvalue()  # built on the driver, ships in the closure

    def factory(arn):
        from amazon_s3_find_and_forget_spark.sources.object_store import (
            ObjectProperties,
            VersionConflictError,
        )

        class Store:
            def get_object_and_version(self, path):
                if path.endswith("/vanished.parquet"):
                    raise FileNotFoundError(path)
                return blob, "v1"

            def get_properties(self, path):
                return ObjectProperties()

            def save(self, path, data, properties=None):
                return "v2"

            def verify_version_integrity(self, path, from_v, new_v):
                if path.endswith("/conflict.parquet"):
                    raise VersionConflictError("concurrent write detected")

            def rollback_version(self, path, version):
                pass

            def delete_old_versions(self, path, keep_version):
                return 0

        return Store()

    return factory


def test_forget_files_df_100k_paths_with_failures(spark):
    """Chaos e2e at the handoff scale point: 100,001 affected paths —
    past the run_job threshold where the path list must never touch the
    driver — with one object vanished mid-job (ignore_not_found) and
    one concurrent-writer conflict forcing a rollback. The per-file
    stats relation must aggregate the exact per-status counts
    distributively."""
    from pyspark.sql import functions as F

    from amazon_s3_find_and_forget_spark.matches import ColumnGroup
    from amazon_s3_find_and_forget_spark.plans.forget import forget_files_df

    n = 100_001
    paths_df = spark.range(n - 2).select(
        F.concat(F.lit("s3://lake/f"), F.col("id"), F.lit(".parquet")).alias(
            "file_path"
        )
    ).unionAll(
        spark.createDataFrame(
            [("s3://lake/vanished.parquet",), ("s3://lake/conflict.parquet",)],
            "file_path string",
        )
    )
    groups = [ColumnGroup(["customer_id"], ["bigint"], [2], composite=False)]
    stats = forget_files_df(
        spark,
        paths_df,
        groups,
        fmt="parquet",
        ignore_not_found=True,
        store_factory=_chaos_synthetic_factory(),
    )
    rollup = {
        r["status"]: (int(r["n"]), int(r["deleted"] or 0))
        for r in stats.groupBy("status").agg(
            F.count(F.lit(1)).alias("n"), F.sum("deleted_rows").alias("deleted")
        ).collect()
    }
    assert rollup["updated"] == (n - 2, n - 2)  # one deleted row each
    assert rollup["skipped"] == (1, 0)
    assert rollup["failed"] == (1, 0)  # the rolled-back conflict
    err = stats.where(F.col("status") == "failed").collect()
    assert len(err) == 1 and "VersionConflictError" in err[0]["error"]


def _chaos_local_factory():
    """LocalObjectStore wrapper injecting the same two failures by
    basename — pickled by value (see _chaos_synthetic_factory); used
    through run_job's DataFrame handoff so the EVENTS and counters
    aggregation is exercised end to end."""

    def factory(arn):
        import os as _os

        from amazon_s3_find_and_forget_spark.sources.object_store import (
            LocalObjectStore,
            VersionConflictError,
        )

        class Store(LocalObjectStore):
            def get_object_and_version(self, path):
                if _os.path.basename(path) == "vanished.parquet":
                    raise FileNotFoundError(path)
                return super().get_object_and_version(path)

            def verify_version_integrity(self, path, from_v, new_v):
                if _os.path.basename(path) == "conflict.parquet":
                    raise VersionConflictError("concurrent write detected")
                return super().verify_version_integrity(path, from_v, new_v)

        return Store()

    return factory


def test_run_job_dataframe_handoff_chaos_events(spark, tmp_path):
    """run_job through the large-job (DataFrame) path with one vanished
    object and one rollback: per-status summary events and counters must
    aggregate correctly, the conflict file must roll back to its
    pre-job bytes, and the job must end FORGET_PARTIALLY_FAILED."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from amazon_s3_find_and_forget_spark.data_mappers import DataMapper
    from amazon_s3_find_and_forget_spark.jobs import run_job
    from amazon_s3_find_and_forget_spark.matches import QueueItem

    lake = tmp_path / "lake"
    lake.mkdir()
    for name, ids in (
        ("good.parquet", [1, 2]),
        ("vanished.parquet", [3, 4]),
        ("conflict.parquet", [5, 6]),
    ):
        pq.write_table(
            pa.table({"customer_id": pa.array(ids, pa.int64())}),
            str(lake / name),
        )
    result = run_job(
        spark,
        [DataMapper("t", str(lake), ["customer_id"],
                     ignore_object_not_found=True)],
        [QueueItem(match_id=2), QueueItem(match_id=4), QueueItem(match_id=6)],
        path_handoff_threshold=0,  # force the DataFrame handoff
        store_factory=_chaos_local_factory(),
    )
    assert result.status == "FORGET_PARTIALLY_FAILED", result.events
    assert result.counters["TotalObjectUpdateFailedCount"] == 1
    assert result.counters["TotalQueryFailedCount"] == 0
    summaries = {
        e["EventData"]["Status"]: e["EventData"]
        for e in result.events
        if e["EventName"] == "ObjectUpdateSummary"
    }
    assert summaries["updated"]["Objects"] == 1
    assert summaries["updated"]["DeletedRows"] == 1
    assert summaries["skipped"]["Objects"] == 1
    assert summaries["failed"]["Objects"] == 1
    assert "VersionConflictError" in summaries["failed"]["SampleError"]

    spark.catalog.clearCache()
    got = {
        os.path.basename(p): sorted(
            r.customer_id
            for r in spark.read.parquet(str(lake / p)).collect()
        )
        for p in ("good.parquet", "vanished.parquet", "conflict.parquet")
    }
    assert got["good.parquet"] == [1]          # 2 deleted
    assert got["vanished.parquet"] == [3, 4]   # skipped, untouched
    assert got["conflict.parquet"] == [5, 6]   # rolled back to pre-job
