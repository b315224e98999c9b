"""Forget safety envelope: version store, integrity check, rollback,
old-version deletion (local analog of reference s3.py:224-357)."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from amazon_s3_find_and_forget_spark.data_mappers import DataMapper
from amazon_s3_find_and_forget_spark.matches import QueueItem
from amazon_s3_find_and_forget_spark.plans.forget import _rewrite_one
from amazon_s3_find_and_forget_spark.sources import versions


def _write_parquet(path, ids):
    pq.write_table(pa.table({"customer_id": pa.array(ids, pa.int64())}), path)


def _read_ids(path):
    return pq.read_table(path).column("customer_id").to_pylist()


SPEC = [{"Type": "Simple", "Column": "customer_id", "MatchIds": [2, 3]}]


def test_commit_integrity_conflict(tmp_path):
    obj = str(tmp_path / "data.parquet")
    _write_parquet(obj, [1, 2, 3])
    snap = versions.snapshot(obj)
    # concurrent writer slips in between read and commit
    _write_parquet(obj, [1, 2, 3, 4])
    tmp = str(tmp_path / "tmp.parquet")
    _write_parquet(tmp, [1])
    with pytest.raises(versions.VersionIntegrityError):
        versions.commit(obj, tmp, snap)
    # object untouched by the failed commit
    assert _read_ids(obj) == [1, 2, 3, 4]


def test_rewrite_keeps_old_version_and_restores(tmp_path):
    obj = str(tmp_path / "data.parquet")
    _write_parquet(obj, [1, 2, 3])
    row = _rewrite_one(obj, "parquet", SPEC, False, delete_old_versions=False)
    assert row[4] == "updated" and row[3] == 2
    assert _read_ids(obj) == [1]
    vs = versions.list_versions(obj)
    assert len(vs) == 1
    versions.restore_version(obj)
    assert _read_ids(obj) == [1, 2, 3]
    assert versions.list_versions(obj) == []


def test_rewrite_purges_history_by_default(tmp_path):
    obj = str(tmp_path / "data.parquet")
    _write_parquet(obj, [1, 2, 3])
    # build up history first
    _rewrite_one(obj, "parquet", [{"Type": "Simple", "Column": "customer_id",
                                   "MatchIds": [3]}], False,
                 delete_old_versions=False)
    assert len(versions.list_versions(obj)) == 1
    # delete_old_versions=True purges prior versions on success
    row = _rewrite_one(obj, "parquet", SPEC, False, delete_old_versions=True)
    assert row[4] == "updated"
    assert versions.list_versions(obj) == []
    assert _read_ids(obj) == [1]


def test_rewrite_integrity_conflict_fails_object(tmp_path, monkeypatch):
    obj = str(tmp_path / "data.parquet")
    _write_parquet(obj, [1, 2, 3])

    real_snapshot = versions.snapshot

    def racing_snapshot(path):
        snap = real_snapshot(path)
        # concurrent writer right after the task captured its snapshot
        _write_parquet(path, [1, 2, 3, 4])
        return snap

    monkeypatch.setattr(versions, "snapshot", racing_snapshot)
    row = _rewrite_one(obj, "parquet", SPEC, False)
    assert row[4] == "failed"
    assert "VersionIntegrityError" in row[5]
    assert _read_ids(obj) == [1, 2, 3, 4]  # untouched
    assert not [f for f in os.listdir(tmp_path) if f.startswith(".s3f2tmp")]


def test_job_with_delete_old_versions_false(spark, tmp_path, sf_dir):
    from amazon_s3_find_and_forget_spark.jobs import run_job

    lake = tmp_path / "lineitem"
    lake.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "lineitem.parquet"), lake / "part-0.parquet"
    )
    mapper = DataMapper(
        "lineitem",
        str(lake),
        ["l_orderkey"],
        format="parquet",
        delete_old_versions=False,
    )
    result = run_job(spark, [mapper], [QueueItem(match_id=1)])
    assert result.status == "COMPLETED"
    obj = str(lake / "part-0.parquet")
    assert len(versions.list_versions(obj)) == 1
    # history restorable: the deleted rows come back
    before = spark.read.parquet(obj).where("l_orderkey = 1").count()
    assert before == 0
    versions.restore_version(obj)
    after = spark.read.parquet(obj).where("l_orderkey = 1").count()
    assert after > 0


def test_object_not_found_skip_vs_fail(tmp_path):
    missing = str(tmp_path / "gone.parquet")
    # IgnoreObjectNotFoundExceptions=True -> skipped (main.py:213-241)
    row = _rewrite_one(missing, "parquet", SPEC, True)
    assert row[4] == "skipped" and row[5] == "ObjectNotFound"
    # default -> failed
    row = _rewrite_one(missing, "parquet", SPEC, False)
    assert row[4] == "failed" and row[5] == "ObjectNotFound"


def test_job_partial_failure_on_missing_object(spark, tmp_path, sf_dir):
    """File vanishing between Find and Forget -> FORGET_PARTIALLY_FAILED,
    unless the mapper opts into ignoring missing objects."""
    from amazon_s3_find_and_forget_spark.jobs import run_job
    from amazon_s3_find_and_forget_spark.plans import forget as forget_mod

    lake = tmp_path / "li"
    lake.mkdir()
    shutil.copy(os.path.join(sf_dir, "lineitem.parquet"), lake / "p.parquet")

    real = forget_mod.forget_files

    def vanishing_forget(spark_, files, groups, **kw):
        for f in files:
            local = f[len("file:"):] if f.startswith("file:") else f
            os.remove(local)
        return real(spark_, files, groups, **kw)

    forget_mod.forget_files = vanishing_forget
    # run_job imports forget_files inside the function -> patch module attr
    import amazon_s3_find_and_forget_spark.jobs as jobs_mod  # noqa: F401

    try:
        mapper = DataMapper("li", str(lake), ["l_orderkey"])
        r = run_job(spark, [mapper], [QueueItem(match_id=1)])
        assert r.status == "FORGET_PARTIALLY_FAILED"
        shutil.copy(os.path.join(sf_dir, "lineitem.parquet"), lake / "p.parquet")
        mapper2 = DataMapper(
            "li", str(lake), ["l_orderkey"], ignore_object_not_found=True
        )
        r2 = run_job(spark, [mapper2], [QueueItem(match_id=1)])
        assert r2.status == "COMPLETED"
        assert any(
            e["EventName"] == "ObjectUpdateSkipped" for e in r2.events
        )
    finally:
        forget_mod.forget_files = real


def test_gzip_parquet_input_rewrites_to_snappy(tmp_path):
    """Reference reads snappy/brotli/gzip parquet, writes snappy
    (docs/LIMITS.md:12-28)."""
    import pyarrow.parquet as pq_mod

    obj = str(tmp_path / "gz.parquet")
    pq.write_table(
        pa.table({"customer_id": pa.array([1, 2, 3], pa.int64())}),
        obj,
        compression="gzip",
    )
    row = _rewrite_one(obj, "parquet", SPEC, False)
    assert row[4] == "updated" and row[3] == 2
    meta = pq_mod.ParquetFile(obj).metadata
    assert meta.row_group(0).column(0).compression == "SNAPPY"
    assert _read_ids(obj) == [1]
