"""Manifest-versioned parquet tables (sources/versioned.py): time
travel, atomic exclusive-create commits, optimistic concurrency,
schema-drift rejection, vacuum reachability."""

import os

import pytest

from nasctn_sea_ingest_spark.sources.versioned import (
    VersionConflict, read_version, table_history, vacuum,
    versioned_upsert, versioned_write)


def _rows(spark, df):
    return {tuple(r) for r in df.collect()}


def test_append_overwrite_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b = spark.createDataFrame([(3, "c")], "id long, v string")
    c = spark.createDataFrame([(9, "z")], "id long, v string")

    assert versioned_write(a, path) == 1
    assert versioned_write(b, path) == 2            # append
    assert versioned_write(c, path, "overwrite") == 3

    assert _rows(spark, read_version(spark, path)) == {(9, "z")}
    assert _rows(spark, read_version(spark, path, 1)) == {(1, "a"), (2, "b")}
    assert _rows(spark, read_version(spark, path, 2)) == \
        {(1, "a"), (2, "b"), (3, "c")}              # overwrite kept v2 intact

    hist = table_history(path)
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert [h["op"] for h in hist] == ["append", "append", "overwrite"]
    assert hist[1]["parent"] == 1 and hist[0]["parent"] is None
    with pytest.raises(ValueError, match="version 7"):
        read_version(spark, path, 7)


def test_schema_drift_rejected_on_append(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned_write(spark.createDataFrame([(1, "a")], "id long, v string"),
                    path)
    bad = spark.createDataFrame([(2, 3.0)], "id long, other double")
    with pytest.raises(ValueError, match="columns"):
        versioned_write(bad, path)  # append with different columns
    # but an explicit overwrite may change the schema
    assert versioned_write(bad, path, "overwrite") == 2
    assert read_version(spark, path).columns == ["id", "other"]


def test_concurrent_commit_conflict(spark, tmp_path):
    """Two writers race from the same parent: the second manifest
    create must raise VersionConflict, and the table stays exactly the
    winner's version (the loser's staged files are unreferenced)."""
    path = str(tmp_path / "tbl")
    versioned_write(spark.createDataFrame([(1,)], "id long"), path)
    # simulate the winner committing v2 first
    winner = spark.createDataFrame([(2,)], "id long")
    assert versioned_write(winner, path) == 2
    # loser staged against parent v1 and now tries to commit v2
    from nasctn_sea_ingest_spark.sources import versioned as V
    with pytest.raises(VersionConflict):
        V._commit_manifest(path, 2, {"version": 2, "files": []})
    assert _rows(spark, read_version(spark, path)) == {(1,), (2,)}


def test_versioned_upsert_history(spark, tmp_path):
    path = str(tmp_path / "tbl")
    w1 = spark.createDataFrame(
        [("k1", 1, 10), ("k2", 1, 20)], "k string, ver int, val int")
    w2 = spark.createDataFrame(
        [("k2", 2, 25), ("k3", 1, 30)], "k string, ver int, val int")
    versioned_upsert(w1, path, keys=["k"], order_by=["ver"])
    versioned_upsert(w2, path, keys=["k"], order_by=["ver"])
    head = {r.k: (r.ver, r.val)
            for r in read_version(spark, path).collect()}
    assert head == {"k1": (1, 10), "k2": (2, 25), "k3": (1, 30)}
    v1 = {r.k: (r.ver, r.val)
          for r in read_version(spark, path, 1).collect()}
    assert v1 == {"k1": (1, 10), "k2": (1, 20)}   # pre-upsert snapshot


def test_vacuum_reachability(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned_write(spark.createDataFrame([(1,)], "id long"), path)
    versioned_write(spark.createDataFrame([(2,)], "id long"), path)
    versioned_write(spark.createDataFrame([(9,)], "id long"), path,
                    "overwrite")
    # v3 references ONLY its own files; v1/v2 files become unreachable
    deleted = vacuum(path, keep_last=1)
    assert deleted  # the v1+v2 data files went away
    assert _rows(spark, read_version(spark, path)) == {(9,)}
    with pytest.raises(ValueError):
        read_version(spark, path, 2)              # loud, not a misread
    assert [h["version"] for h in table_history(path)] == [3]
    # files shared with a kept version are never deleted: v4 appends to
    # v3, vacuum(keep_last=1) keeps v4 whose list includes v3's file
    versioned_write(spark.createDataFrame([(10,)], "id long"), path)
    vacuum(path, keep_last=1)
    assert _rows(spark, read_version(spark, path)) == {(9,), (10,)}


def test_read_is_manifest_scoped_not_glob(spark, tmp_path):
    """A stray parquet file inside data/ (a loser writer's staged
    batch) must NEVER leak into any version's read."""
    path = str(tmp_path / "tbl")
    versioned_write(spark.createDataFrame([(1,)], "id long"), path)
    stray_dir = os.path.join(path, "data", "b9999999999-deadbeef")
    spark.createDataFrame([(666,)], "id long") \
        .coalesce(1).write.parquet(stray_dir)
    assert _rows(spark, read_version(spark, path)) == {(1,)}
    assert versioned_write(
        spark.createDataFrame([(2,)], "id long"), path) == 2
    assert _rows(spark, read_version(spark, path)) == {(1,), (2,)}


def test_versioned_delete_and_physical_removal(spark, tmp_path):
    """versioned_delete removes rows logically (new version) while older
    versions still expose them — physical removal is delete + vacuum,
    the documented compliance pair."""
    from pyspark.sql import functions as F

    from nasctn_sea_ingest_spark.sources.versioned import versioned_delete

    path = str(tmp_path / "tbl")
    versioned_write(spark.createDataFrame(
        [(1, "keep"), (2, "erase"), (3, "keep")], "id long, v string"),
        path)
    v2 = versioned_delete(spark, path, F.col("v") == "erase")
    assert v2 == 2
    assert _rows(spark, read_version(spark, path)) == \
        {(1, "keep"), (3, "keep")}
    # pre-delete version still readable (and still holds the row)
    assert (2, "erase") in _rows(spark, read_version(spark, path, 1))
    # SQL-string condition works too
    versioned_delete(spark, path, "id = 3")
    assert _rows(spark, read_version(spark, path)) == {(1, "keep")}
    # compliance pair: vacuum drops the old manifests AND their files
    deleted = vacuum(path, keep_last=1)
    assert deleted
    with pytest.raises(ValueError):
        read_version(spark, path, 1)
    assert _rows(spark, read_version(spark, path)) == {(1, "keep")}


def test_corrupt_manifest_fails_loudly(spark, tmp_path):
    path = str(tmp_path / "tbl")
    versioned_write(spark.createDataFrame([(1,)], "id long"), path)
    from nasctn_sea_ingest_spark.sources.versioned import _manifest_path
    with open(_manifest_path(path, 1), "w") as fh:
        fh.write("{not json")
    with pytest.raises(ValueError, match="corrupt"):
        read_version(spark, path)


def test_commit_manifest_atomic_and_orphan_safe(spark, tmp_path):
    """r13 atomicity class: the manifest commit writes a temp file and
    os.link()s it into the version slot — a concurrent commit of the
    same version still raises VersionConflict (exclusivity preserved),
    a crash-orphaned temp file is invisible to version listing, and no
    truncated manifest can ever claim a slot (the committed file is
    complete by construction)."""
    import json
    import os

    from nasctn_sea_ingest_spark.sources.versioned import (
        VersionConflict, _commit_manifest, _list_versions,
        _read_manifest)

    path = str(tmp_path / "vt")
    _commit_manifest(path, 1, {"columns": ["a"], "files": []})
    assert _list_versions(path) == [1]
    assert _read_manifest(path, 1)["columns"] == ["a"]
    with pytest.raises(VersionConflict, match="version 1"):
        _commit_manifest(path, 1, {"columns": ["b"], "files": []})
    # the losing commit's temp file must not linger or be listed
    mdir = os.path.join(path, "_manifests")
    assert sorted(os.listdir(mdir)) == ["v0000000001.json"]
    # a crash-orphaned temp file (simulated) never shows up as a version
    with open(os.path.join(mdir, "_v2_orphan.tmp"), "w") as fh:
        fh.write('{"columns"')
    assert _list_versions(path) == [1]
    _commit_manifest(path, 2, {"columns": ["a"], "files": []})
    assert _list_versions(path) == [1, 2]
    assert json.load(open(os.path.join(
        mdir, "v0000000002.json")))["columns"] == ["a"]
