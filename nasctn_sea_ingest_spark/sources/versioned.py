"""Manifest-versioned parquet tables: time travel, atomic commits,
optimistic concurrency, vacuum — the transaction-log pattern (Delta/
Iceberg's core idea) reduced to plain parquet + JSON so a warehouse
built on this engine gets versioned snapshots without a table-format
dependency.

Layout::

    <path>/data/b<version>-<nonce>/part-*.parquet   immutable data files
    <path>/_manifests/v0000000001.json              one manifest per commit

A manifest lists the EXACT relative file paths that make up its version
(plus op, parent, schema).  Readers resolve a manifest and read that
file list — never a directory glob — so concurrent writers can land new
files at any time without torn reads.  Commits are atomic via exclusive
manifest creation (``open(..., 'x')``): two writers racing from the same
parent both stage their data files, but only one creates
``v<N+1>.json``; the loser gets :class:`VersionConflict` and retries on
the new head (optimistic concurrency, the Delta protocol's shape).  On
object stores without atomic create, swap ``_commit_manifest`` for a
conditional PUT — the rest is unchanged.

Scale: a commit is O(new files) — history is never rewritten or read;
manifests are O(files) JSON; reads of any version prune/push down
per-file exactly like plain parquet (the file list is just the scan
input).  ``vacuum`` deletes data files unreachable from the kept
manifests — the only operation that touches old versions.

Incremental-merge note: ``versioned_upsert`` commits a full-snapshot
OVERWRITE (read head → merge → write).  For high-frequency keyed
updates use ``streaming.upsert_stream``'s bucketed O(touched-buckets)
path and snapshot it here periodically; this module's job is the
version history, not the merge strategy.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["versioned_write", "versioned_upsert", "versioned_delete",
           "read_version", "table_history", "vacuum", "VersionConflict"]

_MANIFEST_DIR = "_manifests"
_WIDTH = 10


class VersionConflict(RuntimeError):
    """Another writer committed the version this write raced for.
    Re-read the head and retry the transformation."""


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"v{version:0{_WIDTH}d}.json")


def _list_versions(path: str) -> list[int]:
    mdir = os.path.join(path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_manifest(path: str, version: int) -> dict:
    try:
        with open(_manifest_path(path, version)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        raise ValueError(
            f"versioned table {path}: version {version} does not exist "
            f"(have {_list_versions(path) or 'none'})") from None
    except json.JSONDecodeError as e:
        raise ValueError(
            f"versioned table {path}: manifest for version {version} is "
            f"corrupt ({e}) — restore it from backup or vacuum past it; "
            "refusing to guess the file list") from None


def _commit_manifest(path: str, version: int, manifest: dict) -> None:
    mdir = os.path.join(path, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    # write the FULL manifest to a temp file first, then os.link() it
    # into the version slot: the link is atomic AND exclusive (fails
    # if the slot exists), so exactly one writer can own a version
    # number — the old `open(.., "x")` had the same exclusivity but a
    # crash mid-json.dump left a TRUNCATED manifest permanently
    # claiming the slot (every retry hit VersionConflict and every
    # read hit the corrupt-manifest error; the r13 geometry-manifest
    # atomicity class).  Temp names start with "_" so _list_versions
    # never mistakes an orphan for a version.
    import tempfile
    fd, tmp = tempfile.mkstemp(dir=mdir, prefix=f"_v{version}_",
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        try:
            os.link(tmp, _manifest_path(path, version))
        except FileExistsError:
            raise VersionConflict(
                f"versioned table {path}: version {version} was "
                "committed by a concurrent writer — re-read the head "
                "and retry") from None
    finally:
        os.unlink(tmp)


def versioned_write(df: DataFrame, path: str, mode: str = "append",
                    partition_by: Sequence[str] | None = None) -> int:
    """Commit ``df`` as a new table version; returns the version number.

    ``mode='append'`` adds the new files to the parent version's list;
    ``mode='overwrite'`` replaces the list (the parent's FILES remain on
    disk — that is what makes the parent time-travelable — until
    :func:`vacuum`).  Appends must match the head's column names
    (order-insensitive); schema drift raises instead of silently
    forking the table's shape mid-history.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    versions = _list_versions(path)
    parent = versions[-1] if versions else 0
    version = parent + 1
    parent_m = _read_manifest(path, parent) if versions else None

    if parent_m is not None and mode == "append":
        want = sorted(parent_m["columns"])
        have = sorted(df.columns)
        if want != have:
            raise ValueError(
                f"versioned append to {path}: columns {have} != table "
                f"columns {want}; commit an explicit overwrite to "
                "change the schema")

    batch = f"b{version:0{_WIDTH}d}-{uuid.uuid4().hex[:8]}"
    data_dir = os.path.join(path, "data", batch)
    w = df.write.mode("error")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(data_dir)

    new_files = []
    for root, _dirs, files in os.walk(data_dir):
        for f in files:
            if f.endswith(".parquet"):
                new_files.append(os.path.relpath(
                    os.path.join(root, f), path))
    new_files.sort()
    files = new_files if (mode == "overwrite" or parent_m is None) \
        else sorted(parent_m["files"] + new_files)
    _commit_manifest(path, version, {
        "version": version, "parent": parent if versions else None,
        "op": mode, "files": files, "columns": df.columns,
        "n_files": len(files), "n_added": len(new_files)})
    return version


def versioned_upsert(updates: DataFrame, path: str,
                     keys: Sequence[str],
                     order_by: Sequence[str]) -> int:
    """Read the head, last-wins-merge ``updates`` by ``keys``
    (``functions.merge_upsert`` semantics), commit as an overwrite
    version.  Convenience for low-frequency keyed maintenance with full
    history; see the module docstring for the high-frequency path."""
    from ..functions import merge_upsert

    spark = updates.sparkSession
    versions = _list_versions(path)
    if versions:
        base = read_version(spark, path)
        merged = merge_upsert(base, updates, keys, order_by)
        # materialize BEFORE the commit: the merged plan reads the very
        # files the new version supersedes
        merged = merged.localCheckpoint(eager=True)
    else:
        merged = merge_upsert(updates.limit(0), updates, keys, order_by)
    return versioned_write(merged, path, mode="overwrite")


def versioned_delete(spark: SparkSession, path: str, condition) -> int:
    """Commit a new version WITHOUT the rows matching ``condition`` (a
    Column or SQL string) — the keyed-deletion face (GDPR erasure,
    bad-batch rollforward).  Returns the new version number.

    IMPORTANT: like every versioned store, the deleted rows remain
    PHYSICALLY present in older versions' files until :func:`vacuum`
    drops those manifests — a compliance delete is
    ``versioned_delete(...)`` followed by ``vacuum(path, keep_last=1)``.
    The commit is a full-snapshot overwrite (read head → filter →
    write); for high-frequency keyed deletes, stage tombstones through
    ``streaming.upsert_stream`` and snapshot here periodically."""
    from pyspark.sql import functions as F  # noqa: F401

    cond = F.expr(condition) if isinstance(condition, str) else condition
    head = read_version(spark, path).where(~cond) \
        .localCheckpoint(eager=True)
    return versioned_write(head, path, mode="overwrite")


def read_version(spark: SparkSession, path: str,
                 version: int | None = None) -> DataFrame:
    """DataFrame of a specific version (default: head).  Reads the
    manifest's exact file list, so concurrent commits and un-vacuumed
    stale files never leak into the scan."""
    versions = _list_versions(path)
    if not versions:
        raise ValueError(f"no versioned table at {path}")
    v = versions[-1] if version is None else version
    m = _read_manifest(path, v)
    if not m["files"]:
        return spark.createDataFrame(
            [], ", ".join(f"`{c}` string" for c in m["columns"]))
    return spark.read.parquet(*[os.path.join(path, f)
                                for f in m["files"]])


def table_history(path: str) -> list[dict]:
    """All manifests oldest-first (version, op, parent, n_files,
    n_added) — the audit trail."""
    return [{k: m[k] for k in
             ("version", "op", "parent", "n_files", "n_added")}
            for m in (_read_manifest(path, v)
                      for v in _list_versions(path))]


def vacuum(path: str, keep_last: int = 1) -> list[str]:
    """Delete data files reachable ONLY from manifests older than the
    newest ``keep_last`` versions, then drop those manifests.  Returns
    the deleted relative paths.  Time travel to vacuumed versions
    raises (their manifests are gone) — never silently misreads."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = _list_versions(path)
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(path, v)["files"])
    doomed: set[str] = set()
    for v in drop:
        doomed.update(f for f in _read_manifest(path, v)["files"]
                      if f not in live)
    for rel in sorted(doomed):
        try:
            os.remove(os.path.join(path, rel))
        except FileNotFoundError:
            pass
    for v in drop:
        os.remove(_manifest_path(path, v))
    # prune now-empty batch dirs so the data tree stays listable
    data_root = os.path.join(path, "data")
    if os.path.isdir(data_root):
        for d in sorted(os.listdir(data_root)):
            full = os.path.join(data_root, d)
            if os.path.isdir(full) and not any(
                    f.endswith(".parquet")
                    for _r, _d, fs in os.walk(full) for f in fs):
                import shutil
                shutil.rmtree(full)
    return sorted(doomed)
