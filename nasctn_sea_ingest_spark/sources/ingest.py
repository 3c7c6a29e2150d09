"""Distributed ``.sigmf`` ingest: file/zip listing → Arrow-batched decode →
partitioned parquet tables.

Replaces the reference's zip-archive machinery (``ziparchive.py:22-497`` —
cached central directories, delayed per-block reads, divisions probing) with
the storage-level equivalents SURVEY.md §1.5/§4 calls for:

- the archive listing happens once on the driver and becomes a small
  **file-ref DataFrame** (zip central directories are read once; workers
  reopen members by path+name, the same model as the reference's
  ``MultiProcessingZipFile``),
- decode runs as ``mapInPandas`` over the refs — one Spark task per ref
  batch, vectorized numpy inside, Arrow on the wire,
- the Dask ``divisions``/1-day-``repartition`` trick becomes
  ``partitionBy(date)`` parquet output with min/max stats, so time-range
  queries prune partitions for free,
- per-file failures quarantine into an ``error`` column instead of killing
  the job (reference ``errors='log'``, ``ziparchive.py:424-440``).

At 100 TB scale the refs DataFrame is the only driver-side state (a few
bytes per file); decode parallelism = number of ref partitions, and the
output layout (table, date) keeps both full-table scans (one table dir) and
time-sliced queries (partition pruning) cheap. Zip archives should land on
a shared object store so any executor can range-read members.
"""

from __future__ import annotations

import glob
import os
import zipfile
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .sigmf import decode_sigmf, decode_sigmf_meta, \
    decode_sigmf_trace_records

# --------------------------------------------------------------------------
# schemas
# --------------------------------------------------------------------------

REF_SCHEMA = T.StructType([
    T.StructField("path", T.StringType(), False),      # file or zip archive
    T.StructField("member", T.StringType(), True),     # zip member, else null
    T.StructField("size", T.LongType(), True),
])

TRACE_SCHEMA = T.StructType([
    T.StructField("source_file", T.StringType(), False),
    T.StructField("table", T.StringType(), True),
    T.StructField("datetime", T.TimestampType(), True),
    T.StructField("frequency", T.DoubleType(), True),
    T.StructField("capture_statistic", T.StringType(), True),
    T.StructField("detector", T.StringType(), True),
    T.StructField("kind", T.StringType(), True),
    T.StructField("values", T.ArrayType(T.FloatType()), True),
    T.StructField("x_start", T.DoubleType(), True),
    T.StructField("x_step", T.DoubleType(), True),
    T.StructField("error", T.StringType(), True),
])

CHANNEL_META_SCHEMA = T.StructType([
    T.StructField("source_file", T.StringType(), False),
    T.StructField("datetime", T.TimestampType(), True),
    T.StructField("frequency", T.DoubleType(), True),
    T.StructField("overload", T.BooleanType(), True),
    T.StructField("iq_capture_duration_ms", T.DoubleType(), True),
    T.StructField("cal_gain_dB", T.DoubleType(), True),
    T.StructField("cal_noise_figure_dB", T.DoubleType(), True),
    T.StructField("cal_temperature_degC", T.DoubleType(), True),
    T.StructField("cal_datetime", T.TimestampType(), True),
    T.StructField("sigan_reference_level_dBm", T.DoubleType(), True),
    T.StructField("sigan_attenuation_dB", T.DoubleType(), True),
    T.StructField("sigan_preamp_enable", T.BooleanType(), True),
    T.StructField("extras", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("error", T.StringType(), True),
])

SWEEP_META_SCHEMA = T.StructType([
    T.StructField("source_file", T.StringType(), False),
    T.StructField("sample_rate", T.DoubleType(), True),
    T.StructField("version", T.StringType(), True),
    T.StructField("metadata_version", T.StringType(), True),
    T.StructField("schedule_name", T.StringType(), True),
    T.StructField("schedule_start_datetime", T.TimestampType(), True),
    T.StructField("schedule_interval", T.DoubleType(), True),
    T.StructField("task", T.LongType(), True),
    T.StructField("diagnostics_datetime", T.TimestampType(), True),
    T.StructField("timezone", T.StringType(), True),
    T.StructField("geo_lon", T.DoubleType(), True),
    T.StructField("geo_lat", T.DoubleType(), True),
    T.StructField("geo_alt", T.DoubleType(), True),
    T.StructField("max_of_max_channel_powers", T.ArrayType(T.DoubleType()), True),
    T.StructField("median_of_mean_channel_powers", T.ArrayType(T.DoubleType()), True),
    T.StructField("mean_channel_powers", T.ArrayType(T.DoubleType()), True),
    T.StructField("median_channel_powers", T.ArrayType(T.DoubleType()), True),
    T.StructField("extras", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("error", T.StringType(), True),
])

_CH_CORE = [f.name for f in CHANNEL_META_SCHEMA.fields
            if f.name not in ("source_file", "extras", "error")]
_SWEEP_CORE = [f.name for f in SWEEP_META_SCHEMA.fields
               if f.name not in ("source_file", "extras", "error")]
_SWEEP_ARRAYS = {"max_of_max_channel_powers", "median_of_mean_channel_powers",
                 "mean_channel_powers", "median_channel_powers"}


# --------------------------------------------------------------------------
# listing (S8/S9/S10 analogs)
# --------------------------------------------------------------------------

def _natural_key(name: str):
    """Digit-aware sort key (reference natsorted listing, ziparchive.py:151)."""
    import re
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", name)]


def list_sigmf_refs(spark: SparkSession, paths: str | list[str],
                    allow: int | None = None,
                    batch_size: int | None = None) -> DataFrame:
    """Enumerate ``.sigmf`` files (plain files, directories, or zip archives)
    into a file-ref DataFrame, natural-sorted, batched into partitions.

    ``allow`` keeps only the first N refs (reference ``allow=int`` gate,
    ``ziparchive.py:410-412``).

    ``batch_size=None`` (default) sizes partitions for the session's
    parallelism (one partition per default-parallelism slot, ≥4 refs
    each): a fixed batch size either starves a wide cluster (200 files /
    64 = 4 tasks on 32 cores) or drowns a narrow one in task overhead.
    Pass an explicit ``batch_size`` to pin refs-per-partition instead —
    partial reads (`limit`/`head`) decode one partition at minimum, so
    finer batches also make them cheaper.
    """
    if isinstance(paths, str):
        paths = [paths]
    refs: list[tuple[str, str | None, int]] = []
    for p in paths:
        if os.path.isdir(p):
            for f in sorted(glob.glob(os.path.join(p, "**", "*.sigmf"),
                                      recursive=True), key=_natural_key):
                refs.append((f, None, os.path.getsize(f)))
        elif p.endswith(".zip"):
            with zipfile.ZipFile(p) as z:          # central dir read ONCE
                members = [i for i in z.infolist()
                           if i.filename.endswith(".sigmf")]
            members.sort(key=lambda i: _natural_key(i.filename))
            refs.extend((p, i.filename, i.file_size) for i in members)
        else:
            refs.append((p, None,
                         os.path.getsize(p) if os.path.exists(p) else None))
    if allow is not None:
        refs = refs[:allow]
    if batch_size is None:
        par = spark.sparkContext.defaultParallelism
        n_part = max(1, min(len(refs) // 4 or 1, par))
    else:
        n_part = max(1, (len(refs) + batch_size - 1) // batch_size)
    # Arrow path (pandas → LocalTableScan): a plain Python list would become
    # a Python-RDD whose serialization stage forks a Python worker per
    # partition on EVERY action — measured ~0.5-1 s/task of pure overhead
    pdf = pd.DataFrame(refs, columns=["path", "member", "size"])
    pdf["seq"] = range(len(pdf))
    schema = T.StructType(REF_SCHEMA.fields
                          + [T.StructField("seq", T.LongType(), False)])
    df = spark.createDataFrame(pdf, schema)
    # range-partition on the listing sequence: batches stay CONTIGUOUS
    # natural-sort runs (S9 ordering contract — collect() returns refs in
    # listing order; a round-robin repartition would interleave them).
    # The within-partition sort is required: a range reduce partition can
    # fetch from multiple map chunks in nondeterministic order on a real
    # cluster; rangepartitioning alone only bounds the ranges.
    return (df.repartitionByRange(n_part, "seq")
              .sortWithinPartitions("seq").drop("seq"))


def _open_ref(zcache: dict, path: str, member: str | None) -> bytes:
    if member is None:
        with open(path, "rb") as f:
            return f.read()
    z = zcache.get(path)
    if z is None:
        z = zcache[path] = zipfile.ZipFile(path)
    return z.read(member)


def _ref_name(path: str, member: str | None) -> str:
    return path if member is None else f"{path}::{member}"


# --------------------------------------------------------------------------
# decode stages (mapInPandas)
# --------------------------------------------------------------------------

def decode_dir(spark: SparkSession, path: str, tz: str | None = None,
               hash_check: bool = True) -> DataFrame:
    """Batch decode of loose ``.sigmf`` files via the ``binaryFile``
    source — the cluster-scale listing path (SCALE.md §1): file discovery
    is Spark's own distributed file index, no driver-side zip machinery,
    and the source splits/parallelizes by file size. Output schema and
    quarantine semantics match ``decode_traces``; the decode stage is the
    same records-tier ``mapInPandas`` the streaming ingest runs.
    """
    from ..streaming import _decode_content
    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.sigmf")
           .load(path).select("path", "content"))
    return raw.mapInPandas(
        lambda it: _decode_content(it, tz, hash_check), TRACE_SCHEMA)


def decode_traces(refs: DataFrame, tz: str | None = None,
                  hash_check: bool = True) -> DataFrame:
    """Full decode of every ref into long-format trace rows (one row per
    per-capture trace, ``values`` = float32 array). Failures become rows
    with ``error`` set and null payload (quarantine, S15)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zcache: dict = {}
        cols = [f.name for f in TRACE_SCHEMA.fields]
        for b in batches:
            recs = []
            for path, member in zip(b["path"], b["member"]):
                src = _ref_name(path, member)
                try:
                    raw = _open_ref(zcache, path, member)
                    recs.extend(decode_sigmf_trace_records(
                        raw, tz=tz, hash_check=hash_check, source=src))
                except Exception as e:  # noqa: BLE001 — quarantine
                    recs.append((src, None, None, None, None, None, None,
                                 None, None, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(recs, columns=cols)

    return refs.mapInPandas(run, TRACE_SCHEMA)


def _decode_batch_dict(paths, members, zcache: dict, tz: str | None,
                       hash_check: bool) -> dict[str, pd.DataFrame]:
    """Decode a batch of refs into the reference's per-partition shape —
    one dict of concatenated frames per batch (``ziparchive.py:195-204``'s
    concat step; long format here). Failed files are skipped, the
    reference's ``errors='log'`` path."""
    dicts = []
    for path, member in zip(paths, members):
        try:
            raw = _open_ref(zcache, path, member)
            dicts.append(decode_sigmf(raw, tz=tz, hash_check=hash_check,
                                      source=_ref_name(path, member)))
        except Exception:  # noqa: BLE001 — errors='log'
            continue
    keys = {k for d in dicts for k in d}
    return {k: pd.concat([d[k] for d in dicts if k in d],
                         ignore_index=True)
            for k in keys}


def map_decoded_partitions(refs: DataFrame, partition_func,
                           tz: str | None = None, hash_check: bool = True,
                           probe_limit: int = 8) -> dict[str, DataFrame]:
    """The reference's ``partition_func`` hook (``ziparchive.py:210-273``,
    used in ``demos/dask_processing.ipynb`` cell 3): per ref batch, decode
    to a dict of frames, apply ``partition_func(dict) -> dict``, and expose
    every frame-valued key of the result as a lazy Spark DataFrame.

    Output schemas are discovered by a driver-side probe — decode the first
    readable ref (~ms, payload included) and run ``partition_func`` on it —
    the Spark analog of the reference's first-partition divisions/meta probe
    (SURVEY.md S12–S13, ``ziparchive.py:281-316``): here it is needed only
    when a user hook makes the schema dynamic.

    Like the reference's dict-of-ddfs, each returned DataFrame re-runs the
    shared decode when computed separately; persist the inputs or compute
    the dict in one action-shaped job if that matters.
    """
    spark = refs.sparkSession
    head = refs.select("path", "member").limit(probe_limit).collect()
    zcache: dict = {}
    probe: dict[str, pd.DataFrame] | None = None
    for r in head:
        d = _decode_batch_dict([r.path], [r.member], zcache, tz, hash_check)
        if d:
            probe = partition_func(d)
            break
    for z in zcache.values():
        z.close()
    if probe is None:
        raise RuntimeError("no readable ref to probe partition_func schema")
    if not isinstance(probe, dict):
        raise ValueError("partition_func must return a dict")

    out: dict[str, DataFrame] = {}
    for key, pdf in probe.items():
        if not isinstance(pdf, pd.DataFrame):
            continue  # reference keeps scalar/dict values driver-side
        schema = spark.createDataFrame(pdf.head(10)).schema
        cols = [f.name for f in schema.fields]

        def run(batches: Iterator[pd.DataFrame], _key=key, _cols=cols
                ) -> Iterator[pd.DataFrame]:
            zc: dict = {}
            for b in batches:
                d = _decode_batch_dict(b["path"], b["member"], zc, tz,
                                       hash_check)
                if not d:
                    continue
                r = partition_func(d)
                if not isinstance(r, dict):
                    raise ValueError("partition_func must return a dict")
                got = r.get(_key)
                if got is not None and len(got):
                    yield got[_cols]

        out[key] = refs.mapInPandas(run, schema)
    return out


PARTITION_SINK_SCHEMA = T.StructType([
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("n_rows", T.LongType(), False),
    T.StructField("out_file", T.StringType(), True),
])


def write_partitions(df: DataFrame, write_fn, path: str) -> pd.DataFrame:
    """Side-effecting custom sink — the reference's
    ``ddf.map_partitions(write_fn, path)`` pattern (pickle/zstd sinks in
    ``demos/dask_processing.ipynb`` cell 8). ``write_fn(pdf, path,
    partition_id) -> str | None`` runs once per partition on the executor
    and returns the file it wrote; the returned pandas frame is the
    structured write log (partition_id, n_rows, out_file).

    For formats Spark writes natively, prefer ``df.write`` — this hook is
    for sinks Spark has no writer for.
    """
    from pyspark import TaskContext

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        parts = [b for b in batches if len(b)]
        pdf = pd.concat(parts, ignore_index=True) if parts \
            else pd.DataFrame()
        out = write_fn(pdf, path, pid) if len(pdf) else None
        yield pd.DataFrame([(pid, len(pdf), out)],
                           columns=[f.name for f in
                                    PARTITION_SINK_SCHEMA.fields])

    log = df.mapInPandas(run, PARTITION_SINK_SCHEMA).toPandas()
    return log.sort_values("partition_id", ignore_index=True)


def _meta_rows(path: str, member: str | None, zcache: dict,
               tz: str | None, hash_check: bool = False
               ) -> tuple[list[tuple], tuple]:
    """(channel_metadata rows, sweep_metadata row) via the payload-skipping
    fast path (S14)."""
    src = _ref_name(path, member)
    raw = _open_ref(zcache, path, member)
    plan = decode_sigmf_meta(raw, tz=tz, hash_check=hash_check)["plan"]

    def ts(v):
        return pd.Timestamp(v) if v is not None else None

    ch_rows = []
    for row in plan.channel_meta.values():
        core = {c: row.get(c) for c in _CH_CORE}
        core["datetime"] = ts(core["datetime"])
        core["cal_datetime"] = ts(core.get("cal_datetime"))
        ov = core.get("overload")
        core["overload"] = bool(ov) if ov is not None else None
        pre = core.get("sigan_preamp_enable")
        core["sigan_preamp_enable"] = bool(pre) if pre is not None else None
        extras = {k: str(v) for k, v in row.items() if k not in _CH_CORE}
        ch_rows.append((src, *[core[c] for c in _CH_CORE], extras or None, None))

    sm = dict(plan.sweep_meta)
    sm["timezone"] = plan.timezone
    core = {}
    for c in _SWEEP_CORE:
        v = sm.get(c)
        if c.endswith("datetime"):
            v = ts(v)
        elif c in _SWEEP_ARRAYS and v is not None:
            v = [float(x) for x in v]
        elif c in ("sample_rate", "schedule_interval", "geo_lon", "geo_lat",
                   "geo_alt") and v is not None:
            v = float(v)
        elif c == "task" and v is not None:
            v = int(v)
        core[c] = v
    extras = {k: str(v) for k, v in sm.items() if k not in _SWEEP_CORE}
    sweep_row = (src, *[core[c] for c in _SWEEP_CORE], extras or None, None)
    return ch_rows, sweep_row


def _meta_stage(refs: DataFrame, schema: T.StructType, pick: int,
                tz: str | None, hash_check: bool = False) -> DataFrame:
    cols = [f.name for f in schema.fields]
    n_fill = len(cols) - 2

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        zcache: dict = {}
        for b in batches:
            recs = []
            for path, member in zip(b["path"], b["member"]):
                try:
                    both = _meta_rows(path, member, zcache, tz,
                                      hash_check)
                    got = both[pick]
                    recs.extend(got if pick == 0 else [got])
                except Exception as e:  # noqa: BLE001
                    recs.append((_ref_name(path, member),
                                 *([None] * n_fill),
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(recs, columns=cols)

    return refs.mapInPandas(run, schema)


def decode_channel_metadata(refs: DataFrame, tz: str | None = None,
                            hash_check: bool = False) -> DataFrame:
    """Per-capture metadata rows via metadata-only parse (no LZMA)."""
    return _meta_stage(refs, CHANNEL_META_SCHEMA, 0, tz, hash_check)


def decode_sweep_metadata(refs: DataFrame, tz: str | None = None,
                          hash_check: bool = False) -> DataFrame:
    """One metadata row per file via metadata-only parse (no LZMA)."""
    return _meta_stage(refs, SWEEP_META_SCHEMA, 1, tz, hash_check)


# --------------------------------------------------------------------------
# ingest job: decode → partitioned parquet warehouse
# --------------------------------------------------------------------------

def ingest(spark: SparkSession, paths: str | list[str], out_dir: str,
           tz: str | None = None, hash_check: bool = True,
           allow: int | None = None,
           batch_size: int | None = None) -> dict[str, str]:
    """End-to-end ingest: list → decode → write.

    Output layout (the Dask divisions/1-day-repartition analog, §1.5):

    - ``{out}/traces``            partitioned by (table, date), rows sorted
      within files by (datetime, frequency) for min/max-stat row pruning
    - ``{out}/channel_metadata``  partitioned by date
    - ``{out}/sweep_metadata``    one file-level row each
    - ``{out}/quarantine``        refs that failed decode, with the error

    Returns {logical name: path}.
    """
    refs = list_sigmf_refs(spark, paths, allow=allow, batch_size=batch_size)

    # persist across the two sinks: without it the quarantine write would
    # re-run the full payload decode (LZMA dominates — a second pass costs
    # 2× the job's CPU to emit a handful of error rows). MEMORY_AND_DISK
    # trades ~decoded-dataset spill space for that second decode.
    traces = decode_traces(refs, tz=tz, hash_check=hash_check).persist()
    good = traces.where(F.col("error").isNull()).drop("error") \
                 .withColumn("date", F.to_date("datetime"))
    bad = traces.where(F.col("error").isNotNull()) \
                .select("source_file", "error")

    out = {}
    tr_path = out[f"traces"] = os.path.join(out_dir, "traces")
    (good.sortWithinPartitions("datetime", "frequency")
         .write.mode("overwrite").partitionBy("table", "date").parquet(tr_path))

    q_path = out["quarantine"] = os.path.join(out_dir, "quarantine")
    bad.write.mode("overwrite").parquet(q_path)
    traces.unpersist()

    # metadata-only parse skips the payload (S14), so payload-corrupt files
    # still yield metadata — drop whole failed files like errors='log' does
    quarantined = F.broadcast(
        spark.read.parquet(q_path).select("source_file").distinct())

    ch = decode_channel_metadata(refs, tz=tz).where(F.col("error").isNull()) \
        .join(quarantined, "source_file", "left_anti") \
        .drop("error").withColumn("date", F.to_date("datetime"))
    ch_path = out["channel_metadata"] = os.path.join(out_dir, "channel_metadata")
    (ch.sortWithinPartitions("datetime", "frequency")
       .write.mode("overwrite").partitionBy("date").parquet(ch_path))

    sw = decode_sweep_metadata(refs, tz=tz).where(F.col("error").isNull()) \
        .join(quarantined, "source_file", "left_anti") \
        .drop("error")
    sw_path = out["sweep_metadata"] = os.path.join(out_dir, "sweep_metadata")
    sw.write.mode("overwrite").parquet(sw_path)

    # structured run log (S16 analog of the reference's eliot JSON sink):
    # one row per ingest run with the counts an operator monitors
    log_path = out["ingest_log"] = os.path.join(out_dir, "ingest_log")
    n_refs = refs.count()
    n_bad = spark.read.parquet(q_path).select("source_file").distinct().count()
    log_df = spark.createDataFrame(
        pd.DataFrame([{
            "run_at": pd.Timestamp.utcnow().tz_localize(None),
            "n_files": n_refs,
            "n_quarantined": n_bad,
            "n_ok": n_refs - n_bad,
            "out_dir": out_dir,
        }]))
    log_df.write.mode("append").parquet(log_path)
    return out


def read_product(spark: SparkSession, out_dir: str, table: str) -> DataFrame:
    """Open one ingested data-product table (psd/pvt/pfp/apd/apd_raw) with
    partition pruning on ``table`` and ``date``."""
    df = spark.read.parquet(os.path.join(out_dir, "traces"))
    return df.where(F.col("table") == table).drop("table")


# --------------------------------------------------------------------------
# warehouse maintenance: small-file compaction
# --------------------------------------------------------------------------

def backfill_partitions(df: DataFrame, dataset_dir: str,
                        partition_cols: "list[str] | None" = None) -> None:
    """Idempotent late-data backfill: replace ONLY the partitions present
    in ``df``, leaving every other partition untouched (dynamic partition
    overwrite — the MERGE-less upsert of a plain-parquet warehouse).

    The reference reprocesses whole archives when sensors re-upload
    corrected sweeps; at 100 TB rewriting the dataset for one late day is
    absurd, and appending would duplicate the day. Dynamic overwrite
    rewrites exactly the (table, date) leaves the correction touches:
    cost scales with the size of the correction, re-running the same
    backfill is a no-op, and readers see whole partitions swap.

    ``df`` must carry the dataset's partition columns (default
    ``[table, date]`` when present, else ``[date]``).
    """
    if partition_cols is None:
        partition_cols = [c for c in ("table", "date") if c in df.columns]
        if not partition_cols:
            raise ValueError("df carries no partition columns")
    sort_cols = [c for c in ("datetime", "frequency") if c in df.columns]
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    (df.write.mode("overwrite")
       .option("partitionOverwriteMode", "dynamic")
       .partitionBy(*partition_cols).parquet(dataset_dir))


def compact_warehouse(spark: SparkSession, dataset_dir: str,
                      target_file_bytes: int = 128 << 20,
                      sort_cols: "list[str] | None" = None) -> pd.DataFrame:
    """Compact a partitioned parquet dataset's small files in place.

    Streaming ingest appends one file set per micro-batch — at a ~90 s
    sensor cadence that is ~1k files/partition/day, and at 100 TB the file
    count (not the bytes) becomes the scan bottleneck (driver listing +
    one task per tiny file). This walks each leaf partition directory,
    and where it holds more files than ``ceil(bytes / target_file_bytes)``
    rewrites it to that many files (sorted by ``sort_cols`` — default
    (datetime, frequency) when present — to restore min/max-stat pruning),
    then atomically swaps the directory. Untouched partitions are skipped,
    so the job is incremental and re-runnable.

    The swap is two ``os.rename`` calls — atomic on POSIX/HDFS; on object
    stores run per-partition-idle (the streaming writer targets *today's*
    partition, compaction targets closed ones) or use a table format with
    commit semantics.

    Returns a log frame (partition, n_files_before, n_files_after, bytes).
    """
    import math
    import shutil

    leaves: list[str] = []
    for root, dirs, files in os.walk(dataset_dir):
        if any(f.endswith(".parquet") for f in files) \
                and "_tmp_compact" not in root and "_old_compact" not in root:
            leaves.append(root)

    log = []
    for leaf in sorted(leaves):
        pq = [os.path.join(leaf, f) for f in os.listdir(leaf)
              if f.endswith(".parquet")]
        nbytes = sum(os.path.getsize(f) for f in pq)
        k = max(1, math.ceil(nbytes / target_file_bytes))
        if len(pq) <= k:
            log.append((os.path.relpath(leaf, dataset_dir),
                        len(pq), len(pq), nbytes))
            continue
        df = spark.read.parquet(leaf)
        sort_by = sort_cols or [c for c in ("datetime", "frequency")
                                if c in df.columns]
        out = df.coalesce(k)
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)
        tmp = leaf + "_tmp_compact"
        out.write.mode("overwrite").parquet(tmp)
        old = leaf + "_old_compact"
        os.rename(leaf, old)
        os.rename(tmp, leaf)
        shutil.rmtree(old)
        log.append((os.path.relpath(leaf, dataset_dir), len(pq), k, nbytes))
    return pd.DataFrame(log, columns=["partition", "n_files_before",
                                      "n_files_after", "bytes"])
