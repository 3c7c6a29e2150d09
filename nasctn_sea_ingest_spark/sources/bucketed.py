"""Bucketed warehouse layout: pre-shuffled storage for zero-exchange joins.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides on the key. Spark's bucketing moves that shuffle to WRITE time: a
table stored ``bucketBy(n, key)`` is already hash-partitioned on disk, so
a join between two tables bucketed on the same key with the same bucket
count needs NO Exchange at read time — each task zips bucket i with
bucket i. ``sortBy`` additionally pre-sorts within buckets, letting the
sort-merge join skip its sort.

This is the storage-layout change SCALE.md §4 promises for the star
schema: the query code is unchanged (same join keys), only the writer
differs. Contract-tested by ``test_bucketed_join_no_shuffle``.

Bucketed tables require the session catalog (``saveAsTable``); plain
``parquet(path)`` writes cannot record bucket metadata. Readers use
``spark.table(name)`` — the catalog carries the bucket spec that lets the
planner drop the Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed", "zorder_write", "file_stats", "write_with_blooms"]


def write_bucketed(df: DataFrame, table: str, keys: "list[str] | str",
                   n_buckets: int = 32,
                   sort_by: "list[str] | None" = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed catalog table.

    ``keys`` — the join key(s) to pre-shuffle on (both join sides must use
    the same keys AND the same ``n_buckets`` for the exchange to vanish).
    ``sort_by`` — optional within-bucket sort (lets sort-merge join read
    the buckets streaming, no per-task sort).

    Sizing: one bucket is one file per write task; pick ``n_buckets`` so a
    bucket at target scale stays in the 128 MB–1 GB range (same rule as
    ``spark.sql.files.maxPartitionBytes``). Buckets are append-stable —
    later writes with the same spec add files per bucket, never reshuffle
    existing data.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = (df.write.format("parquet").mode(mode)
           .bucketBy(n_buckets, *keys))
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (the bucket spec only
    survives a catalog read; ``spark.read.parquet(path)`` on the same
    files would plan a full shuffle again)."""
    return spark.table(table)


def zorder_write(df: DataFrame, path: str, cols: "list[str]",
                 bits: int = 8, n_files: int = 32,
                 mode: str = "overwrite") -> None:
    """Write ``df`` Z-order-clustered on ``cols``: range-partition + sort
    by the interleaved ``functions.zorder_key`` so each output file covers
    a small RECTANGLE of the (col₁, col₂, …) space instead of a stripe of
    the leading column only — parquet footer min/max stats then prune
    scans filtered on ANY clustered dimension (the layout behind
    Delta/Iceberg ``OPTIMIZE ZORDER BY``, here as a plain-parquet
    operator).

    Each column is first scaled to a RANGE-PRESERVING ``2^bits``-bucket
    grid — ``(v - min) * 2^bits / (max - min + 1)`` from a one-row
    write-time stats pass (the same pre-pass Delta's OPTIMIZE runs;
    low-bit masking would interleave *hash-like* coordinates, and the raw
    column min/max recorded in each footer would stay wide — no pruning).
    One tiny driver collect (1 row, write-time), one repartitionByRange
    shuffle — the same cost as any clustered write — no UDF. Verified by
    the file-stats contract test (``tests/test_layout.py``): the mean
    per-file min/max width of EVERY clustered column shrinks vs a
    single-column sort layout.
    """
    from ..functions import zorder_key
    import pyspark.sql.functions as F

    stats = df.agg(*[f(c).alias(f"{w}_{i}")
                     for i, c in enumerate(cols)
                     for w, f in (("mn", F.min), ("mx", F.max))]).first()
    n_cells = 1 << bits
    zcols = []
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn_{i}"], stats[f"mx_{i}"]
        span = int(mx) - int(mn) + 1
        zcols.append(((F.col(c).cast("bigint") - int(mn)) * n_cells
                      / span).cast("bigint"))
    z = df.withColumn("__z", zorder_key(zcols, bits=bits))
    (z.repartitionByRange(n_files, "__z")
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path))


def file_stats(spark: SparkSession, path: str,
               cols: "list[str]") -> DataFrame:
    """Per-file parquet footer stats for the named columns — the layout
    health audit behind every pruning claim: narrow per-file min/max
    ranges mean row-group/file skipping fires; a column whose per-file
    ranges all span the whole domain will never prune.

    Distributed: the file list fans out over executors and each task
    reads ONLY footers (pyarrow metadata, no data pages), so auditing a
    100 TB table costs one metadata read per file.  Values are reported
    as strings for type-generality.  One row per (file, column).

    Listing goes through the Hadoop FileSystem API, so any configured
    scheme works (``s3a://``, ``hdfs://``, local) — not just
    locally-mounted paths — and the explicit one-column schema keeps an
    empty match list a valid (empty) result instead of a
    schema-inference error.  Footer reads on the executors use
    ``pyarrow.fs``, which does not know Hadoop's ``s3a``/``s3n`` scheme
    names — those are rewritten to ``s3://`` before ``from_uri`` — and
    ``hdfs://`` footers additionally require libhdfs on the executors.
    """
    import pandas as _pd

    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    files = []
    if fs.exists(hpath):
        it = fs.listFiles(hpath, True)  # recursive; footers read on executors
        while it.hasNext():
            p = it.next().getPath().toString()
            if p.endswith(".parquet"):
                files.append(p)
    fdf = spark.createDataFrame([(f,) for f in sorted(files)],
                                "file string")

    def _open_meta(f):
        import pyarrow.parquet as pq
        if f.startswith("file:"):  # Hadoop local URI form file:/x or file:///x
            local = f[5:]
            while local.startswith("//"):
                local = local[1:]
            return pq.ParquetFile(local).metadata
        if "://" in f:  # remote scheme: resolve through pyarrow.fs
            from pyarrow import fs as pafs
            # pyarrow rejects Hadoop's s3a/s3n scheme names; same store.
            for hadoop_scheme in ("s3a://", "s3n://"):
                if f.startswith(hadoop_scheme):
                    f = "s3://" + f[len(hadoop_scheme):]
            fsys, rel = pafs.FileSystem.from_uri(f)
            return pq.ParquetFile(rel, filesystem=fsys).metadata
        return pq.ParquetFile(f).metadata

    def read(batches):
        for b in batches:
            recs = []
            for f in b["file"]:
                meta = _open_meta(f)
                agg = {c: [None, None] for c in cols}
                rows = meta.num_rows
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        name = c.path_in_schema
                        if name in agg and c.statistics is not None:
                            lo, hi = agg[name]
                            s = c.statistics
                            agg[name] = [
                                s.min if lo is None else min(lo, s.min),
                                s.max if hi is None else max(hi, s.max)]
                for c, (lo, hi) in agg.items():
                    recs.append((f, c,
                                 None if lo is None else str(lo),
                                 None if hi is None else str(hi), rows))
            yield _pd.DataFrame(recs, columns=["file", "col", "min", "max",
                                               "n_rows"])

    return fdf.mapInPandas(
        read, "file string, col string, min string, max string, n_rows long")


def write_with_blooms(df: DataFrame, path: str, bloom_cols: "list[str]",
                      fpp: float = 0.01, mode: str = "overwrite") -> None:
    """Parquet write with per-column BLOOM FILTERS in the footers — the
    point-lookup complement to min/max stats: range stats prune sorted/
    clustered columns, blooms prune membership probes on HIGH-CARDINALITY
    UNSORTED columns (`WHERE id = X` over 100 TB touches only files whose
    bloom admits X; min/max on a shuffled id column prunes nothing).
    ~1.2 bytes/row/column at 1% fpp — footer-resident, read with the
    metadata, never the data pages."""
    w = df.write.mode(mode)
    for c in bloom_cols:
        w = (w.option(f"parquet.bloom.filter.enabled#{c}", "true")
              .option(f"parquet.bloom.filter.fpp#{c}", str(fpp)))
    w.parquet(path)
