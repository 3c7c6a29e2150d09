"""Loaders for the driver's synthetic parquet tables.

The driver's testdata stores timestamps as parquet ``TIMESTAMP(NANOS)`` which
Spark rejects by default; ``spark.sql.legacy.parquet.nanosAsLong`` reads them
as raw int64 nanoseconds.  We derive, for every timestamp-like column ``c``:

- ``c_us``  : BIGINT microseconds since epoch (``nanos div 1000`` — truncation,
  matching DuckDB's micro-precision TIMESTAMP read of the same files), and
- ``c``     : a proper TIMESTAMP via ``timestamp_micros``.

All oracle-checked query outputs use ``*_us`` integers or arithmetic-derived
date strings, never raw TIMESTAMP values, so results are independent of the
session timezone on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# timestamp-bearing columns per table (read as int64 nanos via nanosAsLong)
TS_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def _enable_nanos(spark: SparkSession) -> None:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def fan_out_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin-repartition an UNDER-PARTITIONED input up to the
    session parallelism.  The local testdata ships one single-row-group
    parquet file per table, so every scan is 1-3 partitions and any
    CPU-heavy map stage before the first shuffle runs near-serial — a
    test-harness artifact, not a scale property (a real table has
    thousands of splits and this is a no-op).  OPT-IN per query: the
    extra exchange costs more than it saves on shuffle-dominated plans
    (measured: q91/q118/q149 win 62-77%, q64/q69/q35 lose 10-50%), so
    only queries with a measured stable win call it."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, normalizing timestamps of any precision.

    The driver's parquet mixes TIMESTAMP(NANOS) (→ BIGINT via nanosAsLong),
    TIMESTAMP(MILLIS/MICROS) isAdjustedToUTC=false (→ TIMESTAMP_NTZ), and
    potentially instant TIMESTAMP.  All become ``c_us`` BIGINT epoch-micros
    (naive-as-UTC, matching DuckDB's read) plus a TIMESTAMP column ``c``.
    """
    _enable_nanos(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in TS_COLS.get(name, []):
        dt = dtypes.get(c)
        # keep the raw physical column under {c}_raw: time predicates built
        # by us_cmp()/us_between() compare against it directly, which lets
        # parquet row-group min/max pruning fire (a filter on the derived
        # `div 1000` column never reaches PushedFilters)
        df = df.withColumnRenamed(c, f"{c}_raw")
        raw = F.col(f"{c}_raw")
        if dt == "bigint":        # raw nanos (nanosAsLong)
            df = df.withColumn(f"{c}_us", F.expr(f"{c}_raw div 1000"))
        elif dt == "timestamp_ntz":
            df = df.withColumn(
                f"{c}_us",
                F.expr(f"timestampdiff(MICROSECOND, "
                       f"timestamp_ntz'1970-01-01 00:00:00', {c}_raw)"))
        else:                     # instant timestamp
            df = df.withColumn(f"{c}_us", F.unix_micros(raw))
        df = df.withColumn(c, F.timestamp_micros(F.col(f"{c}_us")))
        _RAW_DTYPE[(name, c)] = dt
    return df


# dtype of the raw physical column per (table, ts col) — set by load_table
_RAW_DTYPE: dict = {}


def us_cmp(c: str, op: str, v: int, raw_dtype: str | None = None):
    """Pushdown-friendly epoch-microsecond comparison: the predicate is
    expressed against the *raw* parquet column (``{c}_raw``), so it lands in
    PushedFilters and prunes row groups. Semantically identical to
    ``col(c_us) <op> v`` (exact: nanos bounds are scaled, not floored)."""
    raw = F.col(f"{c}_raw")
    dt = raw_dtype
    if dt is None:
        for (_, cc), d in _RAW_DTYPE.items():
            if cc == c:
                dt = d
                break
    if dt == "bigint":            # nanos: floor(ns/1000) <op> v rewritten
        bounds = {">=": raw >= v * 1000, ">": raw >= (v + 1) * 1000,
                  "<": raw < v * 1000, "<=": raw < (v + 1) * 1000}
        return bounds[op]
    if dt == "timestamp_ntz":
        lit = F.expr(f"timestampadd(MICROSECOND, {v}, "
                     f"timestamp_ntz'1970-01-01 00:00:00')")
    else:
        lit = F.timestamp_micros(F.lit(v))
    return {">=": raw >= lit, ">": raw > lit,
            "<": raw < lit, "<=": raw <= lit}[op]


def us_between(c: str, lo: int, hi: int):
    """Inclusive [lo, hi] epoch-microsecond range on the raw column."""
    return us_cmp(c, ">=", lo) & us_cmp(c, "<=", hi)


def register_tables(spark: SparkSession, sf_dir: str,
                    names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load tables and register them as temp views (for spark.sql plans)."""
    out = {}
    for name in names or TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# Epoch-microsecond literals for timestamp predicates (timezone-proof: the
# parquet nanos are naive/UTC instants on both engines).
def us(iso: str) -> int:
    """'2024-01-10T00:00:00' → microseconds since epoch (UTC)."""
    from datetime import datetime, timezone
    dt = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)
