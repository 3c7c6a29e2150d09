"""Local mirror of the driver's Spark-vs-DuckDB oracle compare.

Sorts columns by name, compares row count, then compares the multiset of rows
(exact equality; floats must already be parity-safe per corpus rules).
"""

from __future__ import annotations

import math

import duckdb

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os
    con = duckdb.connect()
    names = TABLE_NAMES + (["partsupp"] if os.path.exists(
        f"{sf_dir}/partsupp.parquet") else [])
    for t in names:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _key(row):
    return tuple(str(_norm(v)) for v in row)


def compare(spark_df, con, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = match).

    A Decimal-typed Spark output column is an immediate failure: the driver's
    value hash stringifies without float coercion, so decimal arithmetic that
    silently rounds differently from DuckDB's DOUBLE (the q24 round-1 bug)
    must fail locally too.  Corpus rules require casting to DOUBLE before any
    division/round that reaches the output.
    """
    problems = []
    from pyspark.sql.types import DecimalType
    for f in spark_df.schema.fields:
        if isinstance(f.dataType, DecimalType):
            problems.append(
                f"Decimal-typed output column {f.name!r}: cast to DOUBLE in the "
                f"query (decimal rounding diverges from DuckDB DOUBLE)")
    if problems:
        return problems
    sdf = spark_df.toPandas()
    odf = con.execute(sql).df()
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return [f"columns differ: spark={scols} oracle={ocols}"]
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    srows = sorted(_key(r) for r in sdf[scols].itertuples(index=False, name=None))
    orows = sorted(_key(r) for r in odf[ocols].itertuples(index=False, name=None))
    if srows != orows:
        n_bad = 0
        for a, b in zip(srows, orows):
            if a != b:
                n_bad += 1
                if n_bad <= 3:
                    problems.append(f"row differs:\n  spark ={a}\n  oracle={b}")
        extra = abs(len(srows) - len(orows))
        problems.append(f"{n_bad + extra} differing rows total")
    return problems
