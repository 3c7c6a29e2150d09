"""Deterministic sampling and splitting for training-data pipelines.

A 100 TB corpus job needs reproducible subsetting: train/val/test splits
that never leak rows between runs, per-source mixture weights for data
mixing, and downsampling that two engines (or two reruns) agree on
row-for-row. Spark's ``sample()``/``randomSplit()`` are seed-stable only
for a fixed partitioning — a repartition or a second cluster reshuffles
the outcome. Everything here instead derives the decision from a hash of
a stable key column, so membership is a pure function of the DATA:

- portable across engines (md5 is md5 everywhere — the corpus queries
  oracle-check these against DuckDB),
- stable under repartitioning, AQE re-plans, and incremental appends
  (a new file's rows don't change old rows' membership),
- map-only: a scalar predicate in the scan, no shuffle, fully pushed
  into whole-stage codegen.

The hash bucket is ``conv(substr(md5(key), 1, 15), 16, 10) % 10_000``
(60 bits → signed BIGINT, ANSI-safe) — uniform to ~1e-4 granularity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["hash_bucket", "deterministic_sample", "hash_split",
           "weighted_mixture"]

N_BUCKETS = 10_000


def hash_bucket(key_col, salt: str = "") -> Column:
    """Uniform bucket in [0, 10000) from a stable key (+ optional salt —
    different salts give independent draws from the same keys)."""
    key = F.concat(F.col(key_col).cast("string"), F.lit(salt))
    return (F.conv(F.substring(F.md5(key), 1, 15), 16, 10)
             .cast("bigint") % N_BUCKETS)


def deterministic_sample(df: DataFrame, fraction: float, key_col: str,
                         salt: str = "") -> DataFrame:
    """Keep ``fraction`` of rows, chosen by key hash — reproducible across
    runs, engines, and partitionings (unlike ``df.sample``)."""
    return df.where(hash_bucket(key_col, salt)
                    < int(round(fraction * N_BUCKETS)))


def hash_split(df: DataFrame, weights: "dict[str, float]", key_col: str,
               salt: str = "") -> DataFrame:
    """Disjoint, exhaustive split (train/val/test ...): adds a ``split``
    column from contiguous hash-bucket ranges sized by ``weights``
    (normalized). Rows with the same key always land in the same split —
    the leakage-proof property ``randomSplit`` cannot give across runs."""
    total = sum(weights.values())
    expr: Column | None = None
    edge = 0.0
    items = list(weights.items())
    b = hash_bucket(key_col, salt)
    for name, w in items[:-1]:
        edge += w / total * N_BUCKETS
        cond = b < int(round(edge))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def weighted_mixture(df: DataFrame, rates: "dict[str, float]",
                     source_col: str, key_col: str,
                     salt: str = "") -> DataFrame:
    """Data mixing: per-source keep rates (epochs ≤ 1.0 here; >1.0
    up-sampling is a separate explode). Sources absent from ``rates``
    are dropped — the usual allowlist semantics of a mixture spec."""
    b = hash_bucket(key_col, salt)
    expr = None
    for src, rate in rates.items():
        cond = (F.col(source_col) == src) & (b < int(round(rate * N_BUCKETS)))
        expr = cond if expr is None else expr | cond
    return df.where(expr if expr is not None else F.lit(False))
