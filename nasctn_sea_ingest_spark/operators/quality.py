"""Data-quality constraint checking (the dbt-tests / Deequ workload): each
rule compiles to a relational violation count, the suite unions into one
small report frame — a full audit is one pass over each table plus one
anti-join per referential rule, all map-combinable aggregates.

At 100 TB each rule's scan prunes to the columns it touches (parquet
column projection), single-table rules on the same table share one scan
when composed through :func:`audit` (one aggregate, many conditional
counts), and referential rules are left-anti joins that AQE broadcasts
when the parent side is small. Violations are COUNTED, not materialized —
the report is O(rules), never O(rows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = ["not_null", "unique", "accepted_values", "in_range",
           "referential", "audit"]


def not_null(col: str) -> "tuple[str, Column]":
    """Rows where ``col`` IS NULL."""
    return (f"{col}.not_null",
            F.count(F.when(F.col(col).isNull(), 1)))


def accepted_values(col: str, values: "list") -> "tuple[str, Column]":
    """Non-null rows outside the accepted set."""
    return (f"{col}.accepted_values",
            F.count(F.when(~F.col(col).isin(*values)
                           & F.col(col).isNotNull(), 1)))


def in_range(col: str, lo, hi) -> "tuple[str, Column]":
    """Non-null rows outside [lo, hi]."""
    return (f"{col}.range",
            F.count(F.when((F.col(col) < lo) | (F.col(col) > hi), 1)))


def unique(cols: "list[str]") -> "tuple[str, DataFrame]":
    """Marker for a uniqueness rule over a key tuple (resolved in audit:
    total rows minus distinct keys)."""
    return ("+".join(cols) + ".unique", cols)  # type: ignore[return-value]


def audit(table_rules: "dict[str, tuple[DataFrame, list]]",
          referential_rules:
          "list[tuple[str, DataFrame, str, DataFrame, str]] | None" = None
          ) -> DataFrame:
    """Run a constraint suite; returns ``(rule, violations)`` rows.

    ``table_rules`` maps a table name to ``(df, rules)`` where each rule
    comes from :func:`not_null` / :func:`accepted_values` /
    :func:`in_range` / :func:`unique`. All scalar rules for one table
    fold into ONE aggregate over ONE scan; each :func:`unique` rule adds
    a count-distinct to the same aggregate.

    ``referential_rules`` entries are ``(name, child_df, child_col,
    parent_df, parent_col)`` — orphaned child keys counted via left-anti
    join.
    """
    parts: list[DataFrame] = []
    for tname, (df, rules) in table_rules.items():
        aggs = []
        for rule in rules:
            name, payload = rule
            if name.endswith(".unique"):
                cols = payload
                key = F.concat_ws("\x00",
                                  *[F.col(c).cast("string") for c in cols])
                aggs.append((F.count("*") - F.count_distinct(key))
                            .alias(f"{tname}.{name}"))
            else:
                aggs.append(payload.alias(f"{tname}.{name}"))
        wide = df.agg(*aggs)
        stack = F.explode(F.array(*[
            F.struct(F.lit(c).alias("rule"),
                     F.col(f"`{c}`").cast("long").alias("violations"))
            for c in wide.columns]))
        parts.append(wide.select(stack.alias("s")).select("s.*"))
    for name, child, ccol, parent, pcol in (referential_rules or []):
        orphans = (child.select(F.col(ccol).alias("__k"))
                   .where(F.col("__k").isNotNull())
                   .join(parent.select(F.col(pcol).alias("__k")),
                         "__k", "left_anti")
                   .agg(F.lit(name).alias("rule"),
                        F.count("*").alias("violations")))
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
