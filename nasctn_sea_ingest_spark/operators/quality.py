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


def unique(cols: "list[str]") -> "tuple[str, list[str]]":
    """Marker for a uniqueness rule over a key tuple (resolved in audit:
    extra rows among fully-non-null keys; NULL-bearing keys are excluded
    from the check, dbt's `unique` semantics)."""
    return ("+".join(cols) + ".unique", cols)


def referential(name: str, child: DataFrame, child_col: str,
                parent: DataFrame, parent_col: str
                ) -> "tuple[str, DataFrame, str, DataFrame, str]":
    """Referential-integrity rule: non-null ``child_col`` values with no
    matching ``parent_col`` row (orphans), counted via left-anti join.
    Pass the returned tuple in :func:`audit`'s ``referential_rules``."""
    return (name, child, child_col, parent, parent_col)


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

    ``referential_rules`` entries come from :func:`referential` (or are
    equivalent ``(name, child_df, child_col, parent_df, parent_col)``
    tuples) — orphaned child keys counted via left-anti join.
    """
    if not table_rules and not referential_rules:
        raise ValueError("audit: no rules given")
    parts: list[DataFrame] = []
    for tname, (df, rules) in table_rules.items():
        if not rules:
            raise ValueError(f"audit: empty rule list for table {tname!r}")
        aggs = []
        for rule in rules:
            name, payload = rule
            if name.endswith(".unique"):
                cols = payload
                # NULL-bearing keys are excluded (dbt `unique` semantics):
                # a struct key would otherwise conflate (1, NULL)/(NULL, 1)
                # -like tuples under string encodings, and SQL's
                # count(DISTINCT col) ignores NULLs anyway
                nonnull = F.lit(True)
                for c in cols:
                    nonnull = nonnull & F.col(c).isNotNull()
                key = F.when(nonnull,
                             F.struct(*[F.col(c) for c in cols]))
                aggs.append((F.count(F.when(nonnull, 1))
                             - F.count_distinct(key))
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
