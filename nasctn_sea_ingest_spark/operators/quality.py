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
           "referential", "audit", "skew_survey", "skew_counts",
           "skew_report"]


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


def _percentile_label(p: float) -> str:
    """Column label for percentile ``p`` — the FULL decimal
    representation, not a rounded integer (r12 ADVICE: the old
    ``round(p*100):02d`` labeled 0.995 and 1.0 both ``p100_cnt`` and
    banker's rounding collided 0.115/0.125 at ``p12_cnt``, silently
    duplicating output column names).  ``.10g`` absorbs float fuzz
    (0.115*100 = 11.499999999999998 prints 11.5); the integer part
    keeps the legacy 2-digit zero-pad so existing consumers of
    ``p50_cnt``/``p99_cnt`` see unchanged names."""
    s = format(p * 100, ".10g")
    if "." in s:
        ip, fp = s.split(".", 1)
        return f"p{int(ip):02d}_{fp}_cnt"
    return f"p{int(s):02d}_cnt"


def skew_survey(df: DataFrame,
                 key_cols: "list[str | tuple[str, ...]]",
                 percentiles: "tuple[float, ...]" = (0.5, 0.99),
                 exact: bool = True,
                 salt_share: float = 0.2,
                 skew_ratio_hint: float = 10.0,
                 approx_accuracy: int = 10000,
                 exact_key_limit: "int | None" = 10_000_000) -> DataFrame:
    """Join/agg-key skew diagnostics for J candidate keys in ONE scan
    of the table — the profiling pass a 100 TB pipeline runs BEFORE
    choosing a shuffle strategy (salt factor, AQE skew-join
    thresholds, broadcast candidacy all start from exactly these
    numbers).  Companion to ``functions.skew_profile`` (the single-
    planned-key heavy-hitter dict: top-k offenders for one key you
    already chose) — this one COMPARES J candidate keys in one scan
    and returns a DataFrame an optimizer or oracle can consume.  Each
    entry is a column name or a TUPLE of column names
    (a composite join key, profiled as one grouping set and labeled
    ``"a,b"`` — the `fd_discover` composite string-form contract).

    One ``GROUPING SETS ((k1), (k2), ...)`` aggregation replaces J
    separate ``groupBy(k).count()`` scans: Catalyst's Expand duplicates
    each row J times MAP-SIDE, then partial aggregation collapses to
    per-partition distinct keys per set before the single shuffle — so
    profiling J keys moves ~J x (distinct keys per partition) over the
    wire, not J x rows, and reads the table once.  A second, tiny
    shuffle (J groups, one per profiled column, labeled via
    ``grouping()`` flags — NULL key values form their own counted group
    and cannot be confused with rolled-up rows) reduces each count
    distribution to the profile row.

    ``exact=True`` computes exact interpolated percentiles over the
    per-key count distribution (J reducers each hold n_keys counts —
    fine up to ~10M distinct keys per column); pass ``exact=False`` at
    billions of keys for bounded-memory ``approx_percentile``.  The
    caller should not have to KNOW the cardinality in advance (it is
    exactly what this profiler measures), so ``exact=True`` is guarded
    by a cheap pre-gate (the ``fd_discover`` pattern): one
    ``approx_count_distinct`` scan over the candidate entries, and if
    any entry's estimate exceeds ``exact_key_limit`` (default 10M,
    padded 10% for HLL error) the survey auto-switches to
    ``approx_percentile`` instead of OOMing a reducer.

    .. note:: the pre-gate is an EAGER action at call time: with the
       defaults (``exact=True``, ``exact_key_limit`` set), merely
       CONSTRUCTING the survey DataFrame runs one
       ``approx_count_distinct`` scan of ``df`` before anything is
       returned — the gate's answer decides which plan to build, so
       it cannot be deferred into the plan itself.  Callers composing
       lazily (or who already know the cardinality) pass
       ``exact_key_limit=None`` to skip the gate scan and trust the
       caller, or ``exact=False`` to build the bounded-memory plan
       with no gate needed.

    Returns one row per key entry: ``key_col, n_keys, total_rows,
    max_cnt, avg_cnt, p<P>_cnt..., top1_share, skew_ratio, hint`` where
    ``hint`` is 'salt' (one key owns > ``salt_share`` of the table — a
    single reducer would eat it; salt + two-phase agg), 'aqe-skew-join'
    (max key > ``skew_ratio_hint`` x the mean — AQE skew splitting
    handles it), else 'hash-ok'.  All ratios are exact-integer double
    divisions, deterministic across engines."""
    if not key_cols:
        raise ValueError("skew_survey needs at least one key column")
    if not percentiles:
        raise ValueError("skew_survey needs at least one percentile "
                         "(percentile(.., array()) fails analysis)")
    for p in percentiles:
        if not 0 <= p <= 1:
            raise ValueError(f"percentile out of [0,1]: {p}")
    plabels = [_percentile_label(p) for p in percentiles]
    if len(set(plabels)) != len(plabels):
        raise ValueError(
            f"duplicate percentile column labels {plabels} from "
            f"percentiles {tuple(percentiles)}")
    # set-wise uniqueness matters: ('a','b') and ('b','a') are the
    # same grouping set — GROUPING SETS would compute it twice and
    # both copies would coalesce to the FIRST entry's label, doubling
    # its n_keys/total_rows (validation shared with skew_counts)
    entries = _skew_entries(key_cols)
    # union of columns across entries, first-seen order — one
    # grouping() flag per column identifies the exact set a row
    # belongs to (an entry matches iff ALL its columns are grouped
    # AND all others are rolled up: ('a',) and ('a','b') entries
    # must not be confused)
    allc = list(dict.fromkeys(c for e in entries for c in e))
    if exact and exact_key_limit is not None:
        # cardinality pre-gate: ONE scan, one approx_count_distinct per
        # entry (composite entries via struct), ~2% HLL error — padded
        # 10% so a borderline-exact survey never flips spuriously.  A
        # driver-side gate action at plan-build time, the fd_discover
        # precedent: the profiler must not trust the caller to know
        # the very cardinality it exists to measure.
        est = df.agg(*[
            F.approx_count_distinct(
                F.struct(*e) if len(e) > 1 else F.col(e[0]))
            .alias(f"__e{i}") for i, e in enumerate(entries)]).first()
        worst = max(est[i] for i in range(len(entries)))
        if worst > exact_key_limit * 1.1:
            exact = False
    cnt = (df.groupingSets([list(e) for e in entries], *allc)
             .agg(F.count(F.lit(1)).alias("__cnt"),
                  *[F.grouping(c).alias(f"__g{i}")
                    for i, c in enumerate(allc)]))
    gflag = {c: F.col(f"__g{i}") for i, c in enumerate(allc)}

    def _match(e):
        m = F.lit(True)
        for c in allc:
            m = m & (gflag[c] == (0 if c in e else 1))
        return m
    key_col = F.coalesce(*[F.when(_match(e), F.lit(",".join(e)))
                           for e in entries])
    pl = ", ".join(repr(float(p)) for p in percentiles)
    fn = ("percentile(__cnt, array({}))".format(pl) if exact else
          "approx_percentile(__cnt, array({}), {})".format(
              pl, int(approx_accuracy)))
    prof = (cnt.groupBy(key_col.alias("key_col"))
            .agg(F.count(F.lit(1)).alias("n_keys"),
                 F.sum("__cnt").alias("total_rows"),
                 F.max("__cnt").alias("max_cnt"),
                 F.expr(fn).alias("__ps")))
    top1 = F.col("max_cnt") / F.col("total_rows")
    ratio = F.col("max_cnt") * F.col("n_keys") / F.col("total_rows")
    return prof.select(
        "key_col", "n_keys", "total_rows", "max_cnt",
        (F.col("total_rows") / F.col("n_keys")).alias("avg_cnt"),
        *[(F.col("__ps")[i].cast("double").alias(lbl))
          for i, lbl in enumerate(plabels)],
        top1.alias("top1_share"),
        ratio.alias("skew_ratio"),
        F.when(top1 > F.lit(float(salt_share)), F.lit("salt"))
         .when(ratio > F.lit(float(skew_ratio_hint)),
               F.lit("aqe-skew-join"))
         .otherwise(F.lit("hash-ok")).alias("hint"))


def _skew_entries(key_cols):
    entries = [(k,) if isinstance(k, str) else tuple(k)
               for k in key_cols]
    if not entries:
        raise ValueError("need at least one key column")
    if any(not e for e in entries):
        raise ValueError("empty composite key entry in key_cols")
    if len({frozenset(e) for e in entries}) != len(entries):
        raise ValueError("duplicate key entry in key_cols")
    return entries


def skew_counts(df: DataFrame,
                key_cols: "list[str | tuple[str, ...]]") -> DataFrame:
    """Per-key-VALUE counts for J candidate keys in ONE scan:
    ``(key_col, key_val, cnt)`` — :func:`skew_survey`'s GROUPING-SETS
    pass with the key value carried as a canonical string so the
    counts are MERGEABLE (sum by (key_col, key_val)) across batches /
    partitions / days.  This is the maintainable state behind
    ``streaming.skew_profile_stream``; :func:`skew_report` turns a
    (merged) counts frame into the same stats/hints ``skew_survey``
    computes directly.

    Encoding: cast values are escaped (0x00 → 0x00 'z', 0x1F → 0x00
    'u') then joined by the 0x1F unit separator, with NULL encoded as
    the 0x00 'NULL' token.  After escaping, every 0x00 inside a value
    is followed by 'z' or 'u' and no bare 0x1F survives, so a string
    that legitimately CONTAINS the separator or the NULL token (e.g.
    "\\x00NULL") can collide with neither — NULL keys stay their own
    counted group (the skew culprit most profilers drop), composite
    tuples cannot collide with strings containing separators, and the
    encoding stays injective on arbitrary binary-ish strings."""
    entries = _skew_entries(key_cols)
    allc = list(dict.fromkeys(c for e in entries for c in e))
    cnt = (df.groupingSets([list(e) for e in entries], *allc)
             .agg(F.count(F.lit(1)).alias("cnt"),
                  *[F.grouping(c).alias(f"__g{i}")
                    for i, c in enumerate(allc)]))
    gflag = {c: F.col(f"__g{i}") for i, c in enumerate(allc)}

    def _match(e):
        m = F.lit(True)
        for c in allc:
            m = m & (gflag[c] == (0 if c in e else 1))
        return m

    def _esc(c):
        # escape-char scheme (docstring): 0x00 doubles as the escape
        # lead, so post-escape values contain no bare 0x1f and no 0x00
        # not followed by z/u — the NULL token stays unforgeable
        s = F.replace(F.col(c).cast("string"),
                      F.lit("\x00"), F.lit("\x00z"))
        return F.replace(s, F.lit("\x1f"), F.lit("\x00u"))

    def _val(e):
        return F.concat_ws("\x1f", *[
            F.when(F.col(c).isNull(), F.lit("\x00NULL"))
             .otherwise(_esc(c)) for c in e])
    key_col = F.coalesce(*[F.when(_match(e), F.lit(",".join(e)))
                           for e in entries])
    key_val = F.coalesce(*[F.when(_match(e), _val(e))
                           for e in entries])
    return (cnt.select(key_col.alias("key_col"),
                       key_val.alias("key_val"),
                       F.col("cnt").cast("bigint").alias("cnt"))
            .where(F.col("key_col").isNotNull()))


def skew_report(counts: DataFrame,
                percentiles: "tuple[float, ...]" = (0.5, 0.99),
                salt_share: float = 0.2,
                skew_ratio_hint: float = 10.0) -> DataFrame:
    """:func:`skew_survey`'s per-key stats/hints computed from a
    (key_col, key_val, cnt) counts frame (:func:`skew_counts`, or the
    ``skew_profile_stream`` snapshot) instead of a raw table scan —
    same columns, same exact-integer ratio arithmetic, same
    'salt' / 'aqe-skew-join' / 'hash-ok' hint thresholds, so a
    maintained profile reads identically to a from-scratch survey
    (parity-pinned by pytest)."""
    if not percentiles:
        raise ValueError("need at least one percentile")
    for p in percentiles:
        if not 0 <= p <= 1:
            raise ValueError(f"percentile out of [0,1]: {p}")
    plabels = [_percentile_label(p) for p in percentiles]
    if len(set(plabels)) != len(plabels):
        raise ValueError(f"duplicate percentile labels {plabels}")
    pl = ", ".join(repr(float(p)) for p in percentiles)
    prof = (counts.groupBy("key_col")
            .agg(F.count(F.lit(1)).alias("n_keys"),
                 F.sum("cnt").alias("total_rows"),
                 F.max("cnt").alias("max_cnt"),
                 F.expr(f"percentile(cnt, array({pl}))").alias("__ps")))
    top1 = F.col("max_cnt") / F.col("total_rows")
    ratio = F.col("max_cnt") * F.col("n_keys") / F.col("total_rows")
    return prof.select(
        "key_col", "n_keys", "total_rows", "max_cnt",
        (F.col("total_rows") / F.col("n_keys")).alias("avg_cnt"),
        *[(F.col("__ps")[i].cast("double").alias(lbl))
          for i, lbl in enumerate(plabels)],
        top1.alias("top1_share"),
        ratio.alias("skew_ratio"),
        F.when(top1 > F.lit(float(salt_share)), F.lit("salt"))
         .when(ratio > F.lit(float(skew_ratio_hint)),
               F.lit("aqe-skew-join"))
         .otherwise(F.lit("hash-ok")).alias("hint"))
