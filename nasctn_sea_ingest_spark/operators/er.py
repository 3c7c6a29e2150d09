"""Probabilistic record linkage (Fellegi–Sunter) — the scoring layer of
the entity-resolution family: blocking (`plans/corpus_r3.py` q118's
block-key equi-join), fuzzy candidates (`dedup.edit_distance_pairs`),
cluster collapse (`dedup.dup_clusters`) already exist; this module adds
multi-block candidate generation and the classic log-likelihood-ratio
match score over per-field agreement patterns.

No referent in the reference repo; beyond-reference surface for
training-data pipelines (author/entity dedup across crawls, affiliation
normalization).

Scale shape: candidates come from a UNION of hash equi-joins on
deterministic block keys (each key a cheap expression of one record —
soundex-ish prefixes, zip codes, name initials), deduplicated on the id
pair — never an all-pairs comparison.  Scoring is pure map-side column
math on the candidate rows (one log-odds constant per field, folded at
plan-build time in Python).  The classic blocking trade is explicit:
recall is bounded by the union of block keys (a true match sharing NO
block key is never scored), so use 2-3 redundant keys.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class FieldRule:
    """One compared field: ``agree_expr(l, r)`` must yield a BOOLEAN
    Column given the two sides' Columns; ``m`` = P(agree | match),
    ``u`` = P(agree | non-match) — the Fellegi–Sunter parameters
    (estimate from labeled pairs, or EM, or set by judgment: rare
    fields have tiny ``u``)."""
    col: str
    m: float
    u: float
    kind: str = "exact"   # "exact" | "levenshtein1" | "prefix4" | "soundex"

    def __post_init__(self):
        # m=1 or u=0 are plausible "set by judgment" values but put the
        # log-likelihood weights at ±inf / raise in math.log2 — demand
        # open-interval probabilities with a hint instead.
        for name, v in (("m", self.m), ("u", self.u)):
            if not 0.0 < v < 1.0:
                raise ValueError(
                    f"FieldRule({self.col!r}): {name}={v} must lie in "
                    "(0, 1) exclusive — clamp judgment values (e.g. "
                    "0.999 / 1e-6) so log2 weights stay finite")

    def agree(self, left: Column, right: Column) -> Column:
        if self.kind == "exact":
            return left.eqNullSafe(right)
        if self.kind == "levenshtein1":
            return F.levenshtein(left, right) <= 1
        if self.kind == "prefix4":
            return F.substring(left, 1, 4) == F.substring(right, 1, 4)
        if self.kind == "soundex":
            # phonetic agreement (JVM built-in): catches transcription
            # variants levenshtein misses (smith/smyth, jon/john)
            return F.soundex(left) == F.soundex(right)
        raise ValueError(f"unknown agreement kind {self.kind!r}")

    @property
    def agree_weight(self) -> float:
        return math.log2(self.m / self.u)

    @property
    def disagree_weight(self) -> float:
        return math.log2((1.0 - self.m) / (1.0 - self.u))


def blocked_candidates(records: DataFrame, id_col: str,
                       block_exprs: "list[str]",
                       max_block: int | None = 1000) -> DataFrame:
    """Candidate id pairs from a UNION of block-key equi-joins: one
    self-join per blocking expression (a SQL expression string over one
    record's columns), deduplicated on (id1, id2).  Redundant keys give
    recall (a pair is compared if ANY key agrees); ``max_block``
    (default ON) drops degenerate keys — the empty zip, the "UNKNOWN"
    name — whose block would compare quadratically, the standard
    stop-key guard (recall traded inside mega-blocks only)."""
    if not block_exprs:
        raise ValueError(
            "blocked_candidates needs at least one blocking expression "
            "(an empty list would mean the all-pairs cross join this "
            "operator exists to avoid)")
    par = records.sparkSession.sparkContext.defaultParallelism
    if records.rdd.getNumPartitions() < par:
        records = records.repartition(par)
    pair_sets = []
    for i, expr in enumerate(block_exprs):
        keyed = records.select(F.col(id_col).alias("__id"),
                               F.expr(expr).alias("__bk")) \
                       .where(F.col("__bk").isNotNull())
        if max_block is not None:
            hot = (keyed.groupBy("__bk").agg(F.count("*").alias("bn"))
                   .where(F.col("bn") > max_block).select("__bk"))
            keyed = keyed.join(F.broadcast(hot), "__bk", "left_anti")
        a, b = keyed.alias("a"), keyed.alias("b")
        pair_sets.append(
            a.join(b, (F.col("a.__bk") == F.col("b.__bk"))
                   & (F.col("a.__id") < F.col("b.__id")))
             .select(F.col("a.__id").alias("id1"),
                     F.col("b.__id").alias("id2")))
    out = pair_sets[0]
    for p in pair_sets[1:]:
        out = out.unionByName(p)
    return out.distinct()


def linkage_scores(records: DataFrame, id_col: str,
                   block_exprs: "list[str]",
                   fields: "list[FieldRule]",
                   max_block: int | None = 1000) -> DataFrame:
    """Fellegi–Sunter match scores for every blocked candidate pair:
    ``(id1, id2, agree_<field>..., score)`` where ``score`` is the sum
    of per-field log2 likelihood ratios (agreement adds
    log2(m/u) > 0, disagreement adds log2((1-m)/(1-u)) < 0).  Classify
    with two thresholds downstream (match / clerical-review /
    non-match); feed the match tier to ``dedup.dup_clusters`` to
    collapse.  The weights are plan-time Python constants — scoring is
    one map-side projection over the candidate join, no UDF."""
    cand = blocked_candidates(records, id_col, block_exprs, max_block)
    need = [id_col] + [f.col for f in fields]
    left = records.select(*[F.col(c).alias(f"__l_{c}") for c in need])
    right = records.select(*[F.col(c).alias(f"__r_{c}") for c in need])
    j = (cand.join(left, cand["id1"] == left[f"__l_{id_col}"])
             .join(right, cand["id2"] == right[f"__r_{id_col}"]))
    score = F.lit(0.0)
    cols = [j["id1"], j["id2"]]
    for f_ in fields:
        ag = f_.agree(j[f"__l_{f_.col}"], j[f"__r_{f_.col}"])
        cols.append(ag.alias(f"agree_{f_.col}"))
        score = score + F.when(ag, F.lit(f_.agree_weight)) \
                         .otherwise(F.lit(f_.disagree_weight))
    return j.select(*cols, score.alias("score"))
