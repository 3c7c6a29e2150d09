"""Round-12 corpus extension: a driver-oracle row for the exact
SemDeDup composition (``operators.similarity.semdedup_exact``) — the
one dedup tier that had only a pytest brute-force oracle (r11 verdict
#4; every other tier — exact/Jaccard/MinHash/SimHash/chunk/semantic-
heuristic — already has a cross-engine row).

The raw ``embeddings`` table is isotropic noise (max pairwise cosine
0.48/0.51/0.60 at sf0.001/0.01/0.1 — measured), so any honest
threshold over it yields an EMPTY drop list.  q171 therefore runs the
operator over ``embeddings ∪ perturbed(embeddings)``: the perturbed
copy (ids + 10000) scales coordinate 0 by 1.5 and coordinate 1 by 0.5
— big enough that each twin's cosine spreads over [0.971, 1.0) as a
DATA-DEPENDENT function of how much norm the vector carries in those
two coordinates, while every cross pair stays below 0.61.  At
threshold 0.98 a measured 499/500 (sf0.001, sf0.01) and 1995/2000
(sf0.1) of the twins qualify, and the minimum |cos − t| margin over
ALL pairs is 1.1e-3 / 1.8e-3 / 1.6e-4 — ten-plus orders above
cross-engine double-precision noise, so edge membership (and hence
the BIGINT drop list) is hash-stable by construction.

Both engines compute the perturbation in exact arithmetic (×1.5 and
×0.5 are power-of-two-scaled and exactly representable, so the
double-cast modified vectors are bit-identical), then the drop list
is the connected-component closure over cos ≥ t pairs, keep-min-id:
Spark runs the composition this operator exists for — normalize →
PCA(k=3, double precision; k=2 measured ~1 s slower at sf0.1 on this
near-isotropic corpus, same output) → grid equi-join with the lossless-superset
radius → full-width cosine verify → star_components — while the
DuckDB oracle pays the N² theta-join plus a recursive-CTE closure,
EXACTLY the plan the operator avoids at 100 TB.

Float parity per corpus.py rules: output is pure BIGINT (vec_id,
dup_of); no float ever leaves either engine.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .corpus import _q
from .tables import load_table

_SD_T = 0.98
_SD_OFF = 10000

_SD_ORACLE = f"""
    WITH RECURSIVE both_v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
      UNION ALL
      SELECT vec_id + {_SD_OFF},
             list_concat([CAST(embedding[1] AS DOUBLE) * 1.5,
                          CAST(embedding[2] AS DOUBLE) * 0.5],
                         list_transform(embedding[3:],
                                        x -> CAST(x AS DOUBLE)))
      FROM embeddings),
    pts AS (SELECT vec_id, v FROM both_v
            WHERE list_dot_product(v, v) > 0),
    edges AS (
      SELECT a.vec_id AS u, b.vec_id AS w
      FROM pts a JOIN pts b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= {_SD_T}),
    sym AS (SELECT u, w FROM edges UNION SELECT w, u FROM edges),
    nodes AS (SELECT DISTINCT u AS n FROM sym),
    reach(n, l) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT s.w, reach.l FROM reach JOIN sym s ON s.u = reach.n)
    SELECT CAST(n AS BIGINT) AS vec_id, CAST(MIN(l) AS BIGINT) AS dup_of
    FROM reach GROUP BY n HAVING MIN(l) <> n ORDER BY vec_id
"""


@_q("q171_semdedup_exact",
    "globally exact SemDeDup drop list over embeddings UNION a "
    f"perturbed copy (ids +{_SD_OFF}; coordinate 0 scaled 1.5x, "
    "coordinate 1 scaled 0.5x — exact power-of-two-scaled arithmetic, "
    "bit-identical across engines): vectors whose cosine graph at "
    f"t={_SD_T} connects them group together and every non-min id is "
    "dropped with dup_of = the kept representative.  The raw table is "
    "isotropic (max cross cosine 0.61) so the qualifying pairs are a "
    "data-dependent 499/500-to-1995/2000 subset of the twins, with "
    "min |cos-t| margin >= 1.6e-4 at every sf — membership is hash-"
    "stable by construction.  Spark runs the bounded composition "
    "(normalize -> double-precision PCA k=3 -> lossless-superset grid "
    "equi-join -> full-width cosine verify -> star_components); the "
    "oracle pays the N-squared theta-join + recursive-CTE closure the "
    "operator exists to avoid at 100 TB — "
    "operators/similarity.py semdedup_exact",
    _SD_ORACLE)
def q171(spark, sf_dir):
    from ..operators.similarity import semdedup_exact
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x AS double))")
        .alias("embedding"))
    pert = e.select(
        (F.col("vec_id") + F.lit(_SD_OFF)).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CASE"
            " WHEN i = 0 THEN cast(x AS double) * 1.5D"
            " WHEN i = 1 THEN cast(x AS double) * 0.5D"
            " ELSE cast(x AS double) END)").alias("embedding"))
    # k=3: halves projected candidate density vs k=2 on this
    # near-isotropic corpus (SCALE.md §24's curve) — measured 5.9 vs
    # 6.9 s warm at sf0.1, IDENTICAL output (exactness holds at any k)
    drops = semdedup_exact(base.unionByName(pert), threshold=_SD_T, k=3)
    return (drops.select(F.col("vec_id").cast("bigint").alias("vec_id"),
                         F.col("dup_of").cast("bigint").alias("dup_of"))
            .orderBy("vec_id"))


_SKEW_ORACLE = """
    WITH cnt AS (
      SELECT CASE WHEN GROUPING(l_suppkey) = 0 AND GROUPING(l_partkey) = 0
                  THEN 'l_suppkey,l_partkey'
                  WHEN GROUPING(l_suppkey) = 0 THEN 'l_suppkey'
                  WHEN GROUPING(l_partkey) = 0 THEN 'l_partkey'
                  ELSE 'l_returnflag' END AS key_col,
             count(*) AS c
      FROM lineitem
      GROUP BY GROUPING SETS ((l_suppkey), (l_partkey), (l_returnflag),
                              (l_suppkey, l_partkey))),
    prof AS (
      SELECT key_col,
             count(*) AS n_keys,
             CAST(sum(c) AS BIGINT) AS total_rows,
             max(c) AS max_cnt,
             CAST(quantile_cont(c, 0.5) AS DOUBLE) AS p50,
             CAST(quantile_cont(c, 0.99) AS DOUBLE) AS p99
      FROM cnt GROUP BY key_col)
    SELECT key_col, n_keys, total_rows, max_cnt,
           round(total_rows / CAST(n_keys AS DOUBLE), 5) AS avg_cnt,
           round(p50, 5) AS p50_cnt,
           round(p99, 5) AS p99_cnt,
           round(max_cnt / CAST(total_rows AS DOUBLE), 5) AS top1_share,
           round(max_cnt * CAST(n_keys AS DOUBLE) / total_rows, 5)
             AS skew_ratio,
           CASE WHEN max_cnt / CAST(total_rows AS DOUBLE) > 0.2
                THEN 'salt'
                WHEN max_cnt * CAST(n_keys AS DOUBLE) / total_rows > 10.0
                THEN 'aqe-skew-join'
                ELSE 'hash-ok' END AS hint
    FROM prof ORDER BY key_col
"""


@_q("q172_skew_survey",
    "join/agg-key skew diagnostics for FOUR candidate keys — three "
    "single columns plus the COMPOSITE (l_suppkey, l_partkey) join "
    "key, labeled 'l_suppkey,l_partkey' per the fd_discover composite "
    "string contract — in ONE lineitem scan via GROUPING SETS (Expand "
    "duplicates rows map-side, partial agg collapses to per-partition "
    "distinct keys before the single shuffle — profiling J keys moves "
    "~J x distinct keys, not J x rows); per key: cardinality, max/avg/"
    "p50/p99 of the count distribution, top1_share, skew_ratio, and "
    "the shuffle-strategy hint a 100 TB planner acts on "
    "(l_returnflag's 0.334 top-key share -> 'salt'; the id keys and "
    "the pair -> 'hash-ok'; margins vs the 0.2/10.0 thresholds are "
    ">= 1.6x for the singles and >= 1.9x for the pair at every sf so "
    "the CASE is hash-stable).  All ratios are exact-integer double "
    "divisions; percentiles are exact interpolated (quantile_cont "
    "parity, the q16 pattern) — operators/quality.py skew_survey",
    _SKEW_ORACLE)
def q172(spark, sf_dir):
    from ..operators.quality import skew_survey
    li = load_table(spark, sf_dir, "lineitem")
    prof = skew_survey(li, ["l_suppkey", "l_partkey", "l_returnflag",
                             ("l_suppkey", "l_partkey")])
    return (prof.select(
        "key_col", "n_keys", "total_rows", "max_cnt",
        F.round("avg_cnt", 5).alias("avg_cnt"),
        F.round("p50_cnt", 5).alias("p50_cnt"),
        F.round("p99_cnt", 5).alias("p99_cnt"),
        F.round("top1_share", 5).alias("top1_share"),
        F.round("skew_ratio", 5).alias("skew_ratio"),
        "hint").orderBy("key_col"))
