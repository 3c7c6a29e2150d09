"""Round-8 corpus extensions: grid-bucketed spatial distance join and
symmetric-delete fuzzy string matching.

Two workload families completing the candidate-bound-join coverage —
both are joins a naive formulation plans as a broadcast nested-loop /
cartesian (theta predicates: ``dist(a,b) <= r``,
``levenshtein(a,b) <= k``), re-expressed as EQUI-joins over derived
blocking keys so Catalyst hash-joins them and the cost is bound by the
bucket density, not N²:

* q161 is the spatial radius self-join (point-of-interest dedup, sensor
  co-location): grid cells of side = radius, 3×3-neighborhood explode on
  one side, hash equi-join on the cell id — LOSSLESS (unlike LSH: the
  neighborhood provably contains every in-radius pair), each pair
  enumerated exactly once (the offset relating two home cells is
  unique).  ``operators/spatial.py``.
* q162 is the fuzzy entity-match join (customer-name dedup at edit
  distance 1): symmetric-delete (SymSpell) blocking — strings within
  distance k share a <=k-deletion variant, so exploding variant sets and
  equi-joining on the variant yields a candidate superset verified with
  one exact JVM ``levenshtein`` per distinct pair.
  ``operators/dedup.edit_distance_pairs``.

Float parity per corpus.py rules: q161 derives coordinates from pure
integer arithmetic (the q55 md5-bucket recipe, ``% 100000 / 100.0`` —
exact in both engines), compares squared distances computed with the identical IEEE
op sequence (no sqrt before the predicate), and emits the distance
floor-quantized to integer micro-units.  q162 is integer-only output
(ids + levenshtein distance).

Oracle note: both DuckDB oracles are the O(N²) brute-force join — at
sf0.01's 1,500 customers that is 1.1M pairs, trivial for the oracle and
exactly the formulation whose Spark plan would NOT survive scale; the
plan-contract tests assert the Spark side stays equi-join-shaped.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators.dedup import edit_distance_pairs
from ..operators.spatial import grid_distance_join
from .corpus import _q
from .tables import load_table

# deterministic synthetic coordinates on a 1000x1000 plane from the
# q55 md5-bucket recipe (a multiply-mod spread puts consecutive keys on
# a degenerate lattice — distances quantize and whole radius ranges go
# empty); 15 hex chars = 60 bits, non-negative, identical BIGINT on
# both engines, two decimal digits after the % so /100.0 is exact
_DUCK_P = ("CAST(cast(('0x' || substr(md5(cast(c_custkey AS VARCHAR)"
           "{salt}), 1, 15)) AS BIGINT) % 100000 AS DOUBLE) / 100.0")
_RADIUS = 20.0


def _spark_coord(salt: str) -> F.Column:
    h = F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
            % 100000).cast("double") / 100.0


@_q("q161_grid_distance_join",
    "spatial radius self-join via grid bucketing: customers placed on a "
    "1000x1000 plane by deterministic integer hash coordinates; all "
    f"pairs within Euclidean distance {_RADIUS:g} as (id1, id2, "
    "micro-unit distance).  Grid cell = radius, 3x3-neighborhood explode on one "
    "side, hash equi-join on the cell id — lossless, each pair exactly "
    "once, candidate-bound by cell density (never the all-pairs "
    "nested-loop the theta predicate would plan as)",
    f"""
    WITH pts AS (
      SELECT c_custkey AS id, {_DUCK_P.format(salt="")} AS px,
             {_DUCK_P.format(salt=" || 'y'")} AS py FROM customer),
    p AS (
      SELECT a.id AS id1, b.id AS id2,
             (a.px - b.px) * (a.px - b.px)
               + (a.py - b.py) * (a.py - b.py) AS d2
      FROM pts a JOIN pts b ON a.id < b.id)
    SELECT id1, id2,
           CAST(floor(sqrt(d2) * 1000000 + 0.5) AS BIGINT) AS dist_um
    FROM p WHERE d2 <= {_RADIUS * _RADIUS}
    ORDER BY 1, 2
    """)
def q161(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(F.col("c_custkey").alias("id"),
                   _spark_coord("").alias("px"),
                   _spark_coord("y").alias("py"))
    pairs = grid_distance_join(pts, _RADIUS, id_col="id",
                               x_col="px", y_col="py")
    return (pairs.select(
        "id1", "id2",
        F.floor(F.col("dist") * 1000000 + F.lit(0.5)).cast("bigint")
         .alias("dist_um"))
        .orderBy("id1", "id2"))


@_q("q162_fuzzy_name_match",
    "fuzzy entity-match join: all customer-name pairs within "
    "Levenshtein distance 1, via symmetric-delete (SymSpell) blocking "
    "— explode each name's <=1-deletion variant set, hash equi-join on "
    "the variant (candidate superset, hot-variant guard on), verify "
    "with one exact JVM levenshtein per distinct pair.  The "
    "entity-resolution shape that replaces the O(N^2) "
    "levenshtein-theta join",
    """
    SELECT a.c_custkey AS id1, b.c_custkey AS id2,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY 1, 2
    """)
def q162(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return (edit_distance_pairs(c, id_col="c_custkey", text_col="c_name",
                                max_distance=1)
            .orderBy("id1", "id2"))
