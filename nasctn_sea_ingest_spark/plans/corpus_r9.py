"""Round-9 corpus extensions: exact DBSCAN density clustering,
approximate functional-dependency discovery, and weighted shortest
paths (the first ORACLE-checked iterative operator).

Three new workload families (checked against the live registry — the
graph/association faces q116 co-purchase and q128 triangles already
exist; these do not overlap them):

* q163 is DENSITY CLUSTERING (DBSCAN, Ester et al. KDD'96) over the
  deterministic customer plane from q161's recipe — the unsupervised-
  segmentation workload (hotspot detection, POI extraction) that
  composes three of the engine's bounded primitives instead of an
  all-pairs scan: grid-bucketed eps-neighbor join → core-point hash
  aggregate → alternating-star connected components (O(log n) rounds —
  density ridges form exactly the chain topologies that break
  diameter-bounded label propagation) → nearest-core border
  attachment.  ``operators.spatial.dbscan``.
* q164 is approximate FUNCTIONAL-DEPENDENCY discovery (Kivinen &
  Mannila's g3 error: the minimum fraction of rows to delete for the
  FD to hold) over a fixed candidate list on orders — data PROFILING,
  where q112's constraint audit checks rules someone already wrote.
  Two map-side-combinable hash aggregates per candidate, no windows,
  no key-count ceiling.  ``functions.fd_error``.
* q165 is weighted single-source shortest paths — iterative operators
  (PageRank, connected components, k-means) have been pytest-only
  because their fixpoint semantics have no SQL form, but INTEGER edge
  weights make every path sum exact on both engines, so Bellman-Ford
  earns a real driver-oracle row against a recursive-CTE relaxation
  with a provably-safe distance cap.  ``operators.graph.shortest_paths``.

Float parity per corpus.py rules: q163's coordinates are the q161
md5-integer recipe (exact 2-decimal doubles); the eps predicate
compares squared distances built with the identical IEEE op sequence,
and the border tie-break orders by (sqrt(d2), cluster) — sqrt is
correctly rounded in both engines, so ranks agree.  Output is
integer/string only.  q164 emits exact BIGINTs plus a floor-quantized
ratio.

Oracle note: q163's DuckDB oracle brute-forces the O(N²) neighbor
join and runs the transitive closure as a recursive CTE (closure rows
measured ~15k at sf0.01) — exactly the formulation that does NOT
survive scale; the plan contract pins the Spark side to the grid
equi-join + star rounds.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators.spatial import dbscan
from .corpus import _q
from .corpus_r8 import _DUCK_P, _spark_coord
from .tables import load_table

_EPS = 25.0
_MIN_PTS = 4

_DUCK_PTS = ("SELECT c_custkey AS id, "
             + _DUCK_P.format(salt="") + " AS px, "
             + _DUCK_P.format(salt=" || 'y'") + " AS py FROM customer")


@_q("q163_dbscan",
    f"exact DBSCAN (eps={_EPS:g}, min_pts={_MIN_PTS}) over the "
    "deterministic customer plane: eps-neighbor pairs from the grid "
    "equi-join (cell = eps, lossless), core points by one neighbor-"
    "count hash agg, core clusters by alternating-star connected "
    "components (O(log n) rounds on any topology), border points "
    "attach to the nearest core's cluster (ties by (dist, cluster)), "
    "rest is noise.  One row per customer: (id, role, cluster); "
    "cluster = component min core id, NULL for noise.  The DuckDB "
    "oracle brute-forces the N^2 neighbor join and a recursive-CTE "
    "transitive closure — the formulation the Spark plan must avoid",
    f"""
    WITH RECURSIVE pts AS ({_DUCK_PTS}),
    nbr AS (
      SELECT a.id AS ia, b.id AS ib,
             (a.px-b.px)*(a.px-b.px) + (a.py-b.py)*(a.py-b.py) AS d2
      FROM pts a JOIN pts b ON a.id <> b.id),
    r AS (SELECT ia, ib, sqrt(d2) AS dist FROM nbr
          WHERE d2 <= {_EPS * _EPS}),
    nc AS (SELECT ia AS id, count(*) + 1 AS n FROM r GROUP BY 1),
    core AS (SELECT p.id FROM pts p LEFT JOIN nc ON nc.id = p.id
             WHERE coalesce(nc.n, 1) >= {_MIN_PTS}),
    ce AS (SELECT ia, ib FROM r
           WHERE ia IN (SELECT id FROM core)
             AND ib IN (SELECT id FROM core)),
    reach(id, l) AS (
      SELECT id, id FROM core
      UNION
      SELECT ce.ib, reach.l FROM reach JOIN ce ON ce.ia = reach.id),
    clab AS (SELECT id, CAST(min(l) AS BIGINT) AS cl FROM reach
             GROUP BY 1),
    bcand AS (
      SELECT r.ia AS id, clab.cl, r.dist,
             row_number() OVER (PARTITION BY r.ia
                                ORDER BY r.dist, clab.cl) AS rn
      FROM r JOIN clab ON clab.id = r.ib
      WHERE r.ia NOT IN (SELECT id FROM core)),
    border AS (SELECT id, cl FROM bcand WHERE rn = 1)
    SELECT p.id AS id,
           CASE WHEN clab.id IS NOT NULL THEN 'core'
                WHEN border.id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS role,
           coalesce(clab.cl, border.cl) AS cluster
    FROM pts p
    LEFT JOIN clab ON clab.id = p.id
    LEFT JOIN border ON border.id = p.id
    ORDER BY id
    """)
def q163(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(F.col("c_custkey").alias("id"),
                   _spark_coord("").alias("x"),
                   _spark_coord("y").alias("y"))
    out = dbscan(pts, _EPS, _MIN_PTS)
    return (out.select("id", "role",
                       F.col("cluster").cast("bigint").alias("cluster"))
            .orderBy("id"))


_FD_CANDIDATES = [
    # (lhs, rhs) over orders — a true key (error 0), near-keys, and
    # independent columns so the error spectrum is non-trivial
    ("o_orderkey", "o_orderstatus"),
    ("o_custkey", "o_orderstatus"),
    ("o_custkey", "o_orderpriority"),
    ("o_orderdate", "o_orderstatus"),
    ("o_orderpriority", "o_orderstatus"),
]

_FD_ONE = """
    SELECT '{lhs}' AS lhs, '{rhs}' AS rhs, n_rows, n_groups, violations,
           floor(CAST(violations AS DOUBLE) / n_rows * 1000000)
             / 1000000.0 AS error
    FROM (
      SELECT CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n) - sum(m) AS BIGINT) AS violations
      FROM (
        SELECT {lhs}, max(c) AS m, sum(c) AS n
        FROM (SELECT {lhs}, {rhs}, count(*) AS c FROM orders
              GROUP BY 1, 2)
        GROUP BY 1))
"""


@_q("q164_fd_discovery",
    "approximate functional-dependency discovery over a fixed "
    "candidate list on orders: per FD the g3 error (min fraction of "
    "rows to delete for lhs -> rhs to hold exactly) = "
    "(N - sum over lhs groups of the plurality rhs count) / N.  "
    "ALL candidates profiled in ONE table scan (functions.fd_profile: "
    "a stack melt feeds two map-side-combinable hash aggregates keyed "
    "by candidate), no windows, no joins, no key-count ceiling — the "
    "profiling complement to q112's constraint CHECKING.  The oracle "
    "is the K-scan UNION ALL of per-candidate subqueries: same "
    "result, exactly the I/O shape the one-scan plan avoids at 100 TB",
    " UNION ALL ".join(_FD_ONE.format(lhs=l, rhs=r)
                       for l, r in _FD_CANDIDATES)
    + " ORDER BY lhs, rhs")
def q164(spark, sf_dir):
    from ..functions import fd_profile
    o = load_table(spark, sf_dir, "orders")
    return fd_profile(o, _FD_CANDIDATES).orderBy("lhs", "rhs")


_W_SQL = ("CAST(cast(('0x' || substr(md5(cast(a.k AS VARCHAR) || '-' || "
          "cast(b.k AS VARCHAR)), 1, 8)) AS BIGINT) % 20 + 1 AS BIGINT)")


@_q("q165_shortest_paths",
    "weighted single-source shortest paths over the 25-node synthetic "
    "nation graph (directed edges where (a+b) % 3 != 0, md5-derived "
    "INTEGER weights 1..20 so every path sum is exact on both "
    "engines): distributed frontier-only Bellman-Ford "
    "(operators.graph.shortest_paths — per round one equi-join + "
    "groupBy-min, improved nodes only, exact empty-frontier fixpoint) "
    "vs a recursive-CTE relaxation in DuckDB with a provably-safe "
    "distance cap (true distances <= 40 = two max-weight hops on this "
    "dense graph; cap 100).  The FIRST driver-oracle row for an "
    "iterative operator — the pagerank/CC family is pytest-only "
    "because damping/fixpoint semantics have no SQL form; integer "
    "path sums do",
    """
    WITH RECURSIVE n AS (SELECT n_nationkey AS k FROM nation),
    e AS (
      SELECT a.k AS s, b.k AS d, {w} AS w
      FROM n a JOIN n b ON a.k <> b.k
      WHERE (a.k + b.k) % 3 <> 0),
    reach(node, dist) AS (
      SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      UNION
      SELECT e.d, reach.dist + e.w FROM reach JOIN e ON e.s = reach.node
      WHERE reach.dist + e.w <= 100)
    SELECT node, CAST(min(dist) AS BIGINT) AS dist
    FROM reach GROUP BY 1 ORDER BY 1
    """.replace("{w}", _W_SQL))
def q165(spark, sf_dir):
    from ..operators.graph import shortest_paths
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"))
    a = n.select(F.col("k").alias("s"))
    b = n.select(F.col("k").alias("d"))
    w = (F.conv(F.substring(F.md5(F.concat_ws(
        "-", F.col("s").cast("string"), F.col("d").cast("string"))),
        1, 8), 16, 10).cast("bigint") % 20 + 1).cast("bigint")
    edges = (a.crossJoin(b)
             .where((F.col("s") != F.col("d"))
                    & ((F.col("s") + F.col("d")) % 3 != 0))
             .select("s", "d", w.alias("w")))
    out = shortest_paths(edges, [0], src="s", dst="d", weight="w")
    return (out.select(F.col("node").cast("bigint").alias("node"),
                       F.col("dist").cast("bigint").alias("dist"))
            .orderBy("node"))
