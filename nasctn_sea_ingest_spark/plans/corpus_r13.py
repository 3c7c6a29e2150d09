"""Round-13 corpus extension: driver-oracle rows for two iterative
graph families that until now had only pytest oracles.

- q173: COMMUNITY DETECTION — deterministic synchronous label
  propagation (``operators.graph.label_propagation``: Raghavan et al.
  2007 with a total (count desc, label asc) tie-break).  LPA's fixed
  ``max_iter`` budget is part of the semantics (the pagerank_exact
  exactness pattern), and the early-stop is provably a pure
  optimization — a round that changes nothing leaves every later
  round unchanged — so a 3-round run is EXACTLY expressible as three
  unrolled join+group+argmax stages in ANSI SQL, which is the DuckDB
  oracle.  Spark runs the library operator (driver loop, eager
  checkpoints, the Pregel discipline); DuckDB mechanically unrolls.

- q174: WEIGHTED BOUNDED-HOP DISTANCES — the Bellman-Ford relax shape
  of ``operators.graph.shortest_paths`` with a fixed 3-hop budget so
  the semantics are oracle-able: dist(src, node) = min total weight
  over paths of <= 3 edges, weights = co-purchase support counts
  (exact BIGINT sums, no float anywhere).  Each hop is one equi-join
  of the distance frontier against the once-checkpointed edge list
  plus one min hash-agg — exactly the per-round shuffle shape the
  convergent library operator runs, here as a declarative 3-round
  unroll both engines compute identically.

Both queries build the q116 co-purchase graph (support >= 2 over
lineitem's (order, part) pairs — pair expansion bounded per order,
never N²).  Outputs are pure BIGINT aggregates (community histogram /
per-source distance stats) per corpus.py float-parity rules.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .corpus import _q
from .tables import load_table

# shared DuckDB CTE prefix: the support>=2 co-purchase graph
_GRAPH_SQL = """
    d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (SELECT a.l_partkey AS u, b.l_partkey AS v,
                  CAST(count(*) AS BIGINT) AS w
           FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    e AS (SELECT u, v, w FROM e0
          UNION ALL SELECT v AS u, u AS v, w FROM e0)"""


def _copurchase_edges(spark, sf_dir):
    """(u, v, w) support>=2 co-purchase edges, one direction (u < v)."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select("l_orderkey", "l_partkey").distinct()
    a = d.alias("a")
    b = d.select(F.col("l_orderkey"),
                 F.col("l_partkey").alias("l_partkey2")).alias("b")
    return (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                   & (F.col("a.l_partkey") < F.col("b.l_partkey2")))
            .groupBy(F.col("a.l_partkey").alias("u"),
                     F.col("b.l_partkey2").alias("v"))
            .agg(F.count("*").cast("bigint").alias("w"))
            .where(F.col("w") >= 2))


_LPA_ROUND = """
    r{k} AS (SELECT e.u AS node, l.label AS lbl, count(*) AS c
             FROM e JOIN l{p} l ON l.node = e.v GROUP BY 1, 2),
    t{k} AS (SELECT node, lbl FROM (
               SELECT node, lbl, row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
               FROM r{k}) WHERE rn = 1),
    l{k} AS (SELECT l{p}.node, COALESCE(t{k}.lbl, l{p}.label) AS label
             FROM l{p} LEFT JOIN t{k} ON t{k}.node = l{p}.node)"""


@_q("q173_label_propagation",
    "community detection over the co-purchase graph: 3 synchronous "
    "label-propagation rounds with the deterministic (count desc, "
    "label asc) tie-break, community-size histogram out.  Spark runs "
    "operators.graph.label_propagation (per round: one equi-join of "
    "edges x labels, a (node,label) count agg, a map-side-combinable "
    "min(struct) argmax, eager checkpoint); the oracle unrolls the same "
    "three rounds as join+group+argmax CTEs — legal because LPA's "
    "early stop is provably a no-op on the result (an unchanged "
    "round fixes every later round)",
    f"""
    WITH {_GRAPH_SQL},
    nodes AS (SELECT DISTINCT u AS node FROM e),
    l0 AS (SELECT node, node AS label FROM nodes),
    {_LPA_ROUND.format(k=1, p=0)},
    {_LPA_ROUND.format(k=2, p=1)},
    {_LPA_ROUND.format(k=3, p=2)}
    SELECT CAST(label AS BIGINT) AS community,
           CAST(count(*) AS BIGINT) AS n_members
    FROM l3 GROUP BY 1 ORDER BY 1
    """)
def q173(spark, sf_dir):
    from ..operators.graph import label_propagation

    e = _copurchase_edges(spark, sf_dir)
    comm = label_propagation(e, "u", "v", max_iter=3)
    return (comm.groupBy(F.col("community").cast("bigint")
                         .alias("community"))
            .agg(F.count("*").cast("bigint").alias("n_members"))
            .orderBy("community"))


@_q("q174_bounded_hop_distances",
    "weighted bounded-hop shortest distances: from each part with id "
    "<= 50, the minimum co-purchase-weighted distance (edge weight = "
    "support count, exact BIGINT) to every node reachable in <= 3 "
    "hops — per source: reached-node count, sum and max of the "
    "minimal distances.  The shortest_paths relax shape (frontier "
    "join edges, min hash-agg per hop) as a declarative fixed-budget "
    "unroll, the pagerank_exact pattern: a fixed hop budget makes "
    "the iterative family's arithmetic engine-independent.  The "
    "edge list is checkpointed ONCE and reused by all three hops",
    f"""
    WITH {_GRAPH_SQL},
    srcs AS (SELECT DISTINCT u AS src FROM e WHERE u <= 50),
    d0 AS (SELECT src, src AS node, CAST(0 AS BIGINT) AS dist
           FROM srcs),
    x1 AS (SELECT d0.src, e.v AS node, d0.dist + e.w AS dist
           FROM d0 JOIN e ON e.u = d0.node),
    d1 AS (SELECT src, node, min(dist) AS dist FROM
           (SELECT * FROM d0 UNION ALL SELECT * FROM x1)
           GROUP BY 1, 2),
    x2 AS (SELECT d1.src, e.v AS node, d1.dist + e.w AS dist
           FROM d1 JOIN e ON e.u = d1.node),
    d2 AS (SELECT src, node, min(dist) AS dist FROM
           (SELECT * FROM d1 UNION ALL SELECT * FROM x2)
           GROUP BY 1, 2),
    x3 AS (SELECT d2.src, e.v AS node, d2.dist + e.w AS dist
           FROM d2 JOIN e ON e.u = d2.node),
    d3 AS (SELECT src, node, min(dist) AS dist FROM
           (SELECT * FROM d2 UNION ALL SELECT * FROM x3)
           GROUP BY 1, 2)
    SELECT CAST(src AS BIGINT) AS src,
           CAST(count(*) - 1 AS BIGINT) AS n_reach,
           CAST(sum(dist) AS BIGINT) AS sum_dist,
           CAST(max(dist) AS BIGINT) AS max_dist
    FROM d3 GROUP BY src ORDER BY src
    """)
def q174(spark, sf_dir):
    from ..querylog import stage_digest

    e0 = _copurchase_edges(spark, sf_dir)
    # undirected, materialized once — all three hops join against it
    # (the q145 discipline: a bare reference would re-run the lineitem
    # self-join per hop)
    e = (e0.select("u", "v", "w")
         .unionByName(e0.select(F.col("v").alias("u"),
                                F.col("u").alias("v"), "w")))
    # the edge build hides behind the checkpoint in the end-to-end
    # digest; record its pre-checkpoint plan (r12 verdict #1 pattern)
    stage_digest("q174.edges", e)
    e = e.localCheckpoint(eager=False)
    d = (e.select(F.col("u").alias("src")).where(F.col("u") <= 50)
         .distinct()
         .select("src", F.col("src").alias("node"),
                 F.lit(0).cast("bigint").alias("dist")))
    for _ in range(3):
        relax = (d.join(e, d.node == e.u)
                 .select("src", F.col("v").alias("node"),
                         (F.col("dist") + F.col("w")).alias("dist")))
        d = (d.unionByName(relax)
             .groupBy("src", "node")
             .agg(F.min("dist").alias("dist")))
    return (d.groupBy(F.col("src").cast("bigint").alias("src"))
            .agg((F.count("*") - 1).cast("bigint").alias("n_reach"),
                 F.sum("dist").cast("bigint").alias("sum_dist"),
                 F.max("dist").cast("bigint").alias("max_dist"))
            .orderBy("src"))


_W_US = 3_600_000_000  # 1-hour co-action window (microseconds)


@_q("q175_temporal_reachability",
    "TIME-RESPECTING 2-hop reachability over a temporal influence "
    "graph derived from the events stream: user A influences user B "
    "when both act on the same item (props JSON key) and B acts "
    "within 1 hour AFTER A; a 2-hop path s->v->w is valid only when "
    "the second edge departs AT OR AFTER the first's arrival (the "
    "temporal-path constraint ordinary reachability ignores).  "
    "EARLIEST-ARRIVAL semantics make 2 hops exact with one min-agg: "
    "an onward edge with t2 >= min arrival exists iff one exists for "
    "SOME arrival.  Per seed user (id < 15): distinct 1-hop and "
    "<=2-hop reach counts and the earliest arrival, all BIGINT "
    "microsecond arithmetic.  The edge build is a k-equi-join with a "
    "time-band predicate (the interval-join shape), checkpointed "
    "once and reused by both hops",
    f"""
    WITH ev AS (
      SELECT user_id AS u,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
             epoch_us(ts) AS t
      FROM events
      WHERE user_id IS NOT NULL AND props IS NOT NULL),
    e AS (
      SELECT DISTINCT a.u AS src, b.u AS dst, b.t AS t
      FROM ev a JOIN ev b
        ON a.k = b.k AND b.t > a.t AND b.t <= a.t + {_W_US}
       AND a.u != b.u),
    a1 AS (
      SELECT src, dst, min(t) AS arr
      FROM e WHERE src < 15 GROUP BY 1, 2),
    h2 AS (
      SELECT a1.src, e.dst AS w
      FROM a1 JOIN e ON e.src = a1.dst AND e.t >= a1.arr),
    reach AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM a1
        UNION ALL SELECT src, w AS dst FROM h2)
      WHERE dst != src)
    SELECT r.src AS src,
           CAST(count(*) AS BIGINT) AS n_reach2,
           CAST((SELECT count(*) FROM a1 x
                 WHERE x.src = r.src AND x.dst != r.src) AS BIGINT)
             AS n_hop1,
           CAST((SELECT min(arr) FROM a1 x WHERE x.src = r.src)
                AS BIGINT) AS first_arr_us
    FROM reach r GROUP BY 1 ORDER BY 1
    """)
def q175(spark, sf_dir):
    from ..querylog import stage_digest

    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("user_id").isNotNull()
                 & F.col("props").isNotNull())
          .select(F.col("user_id").alias("u"),
                  F.get_json_object("props", "$.k").cast("int")
                  .alias("k"),
                  F.col("ts_us").alias("t")))
    # 1-D time-grid join, r14: promoted to the library
    # (operators.graph.temporal_edges — r13 verdict #4) with a
    # max_cell hot-cell guard available; the corpus call leaves the
    # guard OFF so the emitted plan stays byte-identical to the r13
    # corpus-local build (stage digest q175.edges pinned unchanged
    # across the rewire).  Guard rationale and the lossless 2-bucket
    # candidate argument live in the operator docstring.
    from ..operators.graph import temporal_edges
    e = temporal_edges(ev, _W_US, key="k", id_col="u", ts="t")
    # the temporal edge list is read by BOTH hops — checkpoint once
    # (the q174 discipline), with its pre-checkpoint plan digested
    stage_digest("q175.edges", e)
    e = e.localCheckpoint(eager=False)
    a1 = (e.where(F.col("src") < 15)
          .groupBy("src", "dst").agg(F.min("t").alias("arr")))
    e2 = e.select(F.col("src").alias("v"), F.col("dst").alias("w"),
                  F.col("t").alias("t2"))
    h2 = (a1.join(e2, (F.col("v") == F.col("dst"))
                  & (F.col("t2") >= F.col("arr")))
          .select("src", F.col("w").alias("rdst")))
    reach = (a1.select("src", "dst")
             .unionByName(h2.select("src", F.col("rdst").alias("dst")))
             .where(F.col("dst") != F.col("src"))
             .distinct())
    stats = (a1.where(F.col("dst") != F.col("src"))
             .groupBy("src")
             .agg(F.count("*").cast("bigint").alias("n_hop1")))
    first = a1.groupBy("src").agg(F.min("arr").cast("bigint")
                                  .alias("first_arr_us"))
    return (reach.groupBy("src")
            .agg(F.count("*").cast("bigint").alias("n_reach2"))
            .join(stats, "src").join(first, "src")
            .select(F.col("src").cast("bigint").alias("src"),
                    "n_reach2", "n_hop1", "first_arr_us")
            .orderBy("src"))
