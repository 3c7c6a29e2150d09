"""Round-10 corpus extensions: exact fixed-point PageRank (the second
driver-oracled ITERATIVE operator) and functional-dependency DISCOVERY
(the auto-lattice face of round 9's fixed-candidate profiling).

* q166 is PageRank run as EXACT integer fixed-point arithmetic
  (``operators.graph.pagerank_exact``): q165 proved the pattern —
  exact arithmetic + fixed semantics = a SQL oracle for an iterative
  operator — and q166 extends it from path minima to POWER ITERATION.
  Every round's update is BIGINT floor-division arithmetic (scale
  10^12, damping 85/100, exactly 5 rounds), so both engines compute
  bit-identical rank vectors; the DuckDB oracle UNROLLS the five
  rounds as CTE stages (recursive CTEs cannot aggregate in the
  recursive term, and a fixed iteration count needs no recursion).
  The 25-node nation graph drops node 7's out-edges so the DANGLING
  redistribution term is exercised, not just defined.  q115 stays the
  float production face.

* q167 is approximate-FD DISCOVERY over orders
  (``functions.fd_discover``): q164 scores a hand-written candidate
  list; q167 GENERATES the level-1 lattice over five columns, drops
  key-like lhs with the approx-distinct gate (o_orderkey, ~15k
  distinct at the driver's sf0.01, is gated OUT at max_lhs_groups =
  5000 — the gate is part of the oracle-checked semantics), and
  scores every surviving candidate in ONE melt scan.  The oracle
  replays the gate with exact COUNT(DISTINCT) guards per candidate —
  sound because every column cardinality sits >= 2x away from the
  threshold on BOTH sides (3 / 5 / ~1k / ~2.4k vs ~15k), so the
  +-2% HLL estimate cannot straddle it.

* q168 is CONNECTED COMPONENTS with a real driver-oracle row: a
  customer-derived graph whose components are <= 16 nodes by
  construction (8-block anchors, every 5th key also linking its
  16-block anchor), so the DuckDB recursive-CTE closure stays O(16N)
  while ``star_components(local_graph_rows=0)`` pins the DISTRIBUTED
  alternating-star loop — the kernel is parity- and hypothesis-pinned
  against that loop, so one oracle row covers both.

Float parity per corpus.py rules: q166 is pure BIGINT; q167 emits
exact BIGINTs plus the q164-style floor-quantized (1e-6) error ratio;
q168 is pure BIGINT.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .corpus import _q
from .tables import load_table

# ---------------------------------------------------------------------------
# q166: exact fixed-point PageRank
# ---------------------------------------------------------------------------

_PR_N = 25                       # nation rows at every TPC-H SF
_PR_SCALE = 10 ** 12
_PR_R0 = _PR_SCALE // _PR_N
_PR_T = (15 * _PR_R0) // 100     # ((den-num) * (scale div n)) div den
_PR_ITERS = 5


def _pr_oracle_sql() -> str:
    head = f"""
    WITH n AS (SELECT n_nationkey AS k FROM nation),
    e AS (
      SELECT a.k AS s, b.k AS d
      FROM n a JOIN n b ON a.k <> b.k
      WHERE (a.k + b.k) % 3 <> 0 AND a.k <> 7),
    deg AS (SELECT s, COUNT(*) AS c FROM e GROUP BY 1),
    r0 AS (SELECT k AS node, CAST({_PR_R0} AS BIGINT) AS r FROM n)"""
    stages = []
    for i in range(1, _PR_ITERS + 1):
        p = f"r{i - 1}"
        stages.append(f""",
    sh{i} AS (SELECT p.node, p.r // dg.c AS sh
              FROM {p} p JOIN deg dg ON dg.s = p.node),
    in{i} AS (SELECT e.d AS node, SUM(sh.sh) AS f
              FROM e JOIN sh{i} sh ON sh.node = e.s GROUP BY 1),
    dm{i} AS (SELECT COALESCE(SUM(p.r), 0) AS m FROM {p} p
              LEFT JOIN deg ON deg.s = p.node WHERE deg.s IS NULL),
    r{i} AS (SELECT n.k AS node,
                    CAST({_PR_T}
                         + (85 * (dm.m // {_PR_N})) // 100
                         + (85 * COALESCE(i.f, 0)) // 100
                      AS BIGINT) AS r
             FROM n CROSS JOIN dm{i} dm
             LEFT JOIN in{i} i ON i.node = n.k)""")
    return (head + "".join(stages)
            + f"""
    SELECT CAST(node AS BIGINT) AS node, r AS rank_scaled
    FROM r{_PR_ITERS} ORDER BY node
    """)


@_q("q166_pagerank_exact",
    "PageRank as EXACT fixed-point integer arithmetic over the 25-node "
    "nation graph (directed edges where (s+d) % 3 != 0; node 7's "
    "out-edges dropped so the dangling-mass term is exercised): scale "
    f"10^12, damping 85/100, exactly {_PR_ITERS} rounds, every update "
    "in BIGINT floor division (r' = teleport + (85*(dangling div n)) "
    "div 100 + (85*sum(rank div outdeg)) div 100) — the q165 pattern "
    "extended to power iteration, making the pagerank/CC family's "
    "arithmetic driver-oracle-checkable.  The DuckDB oracle unrolls "
    "the five rounds as CTE stages (aggregation is illegal in a "
    "recursive term; a fixed budget needs no recursion).  q115 stays "
    "the float production face — operators.graph.pagerank_exact",
    _pr_oracle_sql())
def q166(spark, sf_dir):
    from ..operators.graph import pagerank_exact
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"))
    a = n.select(F.col("k").alias("s"))
    b = n.select(F.col("k").alias("d"))
    edges = (a.crossJoin(b)
             .where((F.col("s") != F.col("d"))
                    & ((F.col("s") + F.col("d")) % 3 != 0)
                    & (F.col("s") != 7)))
    out = pagerank_exact(edges, src="s", dst="d", n_iter=_PR_ITERS,
                         scale=_PR_SCALE)
    return (out.select(F.col("node").cast("bigint").alias("node"),
                       F.col("rank_scaled").cast("bigint")
                       .alias("rank_scaled"))
            .orderBy("node"))


# ---------------------------------------------------------------------------
# q167: FD discovery with the bounded-domain gate
# ---------------------------------------------------------------------------

_DISC_COLS = ["o_orderkey", "o_custkey", "o_orderstatus",
              "o_orderpriority", "o_orderdate"]
_DISC_GATE = 5000

_DISC_ONE = """
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
    WHERE (SELECT COUNT(DISTINCT {lhs}) FROM orders) <= {gate}
"""


@_q("q167_fd_discovery_gated",
    "functional-dependency DISCOVERY over orders: generate the level-1 "
    f"candidate lattice over {len(_DISC_COLS)} columns, drop every "
    "key-like lhs whose approx-distinct count exceeds "
    f"{_DISC_GATE} (o_orderkey is gated OUT at the driver's sf0.01 — "
    "the gate is part of the checked semantics; every cardinality "
    "sits >= 2x from the threshold so the +-2% HLL estimate cannot "
    "straddle it), then score ALL surviving candidates in ONE stack-"
    "melt scan (functions.fd_discover).  q164 profiles a hand-written "
    "list; this is the TANE/Metanome discovery workload.  The oracle "
    "replays the gate with exact COUNT(DISTINCT) guards and the "
    "K-scan UNION ALL the one-scan plan avoids at 100 TB",
    " UNION ALL ".join(
        _DISC_ONE.format(lhs=l, rhs=r, gate=_DISC_GATE)
        for l in _DISC_COLS for r in _DISC_COLS if r != l)
    + " ORDER BY lhs, rhs")
def q167(spark, sf_dir):
    from ..functions import fd_discover
    o = load_table(spark, sf_dir, "orders")
    # Oracle-soundness guard (round-10 advisor): the gate is approx on
    # the Spark side (HLL rsd=0.02) and EXACT in the DuckDB replay, so
    # parity needs every lhs cardinality to sit clear of the gate at
    # whatever SF the driver runs — RAISE inside the 30% straddle band
    # (a ±2%-rsd estimate 30% away from the gate cannot disagree with
    # the exact count about which side it is on).  Since round 12 the
    # check rides fd_discover's own gate aggregate (r11 verdict #7:
    # the separate 1-row agg this wrapper used to run cost an extra
    # job per query, q167 3.97→5.71 s at sf0.1).
    return (fd_discover(o, _DISC_COLS, max_lhs=1,
                        max_lhs_groups=_DISC_GATE, straddle_guard=1.3)
            .orderBy("lhs", "rhs"))


# ---------------------------------------------------------------------------
# q168: connected components, driver-oracled (the distributed star loop)
# ---------------------------------------------------------------------------

@_q("q168_connected_components",
    "connected components over a synthetic customer-derived graph "
    "built to keep components SMALL and bounded (every custkey links "
    "to its 8-block anchor c - c%8, and every 5th key also to its "
    "16-block anchor — 8-star components, some pairs merged through "
    "the shared 16-anchor, component size <= 16 by construction, so "
    "the DuckDB recursive-CTE closure stays O(16N) rows): "
    "operators.graph.star_components with local_graph_rows=0, PINNING "
    "the DISTRIBUTED alternating-star loop under the driver oracle — "
    "the union-find kernel is already hypothesis- and parity-pinned "
    "against it, so oracle-checking the loop checks both.  Self-loop "
    "anchors (c = its own 8-anchor) exercise the isolated-node "
    "contract; cluster = component min node id",
    """
    WITH RECURSIVE pts AS (SELECT c_custkey AS c FROM customer),
    e0 AS (
      SELECT c AS a, c - (c % 8) AS b FROM pts
      UNION ALL
      SELECT c, c - (c % 16) FROM pts WHERE c % 5 = 0),
    e AS (SELECT DISTINCT a, b FROM e0 WHERE a <> b),
    sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
    nodes AS (
      SELECT DISTINCT n FROM (
        SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)),
    reach(n, l) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT s.b, reach.l FROM reach JOIN sym s ON s.a = reach.n)
    SELECT CAST(n AS BIGINT) AS node,
           CAST(min(l) AS BIGINT) AS cluster
    FROM reach GROUP BY 1 ORDER BY 1
    """)
def q168(spark, sf_dir):
    from ..operators.graph import star_components
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("c"))
    e0 = (c.select(F.col("c").alias("a"),
                   (F.col("c") - F.col("c") % 8).alias("b"))
          .unionByName(
              c.where(F.col("c") % 5 == 0)
              .select(F.col("c").alias("a"),
                      (F.col("c") - F.col("c") % 16).alias("b"))))
    out = star_components(e0, "a", "b", local_graph_rows=0)
    return (out.select(F.col("node").cast("bigint").alias("node"),
                       F.col("cluster").cast("bigint").alias("cluster"))
            .orderBy("node"))
