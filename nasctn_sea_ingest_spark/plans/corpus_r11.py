"""Round-11 corpus extensions: the composite-lhs (level-2) FD lattice
and k-core peeling, each with a real driver-oracle row.

* q169 extends q167's gated FD discovery to ``max_lhs=2``: the
  level-2 lattice's composite lhs groups by ``to_json(struct(a, b))``
  and labels ``"a,b"`` — q167 pins the level-1 semantics cross-engine,
  q169 pins the COMPOSITE string-form contract (the round-10 verdict's
  open item: level 2 was pytest-only).  Three columns (o_orderstatus,
  o_orderpriority, o_custkey) give a 9-candidate lattice (6 singles +
  3 pairs); the gate at 1000 groups is measured to sit >= 1.5x from
  every candidate cardinality at sf0.001 / sf0.01 / sf0.1 (singles
  3 / 5 / 150..15k; pairs 15 / 436..65k), and the q167-style runtime
  guard RAISES if any HLL estimate ever lands inside the 30% straddle
  band, so the approx(Spark)/exact(DuckDB) gate replay cannot
  disagree.  The oracle pays one scan per surviving candidate (the
  K-scan UNION ALL); ``fd_discover`` pays two scans total — the plan
  this family exists to prove out at 100 TB.

* q170 gives the peeling family its exactness witness (the verdict's
  q168 trick transferred): a customer-derived graph whose 2-core peel
  terminates in <= 3 removal rounds BY CONSTRUCTION — leaves hang off
  4-anchors (depth-1 peel), bare 4-anchors then lose their only link
  (depth 2), the 0-block anchor drains last (depth 3), while each
  16-block's {b, b+4, b+8} TRIANGLE survives as the core.  Peeling is
  a monotone fixpoint, so unrolling MORE rounds than the depth is
  idempotent: the DuckDB oracle unrolls 4 peel rounds as CTE stages
  (each = degree hash-agg + both-endpoints semi-join, exactly the
  distributed round's shape) and ``operators.graph.k_core`` runs its
  normal early-terminating loop — both land on the identical fixpoint,
  (node, in-core degree).

Float parity per corpus.py rules: q169 emits exact BIGINTs plus the
floor-quantized (1e-6) error ratio; q170 is pure BIGINT.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .corpus import _q
from .tables import load_table

# ---------------------------------------------------------------------------
# q169: level-2 (composite-lhs) FD discovery
# ---------------------------------------------------------------------------

_L2_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey"]
_L2_GATE = 1000

# One oracle block per candidate; composite lhs lists both columns and
# replays the gate with the exact row-value COUNT(DISTINCT (a, b)).
_L2_ONE = """
    SELECT '{label}' AS lhs, '{rhs}' AS rhs, n_rows, n_groups,
           violations,
           floor(CAST(violations AS DOUBLE) / n_rows * 1000000)
             / 1000000.0 AS error
    FROM (
      SELECT CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n) - sum(m) AS BIGINT) AS violations
      FROM (
        SELECT {lhs_list}, max(c) AS m, sum(c) AS n
        FROM (SELECT {lhs_list}, {rhs}, count(*) AS c FROM orders
              GROUP BY {g_all})
        GROUP BY {g_lhs}))
    WHERE (SELECT COUNT(DISTINCT ({lhs_tuple})) FROM orders)
          <= {gate}
"""


def _l2_block(lhs_cols, rhs):
    lhs_cols = list(lhs_cols)
    return _L2_ONE.format(
        label=",".join(lhs_cols), rhs=rhs,
        lhs_list=", ".join(lhs_cols),
        lhs_tuple=", ".join(lhs_cols),
        g_all=", ".join(str(i + 1) for i in range(len(lhs_cols) + 1)),
        g_lhs=", ".join(str(i + 1) for i in range(len(lhs_cols))),
        gate=_L2_GATE)


def _l2_oracle_sql():
    blocks = [_l2_block([l], r)
              for l in _L2_COLS for r in _L2_COLS if r != l]
    n = len(_L2_COLS)
    for i in range(n):
        for j in range(i + 1, n):
            for r in _L2_COLS:
                if r not in (_L2_COLS[i], _L2_COLS[j]):
                    blocks.append(_l2_block([_L2_COLS[i], _L2_COLS[j]],
                                            r))
    return " UNION ALL ".join(blocks) + " ORDER BY lhs, rhs"


@_q("q169_fd_discovery_composite",
    "level-2 functional-dependency discovery over orders "
    f"({', '.join(_L2_COLS)}): the full max_lhs=2 lattice — 6 single "
    "and 3 composite-lhs candidates — gated at approx-distinct "
    f"{_L2_GATE} and scored in ONE stack-melt scan "
    "(functions.fd_discover).  Composite lhs groups by "
    "to_json(struct(a, b)) and is labeled 'a,b'; the oracle groups by "
    "the two columns natively (injective for these scalar types) and "
    "replays the gate with exact COUNT(DISTINCT (a, b)).  Measured "
    "cardinalities sit >= 1.5x from the gate at sf0.001-0.1 and the "
    "runtime guard raises inside the 30% straddle band, so the "
    "approx/exact replay cannot diverge — q167's soundness argument, "
    "now enforced, extended to composites",
    _l2_oracle_sql())
def q169(spark, sf_dir):
    from ..functions import fd_discover
    o = load_table(spark, sf_dir, "orders")
    # q167's straddle guard, extended to the composite lattice (singles
    # AND pair structs): RAISE rather than let the approx(Spark)/
    # exact(oracle) gate replay disagree at an unverified scale factor.
    # Since round 12 the check rides fd_discover's own gate aggregate
    # — zero extra actions (r11 verdict #7).
    return (fd_discover(o, _L2_COLS, max_lhs=2,
                        max_lhs_groups=_L2_GATE, straddle_guard=1.3)
            .orderBy("lhs", "rhs"))


# ---------------------------------------------------------------------------
# q170: k-core peeling, driver-oracled
# ---------------------------------------------------------------------------

_KC_ROUNDS = 4          # construction peels in <= 3; extra rounds no-op


def kc_witness_edges(spark, sf_dir):
    """The q170 witness graph as a DataFrame: leaves hang off their
    4-anchor, non-16 4-anchors link their 16-anchor, each 16-block
    carries the {b, b+4, b+8} triangle.  Bounded structure at every
    SF (local shape depends only on custkey mod patterns) — shared
    with q177's coreness decomposition so the k_core(k) == {core>=k}
    pin is asserted on the SAME graph cross-engine."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("c"))
    leaves = (c.where(F.col("c") % 4 != 0)
              .select(F.col("c").alias("d1"),
                      (F.col("c") - F.col("c") % 4).alias("d2")))
    mid = (c.where((F.col("c") % 4 == 0) & (F.col("c") % 16 != 0))
           .select(F.col("c").alias("d1"),
                   (F.col("c") - F.col("c") % 16).alias("d2")))
    tri_base = c.where(F.col("c") % 16 == 0)
    tri = (tri_base.select(F.col("c").alias("d1"),
                           (F.col("c") + 4).alias("d2"))
           .unionByName(tri_base.select(
               F.col("c").alias("d1"), (F.col("c") + 8).alias("d2")))
           .unionByName(tri_base.select(
               (F.col("c") + 4).alias("d1"),
               (F.col("c") + 8).alias("d2"))))
    return leaves.unionByName(mid).unionByName(tri)

_KC_EDGES = """
    pts AS (SELECT c_custkey AS c FROM customer),
    e0 AS (
      SELECT c AS a, c - (c % 4) AS b FROM pts WHERE c % 4 <> 0
      UNION ALL
      SELECT c, c - (c % 16) FROM pts WHERE c % 4 = 0 AND c % 16 <> 0
      UNION ALL
      SELECT c, c + 4 FROM pts WHERE c % 16 = 0
      UNION ALL
      SELECT c, c + 8 FROM pts WHERE c % 16 = 0
      UNION ALL
      SELECT c + 4, c + 8 FROM pts WHERE c % 16 = 0),
    sym0 AS (
      SELECT DISTINCT a, b FROM (
        SELECT a, b FROM e0 WHERE a <> b
        UNION ALL
        SELECT b, a FROM e0 WHERE a <> b))
"""


def _kc_oracle_sql():
    rounds = []
    prev = "sym0"
    for i in range(1, _KC_ROUNDS + 1):
        rounds.append(f"""
    keep{i} AS (
      SELECT a AS node FROM {prev} GROUP BY a
      HAVING count(*) >= 2),
    sym{i} AS (
      SELECT s.a, s.b FROM {prev} s
      JOIN keep{i} ka ON s.a = ka.node
      JOIN keep{i} kb ON s.b = kb.node)""")
        prev = f"sym{i}"
    return (
        "WITH " + _KC_EDGES + "," + ",".join(rounds) + f"""
    SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
    FROM {prev} GROUP BY a ORDER BY node""")


@_q("q170_k_core",
    "2-core of a customer-derived graph built so the peel terminates "
    "in <= 3 removal rounds BY CONSTRUCTION: leaves (c % 4 != 0) hang "
    "off their 4-anchor, non-16 4-anchors link their 16-anchor, and "
    "each 16-block carries the TRIANGLE {b, b+4, b+8} that survives "
    "as the core.  Round 1 peels the leaves, round 2 the bare b+12 "
    "anchors (and the 0-block's 4/8/12), round 3 drains node 0 — a "
    "monotone fixpoint, so the DuckDB oracle unrolls 4 idempotent "
    "peel rounds as CTE stages (degree hash-agg + both-endpoint "
    "semi-joins, the distributed round's exact shape) while "
    "operators.graph.k_core runs its normal early-terminating loop; "
    "both land on the identical (node, in-core degree) fixpoint — "
    "the peeling family's exactness witness (q165/q166/q168 pattern)",
    _kc_oracle_sql())
def q170(spark, sf_dir):
    from ..operators.graph import k_core
    edges = kc_witness_edges(spark, sf_dir)
    out = k_core(edges, 2, max_iter=8)
    return (out.select(F.col("node").cast("bigint").alias("node"),
                       F.col("degree").cast("bigint").alias("degree"))
            .orderBy("node"))
