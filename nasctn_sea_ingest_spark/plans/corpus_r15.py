"""Round-15 corpus extension: the last ExactSubstr face gets a
driver-oracle row (r14 verdict "Next round" #5), and the graph
family's node-level clustering face joins the shared witness graph.

- q180: SPAN DUPLICATION RATIO — ``operators.text.span_dup_ratio``
  composes q178's duplicate-span frame with a per-document token
  count into the RefinedWeb-style gate signal ("drop documents that
  are mostly duplicated text" instead of rewriting them — mid-
  document splices can be disfluent, so heavy offenders are better
  dropped whole).  Merged spans are disjoint by construction (the
  island break requires a > window gap), so summing their lengths is
  exact; the DuckDB oracle is q178's span CTE chain plus one
  length-sum CTE, LEFT-joined back to EVERY document (span-free docs
  read 0.0; the float ratio uses the corpus round(x, 6) parity
  convention).  As with q178, the oracle groups window STRINGS while
  Spark groups xxhash64 keys, so a hash-green row re-certifies
  collision-freedom on the checked data.

- q181: LOCAL CLUSTERING — ``operators.graph.local_triangles``
  (per-node exact triangle counts + Watts-Strogatz local clustering
  coefficient) over the SAME customer witness graph as q170's 2-core
  and q177's coreness, so three independent graph invariants are now
  pinned cross-engine on one shared graph.  The Spark plan is the
  degree-orientation wedge-close design (q128's scale story) with a
  per-corner 3-row explode for the node-level counts; the DuckDB
  oracle enumerates each triangle once as an ordered triple
  x < y < z via the canonical-edge 3-join.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .corpus import _q
from .corpus_r11 import kc_witness_edges
from .corpus_r14 import _CN_EDGES
from .tables import load_table

_DS_W = 12      # q178's window — the shared ExactSubstr geometry


@_q("q180_span_dup_ratio",
    "per-document duplication ratio from the ExactSubstr span frame "
    "(text.span_dup_ratio over text.duplicate_spans, window "
    f"{_DS_W}): dup_tokens = summed lengths of the doc's merged "
    "duplicate spans (disjoint by construction), n_tokens = "
    "whitespace token count (NULL text counts 0 — the removal "
    "stage's fully-dropped convention), dup_ratio = dup_tokens / "
    "max(n_tokens, 1) rounded to 6 places — the RefinedWeb-style "
    "drop-don't-rewrite gate signal, emitted for EVERY document so "
    "the gate composes as one filter.  Oracle = q178's window-string "
    "CTE chain + a length-sum, LEFT-joined to documents",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents WHERE text IS NOT NULL),
    win AS (
      SELECT doc_id, i, array_to_string(w[i:i+{_DS_W - 1}], ' ') AS s
      FROM toks, unnest(generate_series(1, len(w) - {_DS_W - 1})) AS g(i)
      WHERE len(w) >= {_DS_W}),
    dup AS (SELECT s FROM win GROUP BY s HAVING count(*) >= 2),
    f AS (SELECT win.doc_id, win.i FROM win JOIN dup USING (s)),
    b AS (
      SELECT doc_id, i,
             CASE WHEN i > coalesce(
                    max(i) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) + {_DS_W}, -1)
                  THEN 1 ELSE 0 END AS brk
      FROM f),
    g AS (SELECT doc_id, i,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS grp
          FROM b),
    sp AS (SELECT doc_id, grp, min(i) AS st,
                  max(i) + {_DS_W - 1} AS en
           FROM g GROUP BY 1, 2),
    per AS (SELECT doc_id, sum(en - st + 1) AS dup
            FROM sp GROUP BY 1),
    nt AS (SELECT doc_id,
                  CASE WHEN text IS NULL THEN 0
                       ELSE len(string_split_regex(trim(text),
                                                   '\\s+')) END AS n
           FROM documents)
    SELECT nt.doc_id,
           CAST(nt.n AS BIGINT) AS n_tokens,
           CAST(coalesce(per.dup, 0) AS BIGINT) AS dup_tokens,
           round(CAST(coalesce(per.dup, 0) AS DOUBLE)
                 / greatest(nt.n, 1), 6) AS dup_ratio
    FROM nt LEFT JOIN per USING (doc_id)
    ORDER BY nt.doc_id
    """)
def q180(spark, sf_dir):
    from ..operators.text import duplicate_spans, span_dup_ratio
    d = load_table(spark, sf_dir, "documents")
    sp = duplicate_spans(d, window=_DS_W, min_count=2)
    out = span_dup_ratio(d, sp)
    return (out.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("dup_tokens").cast("bigint").alias("dup_tokens"),
        F.round("dup_ratio", 6).alias("dup_ratio"))
        .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# q181: per-node triangle counts + local clustering coefficient
# ---------------------------------------------------------------------------

@_q("q181_local_clustering",
    "per-node EXACT triangle counts and local clustering coefficient "
    "(graph.local_triangles) over the q170/q177 customer witness "
    "graph — the node-level companion of q128's global triangle "
    "scalar, and the third driver row asserted on the SAME shared "
    "witness graph (k-core, coreness, now clustering).  Spark directs "
    "each edge from its lower-(degree, id) endpoint so wedge fan-out "
    "is O(sqrt(m)) per node on any degree distribution, finds each "
    "triangle once at its orientation apex, and charges it to all "
    "three corners via a 3-row explode + one hash aggregate; the "
    "DuckDB oracle enumerates ordered triples x < y < z by the "
    "textbook canonical-edge 3-join.  lcc = round(2t / (d(d-1)), 6) "
    "(0.0 below degree 2) — one double division on small exact "
    "integers, engine-identical IEEE; the witness plants one "
    "{b, b+4, b+8} triangle per 16-block so anchors, triangle "
    "members, and triangle-free leaves all appear",
    "WITH " + _CN_EDGES + """,
    canon AS (SELECT DISTINCT a, b FROM sym WHERE a < b),
    degs AS (SELECT a AS node, count(*) AS d FROM sym GROUP BY 1),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM canon e1
      JOIN canon e2 ON e2.a = e1.b
      JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b),
    corners AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri),
    tc AS (SELECT node, count(*) AS t FROM corners GROUP BY 1)
    SELECT CAST(degs.node AS BIGINT) AS node,
           CAST(degs.d AS INTEGER) AS degree,
           CAST(coalesce(tc.t, 0) AS BIGINT) AS triangles,
           round(CASE WHEN degs.d >= 2
                      THEN 2.0 * coalesce(tc.t, 0)
                           / (degs.d * (degs.d - 1))
                      ELSE 0.0 END, 6) AS lcc
    FROM degs LEFT JOIN tc ON tc.node = degs.node
    ORDER BY 1
    """)
def q181(spark, sf_dir):
    from ..operators.graph import local_triangles
    edges = kc_witness_edges(spark, sf_dir)
    out = local_triangles(edges)
    return (out.select(F.col("node").cast("bigint").alias("node"),
                       F.col("degree").cast("int").alias("degree"),
                       F.col("triangles").cast("bigint")
                       .alias("triangles"),
                       F.round("lcc", 6).alias("lcc"))
            .orderBy("node"))
