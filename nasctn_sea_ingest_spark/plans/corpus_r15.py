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
from .corpus_r13 import _GRAPH_SQL
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


# ---------------------------------------------------------------------------
# q182: link-prediction scores (common neighbors / Jaccard / Adamic-Adar)
# q183: HITS hubs & authorities, exact fixed-point integer witness
# ---------------------------------------------------------------------------

def _hits_oracle_rounds(n_iter: int, scale: int) -> str:
    """Unroll hits_exact's max-rescaled integer half-rounds as CTE
    stages (the q166/q176 fixed-budget pattern).  Sums are cast back
    to BIGINT immediately (DuckDB widens sum(BIGINT) to HUGEINT) and
    `//` is DuckDB's integer floor division — the exact arithmetic
    Spark's `div` performs."""
    out = []
    prev_h = "h0"
    last_a = None
    for i in range(1, n_iter + 1):
        out.append(f""",
    ar{i} AS (SELECT e.dst AS node, CAST(sum({prev_h}.h) AS BIGINT) AS x
              FROM e JOIN {prev_h} ON {prev_h}.node = e.src GROUP BY 1),
    ad{i} AS (SELECT greatest(CAST(1 AS BIGINT),
                              coalesce(max(x), 0) // {scale}) AS dv
              FROM ar{i}),
    a{i} AS (SELECT n.node,
                    CAST(coalesce(ar{i}.x, 0) // ad{i}.dv AS BIGINT) AS a
             FROM nodes n LEFT JOIN ar{i} ON ar{i}.node = n.node
             CROSS JOIN ad{i}),
    hr{i} AS (SELECT e.src AS node, CAST(sum(a{i}.a) AS BIGINT) AS x
              FROM e JOIN a{i} ON a{i}.node = e.dst GROUP BY 1),
    hd{i} AS (SELECT greatest(CAST(1 AS BIGINT),
                              coalesce(max(x), 0) // {scale}) AS dv
              FROM hr{i}),
    h{i} AS (SELECT n.node,
                    CAST(coalesce(hr{i}.x, 0) // hd{i}.dv AS BIGINT) AS h
             FROM nodes n LEFT JOIN hr{i} ON hr{i}.node = n.node
             CROSS JOIN hd{i})""")
        prev_h = f"h{i}"
        last_a = f"a{i}"
    return "".join(out), prev_h, last_a


_HITS_ROUNDS = 3
_HITS_SCALE = 10 ** 6
_HITS_CTES, _HITS_H, _HITS_A = _hits_oracle_rounds(_HITS_ROUNDS,
                                                   _HITS_SCALE)


@_q("q182_link_prediction",
    "link-prediction scores over the support>=2 co-purchase graph "
    "(graph.link_scores): for every unordered part pair with at "
    "least one common co-purchase neighbor — common-neighbor count, "
    "endpoint degrees, Jaccard overlap, Adamic-Adar (sum of "
    "1/ln(deg) over shared neighbors; a center borders both "
    "endpoints so deg >= 2), and whether the pair is itself an edge "
    "(kept as a 0/1 flag so the same frame serves missing-link "
    "prediction AND edge-embeddedness curation on near-dup graphs).  "
    "Spark pairs neighbors through the center-keyed wedge join (no "
    "neighbor-list materialization; the center's degree rides the "
    "wedge row) into ONE hash aggregate; the DuckDB oracle is the "
    "same wedge join spelled relationally.  Floats round(6) per the "
    "corpus parity convention",
    "WITH " + _GRAPH_SQL + """,
    deg AS (SELECT u AS c, count(*) AS d FROM e GROUP BY 1),
    w AS (SELECT a.v AS uu, b.v AS vv, deg.d
          FROM e a JOIN e b ON a.u = b.u AND a.v < b.v
          JOIN deg ON deg.c = a.u),
    s AS (SELECT uu AS u, vv AS v, CAST(count(*) AS BIGINT) AS cn,
                 sum(1.0 / ln(d)) AS aa
          FROM w GROUP BY 1, 2),
    adj AS (SELECT u, v, 1 AS adjacent FROM e0)
    SELECT CAST(s.u AS BIGINT) AS u, CAST(s.v AS BIGINT) AS v,
           s.cn AS cn,
           CAST(du.d AS BIGINT) AS du, CAST(dv.d AS BIGINT) AS dv,
           round(CAST(s.cn AS DOUBLE) / (du.d + dv.d - s.cn), 6)
             AS jaccard,
           round(s.aa, 6) AS adamic_adar,
           CAST(coalesce(adj.adjacent, 0) AS INTEGER) AS adjacent
    FROM s JOIN deg du ON du.c = s.u
           JOIN deg dv ON dv.c = s.v
           LEFT JOIN adj ON adj.u = s.u AND adj.v = s.v
    ORDER BY 1, 2
    """)
def q182(spark, sf_dir):
    from ..operators.graph import link_scores
    from .corpus_r13 import _copurchase_edges
    e = _copurchase_edges(spark, sf_dir)
    out = link_scores(e, "u", "v")
    return (out.select(
        F.col("u").cast("bigint").alias("u"),
        F.col("v").cast("bigint").alias("v"),
        F.col("cn").alias("cn"), F.col("du").alias("du"),
        F.col("dv").alias("dv"),
        F.round("jaccard", 6).alias("jaccard"),
        F.round("adamic_adar", 6).alias("adamic_adar"),
        F.col("adjacent").cast("int").alias("adjacent"))
        .orderBy("u", "v"))


@_q("q183_hits_influence",
    "HITS hubs & authorities over the 1-hour temporal influence "
    "graph (graph.temporal_edges |> graph.hits_exact): "
    f"{_HITS_ROUNDS} exact fixed-point rounds — the pagerank_exact "
    "BIGINT discipline extended to the mutually-recursive pair, with "
    "each half-round floor-divided by its global max over "
    f"{_HITS_SCALE} in place of the L2 norm (sqrt is not engine-"
    "exact; a shared monotone integer rescale preserves the rank "
    "order HITS exists to produce and bounds every intermediate "
    "BIGINT-safe on any graph).  Influencers whose actions many "
    "users follow score authority; users who follow many "
    "high-authority actors score hub.  The DuckDB oracle unrolls "
    "the half-rounds as CTE stages over the identical edge CTE — "
    "pure integer arithmetic, so the row hash certifies exactness, "
    "not closeness",
    f"""
    WITH ev AS (
      SELECT user_id AS u,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
             epoch_us(ts) AS t
      FROM events
      WHERE user_id IS NOT NULL AND props IS NOT NULL),
    e AS (
      SELECT DISTINCT a.u AS src, b.u AS dst
      FROM ev a JOIN ev b
        ON a.k = b.k AND b.t > a.t AND b.t <= a.t + {{w_us}}
       AND a.u != b.u),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    h0 AS (SELECT node, CAST({_HITS_SCALE} AS BIGINT) AS h
           FROM nodes){_HITS_CTES}
    SELECT CAST({_HITS_H}.node AS BIGINT) AS node,
           {_HITS_H}.h AS hub_scaled,
           {_HITS_A}.a AS auth_scaled
    FROM {_HITS_H} JOIN {_HITS_A}
      ON {_HITS_A}.node = {_HITS_H}.node
    ORDER BY 1
    """.replace("{w_us}", "3600000000"))
def q183(spark, sf_dir):
    from ..operators.graph import hits_exact, temporal_edges
    from .tables import load_table
    ev = (load_table(spark, sf_dir, "events")
          .where(F.col("user_id").isNotNull()
                 & F.col("props").isNotNull())
          .select(F.col("user_id").alias("u"),
                  F.get_json_object("props", "$.k").cast("int")
                  .alias("k"),
                  F.col("ts_us").alias("t")))
    e = temporal_edges(ev, 3_600_000_000, key="k", id_col="u",
                       ts="t").select("src", "dst")
    out = hits_exact(e, n_iter=_HITS_ROUNDS, scale=_HITS_SCALE)
    return (out.select(F.col("node").cast("bigint").alias("node"),
                       "hub_scaled", "auth_scaled")
            .orderBy("node"))


# ---------------------------------------------------------------------------
# q184: betweenness centrality on a tree witness with an ANALYTIC oracle
# ---------------------------------------------------------------------------
# Witness: one identical 16-node TREE per complete customer-key block
# (base B = 16k with all of B..B+15 present): a path over positions
# 0..7, a bridge 7-8, and a star hub at 8 with leaves 9..15.  Trees
# make Brandes exact in doubles (sigma = 1 everywhere, dependencies
# are integer subtree counts; halving is exact), so the float column
# is hash-stable cross-engine.  The oracle never runs Brandes: on a
# tree, bc(v) = ((n-1)^2 - sum of c_i^2) / 2 where c_i are the
# component sizes left by deleting v — a closed-form pair count, a
# genuinely INDEPENDENT computational route from the distributed
# BFS + dependency accumulation it certifies.  Per-position sizes for
# this shape give (0, 14, 26, 36, 44, 50, 54, 56, 77, 0 x 7).

_BT_EDGE_POS = ([(i, i + 1) for i in range(8)]        # path 0..7 + bridge 7-8
                + [(8, i) for i in range(9, 16)])     # star hub 8


@_q("q184_betweenness_tree",
    "EXACT betweenness centrality (graph.betweenness — level-"
    "synchronous multi-source Brandes: forward BFS carrying "
    "shortest-path counts, backward dependency accumulation, every "
    "node a source) over a forest witness: one identical 16-node "
    "tree per complete customer-key block (path 0-7, bridge 7-8, "
    "star hub 8 with leaves 9-15).  On trees sigma=1 everywhere, so "
    "every dependency is an exact small-integer double and the "
    "float column hash-matches cross-engine.  The oracle is "
    "ANALYTIC, not algorithmic: tree betweenness = ((n-1)^2 - sum "
    "c_i^2)/2 over the component sizes deleting the node leaves — "
    "positions map to the constants (0,14,26,36,44,50,54,56,77,0*7) "
    "— so two genuinely independent computational routes must agree "
    "on every node",
    """
    WITH blk AS (
      SELECT c_custkey - (c_custkey % 16) AS b
      FROM customer
      GROUP BY 1 HAVING count(*) = 16),
    pos AS (
      SELECT b, p FROM blk, unnest(generate_series(0, 15)) AS g(p)),
    bcv AS (
      SELECT p, CASE
        WHEN p = 0 OR p >= 9 THEN 0.0
        WHEN p <= 7 THEN (225 - p*p - (15-p)*(15-p)) / 2.0
        ELSE 77.0 END AS bc
      FROM (SELECT DISTINCT p FROM pos))
    SELECT CAST(pos.b + pos.p AS BIGINT) AS node,
           round(bcv.bc, 6) AS betweenness
    FROM pos JOIN bcv USING (p)
    ORDER BY 1
    """)
def q184(spark, sf_dir):
    from ..operators.graph import betweenness
    c = (load_table(spark, sf_dir, "customer")
         .select(F.col("c_custkey").alias("c")))
    blocks = (c.groupBy((F.col("c") - F.col("c") % 16).alias("b"))
              .agg(F.count("*").alias("n"))
              .where(F.col("n") == 16)
              .select("b"))
    pe = spark.createDataFrame(_BT_EDGE_POS, "p1 int, p2 int")
    edges = (blocks.crossJoin(F.broadcast(pe))
             .select((F.col("b") + F.col("p1")).alias("d1"),
                     (F.col("b") + F.col("p2")).alias("d2")))
    out = betweenness(edges)
    return (out.select(F.col("node").cast("bigint").alias("node"),
                       F.round("betweenness", 6).alias("betweenness"))
            .orderBy("node"))
