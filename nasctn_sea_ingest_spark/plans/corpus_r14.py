"""Round-14 corpus extension: driver-oracle rows for the last two
iterative graph operators that carried only pytest oracles (r13
verdict "Next round" #2/#3).

- q176: PERSONALIZED PAGERANK — ``operators.graph.
  personalized_pagerank_exact``: the q166 exact fixed-point pattern
  (BIGINT floor-division update, fixed 5-round budget) extended with
  the two PPR-specific terms — teleport mass AND dangling mass return
  only to the seed set.  Same 25-node nation witness graph as q166
  (directed edges where (s+d) % 3 != 0, node 7's out-edges dropped so
  the dangling term is exercised), seeds {0, 5, 11}.  The DuckDB
  oracle unrolls the five rounds as CTE stages with a LEFT JOIN
  against the seed VALUES list gating the teleport/dangling terms.
  ``personalized_pagerank`` (float) stays the production face.

- q177: FULL CORENESS DECOMPOSITION — ``operators.graph.
  core_numbers`` (the Lu et al. 2016 h-operator iteration) over the
  SAME customer witness graph as q170's 2-core (plans.corpus_r11.
  kc_witness_edges), so the ``k_core(k) == {core >= k}`` pin is
  asserted cross-engine on one graph (pytest compares q177's core>=2
  node set to q170's rows).  The h-operator is a monotone
  non-increasing fixpoint, so the q170 unroll trick applies: the
  witness graph stabilizes in <= 3 value-changing rounds BY
  CONSTRUCTION (leaves start at their fixpoint, anchors drop to
  their coreness in one h step, the block anchor needs a second once
  its neighbors drop), and the oracle unrolls 5 idempotent h rounds
  as CTE stages — per round one neighbor-value join, a (node, value)
  count, a per-node descending running sum, and max(least(v, cum)) —
  exactly the distributed round's shape.  Spark runs the library's
  early-terminating loop; both land on the identical fixpoint.

Outputs are pure BIGINT/INT per corpus.py float-parity rules.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .corpus import _q
from .corpus_r11 import kc_witness_edges
from .tables import load_table

# ---------------------------------------------------------------------------
# q176: exact fixed-point personalized PageRank
# ---------------------------------------------------------------------------

_PPR_SEEDS = (0, 5, 11)
_PPR_NS = len(_PPR_SEEDS)
_PPR_SCALE = 10 ** 12
_PPR_TP = _PPR_SCALE // _PPR_NS
_PPR_TEL = (15 * _PPR_TP) // 100    # ((den-num) * (scale div n_s)) div den
_PPR_ITERS = 5


def _ppr_oracle_sql() -> str:
    seed_vals = ", ".join(f"({s})" for s in _PPR_SEEDS)
    head = f"""
    WITH n AS (SELECT n_nationkey AS k FROM nation),
    e AS (
      SELECT a.k AS s, b.k AS d
      FROM n a JOIN n b ON a.k <> b.k
      WHERE (a.k + b.k) % 3 <> 0 AND a.k <> 7),
    deg AS (SELECT s, COUNT(*) AS c FROM e GROUP BY 1),
    sd AS (SELECT * FROM (VALUES {seed_vals}) AS t(k)),
    r0 AS (SELECT n.k AS node,
                  CAST(CASE WHEN sd.k IS NULL THEN 0
                            ELSE {_PPR_TP} END AS BIGINT) AS r
           FROM n LEFT JOIN sd ON sd.k = n.k)"""
    stages = []
    for i in range(1, _PPR_ITERS + 1):
        p = f"r{i - 1}"
        stages.append(f""",
    sh{i} AS (SELECT p.node, p.r // dg.c AS sh
              FROM {p} p JOIN deg dg ON dg.s = p.node),
    in{i} AS (SELECT e.d AS node, SUM(sh.sh) AS f
              FROM e JOIN sh{i} sh ON sh.node = e.s GROUP BY 1),
    dm{i} AS (SELECT COALESCE(SUM(p.r), 0) AS m FROM {p} p
              LEFT JOIN deg ON deg.s = p.node WHERE deg.s IS NULL),
    r{i} AS (SELECT n.k AS node,
                    CAST(CASE WHEN sd.k IS NULL THEN 0
                         ELSE {_PPR_TEL}
                              + (85 * (dm.m // {_PPR_NS})) // 100 END
                         + (85 * COALESCE(i.f, 0)) // 100
                      AS BIGINT) AS r
             FROM n CROSS JOIN dm{i} dm
             LEFT JOIN in{i} i ON i.node = n.k
             LEFT JOIN sd ON sd.k = n.k)""")
    return (head + "".join(stages)
            + f"""
    SELECT CAST(node AS BIGINT) AS node, r AS rank_scaled
    FROM r{_PPR_ITERS} ORDER BY node
    """)


@_q("q176_personalized_pagerank_exact",
    "personalized PageRank as EXACT fixed-point integer arithmetic "
    "over the q166 nation witness graph (directed (s+d) % 3 != 0 "
    f"edges, node 7 dangling), seeds {_PPR_SEEDS}: teleport AND "
    "dangling mass return only to the seeds (uniformly, scale "
    f"10^12 div {_PPR_NS} each), damping 85/100, exactly "
    f"{_PPR_ITERS} rounds, every update in BIGINT floor division "
    "(r' = [seed]*(teleport + (85*(D div n_s)) div 100) + "
    "(85*sum(rank div outdeg)) div 100).  The DuckDB oracle unrolls "
    "the rounds as CTE stages with the seed VALUES list gating the "
    "seed-only terms — the q166 pattern completing the seeded-"
    "retrieval family's exactness coverage; the float "
    "operators.graph.personalized_pagerank stays the production face",
    _ppr_oracle_sql())
def q176(spark, sf_dir):
    from ..operators.graph import personalized_pagerank_exact
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"))
    a = n.select(F.col("k").alias("s"))
    b = n.select(F.col("k").alias("d"))
    edges = (a.crossJoin(b)
             .where((F.col("s") != F.col("d"))
                    & ((F.col("s") + F.col("d")) % 3 != 0)
                    & (F.col("s") != 7)))
    out = personalized_pagerank_exact(
        edges, list(_PPR_SEEDS), src="s", dst="d",
        n_iter=_PPR_ITERS, scale=_PPR_SCALE)
    return (out.select(F.col("node").cast("bigint").alias("node"),
                       F.col("rank_scaled").cast("bigint")
                       .alias("rank_scaled"))
            .orderBy("node"))


# ---------------------------------------------------------------------------
# q177: full coreness decomposition, driver-oracled
# ---------------------------------------------------------------------------

_CN_ROUNDS = 5          # witness stabilizes in <= 3; extra rounds no-op

_CN_EDGES = """
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
    sym AS (
      SELECT DISTINCT a, b FROM (
        SELECT a, b FROM e0 WHERE a <> b
        UNION ALL
        SELECT b, a FROM e0 WHERE a <> b))
"""


def _cn_oracle_sql() -> str:
    rounds = []
    prev = "v0"
    for i in range(1, _CN_ROUNDS + 1):
        rounds.append(f""",
    h{i} AS (
      SELECT node, MAX(LEAST(cn, cum)) AS h FROM (
        SELECT a AS node, cn,
               CAST(SUM(m) OVER (PARTITION BY a ORDER BY cn DESC)
                    AS INTEGER) AS cum
        FROM (SELECT s.a, v.c AS cn, COUNT(*) AS m
              FROM sym s JOIN {prev} v ON v.node = s.b
              GROUP BY 1, 2))
      GROUP BY 1),
    v{i} AS (SELECT v.node, LEAST(v.c, h{i}.h) AS c
             FROM {prev} v JOIN h{i} ON h{i}.node = v.node)""")
        prev = f"v{i}"
    return (
        "WITH " + _CN_EDGES + """,
    v0 AS (SELECT a AS node, CAST(COUNT(*) AS INTEGER) AS c
           FROM sym GROUP BY 1)"""
        + "".join(rounds) + f"""
    SELECT CAST(node AS BIGINT) AS node, CAST(c AS INTEGER) AS core
    FROM {prev} ORDER BY node""")


@_q("q177_core_numbers",
    "full CORENESS decomposition (node -> largest k it survives "
    "into the k-core) of q170's customer witness graph via the "
    "h-operator iteration (Lu et al. 2016): every node starts at its "
    "degree and repeatedly takes the h-index of its neighbors' "
    "values — a monotone non-increasing fixpoint the witness reaches "
    "in <= 3 value-changing rounds BY CONSTRUCTION (leaves start at "
    "their coreness, anchors drop in one h step, block anchors need "
    f"a second once neighbors drop), so the oracle unrolls "
    f"{_CN_ROUNDS} idempotent h rounds as CTE stages (neighbor-value "
    "join, (node, value) count, per-node descending running sum, "
    "max(least(v, cum)) — the distributed round's exact shape) while "
    "operators.graph.core_numbers runs its early-terminating loop; "
    "identical fixpoint, and k_core(2) == {core >= 2} is pinned "
    "cross-engine on the shared graph (pytest)",
    _cn_oracle_sql())
def q177(spark, sf_dir):
    from ..operators.graph import core_numbers
    edges = kc_witness_edges(spark, sf_dir)
    out = core_numbers(edges, max_rounds=50)
    return (out.select(F.col("node").cast("bigint").alias("node"),
                       F.col("core").cast("int").alias("core"))
            .orderBy("node"))


# ---------------------------------------------------------------------------
# q178: exact duplicate-span detection (Lee et al. 2022 ExactSubstr)
# ---------------------------------------------------------------------------

_DS_W = 12


@_q("q178_duplicate_spans",
    "exact duplicate-SPAN detection over documents (Lee et al. 2022 "
    f"ExactSubstr): every {_DS_W}-word window at STRIDE 1 occurring "
    ">= 2 times anywhere in the corpus is flagged and merged into "
    "maximal per-doc spans (text.duplicate_spans); output = per-doc "
    "span count, flagged-window count, and duplicated-token estimate "
    "— the removal-ready exact-substring pass document-level MinHash "
    "and chunk-aligned CDC both miss for verbatim boilerplate inside "
    "otherwise-distinct documents.  The Spark plan groups xxhash64 "
    "window keys (8 bytes on the wire, map-side-combinable count); "
    "the DuckDB oracle groups the window STRINGS, so a hash-green "
    "row also certifies collision-freedom on the checked data",
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
                  max(i) + {_DS_W - 1} AS en, count(*) AS nw
           FROM g GROUP BY 1, 2)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(nw) AS BIGINT) AS n_dup_windows,
           CAST(sum(en - st + 1) AS BIGINT) AS dup_tokens
    FROM sp GROUP BY 1 ORDER BY 1
    """)
def q178(spark, sf_dir):
    from ..operators.text import duplicate_spans
    d = load_table(spark, sf_dir, "documents")
    sp = duplicate_spans(d, window=_DS_W, min_count=2)
    return (sp.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_spans"),
                 F.sum("n_windows").cast("bigint")
                 .alias("n_dup_windows"),
                 F.sum(F.col("end_word") - F.col("start_word") + 1)
                 .cast("bigint").alias("dup_tokens"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# q179: ExactSubstr REMOVAL — the rewritten documents, driver-oracled
# ---------------------------------------------------------------------------


@_q("q179_span_removal",
    "the ExactSubstr REMOVAL stage driver-oracled (q178 flags, this "
    "rewrites): for every document carrying at least one duplicated "
    f"{_DS_W}-word span, emit the document with ALL span occurrences "
    "removed (text.apply_span_removal — the Lee et al. all-copies "
    "rule; surviving words single-space joined; a fully-span doc "
    "comes back empty).  Merged spans are provably disjoint (the "
    "island break needs a > window gap), so the oracle rebuilds each "
    "text by anti-joining word positions against the span ranges and "
    "re-aggregating in position order — the whole flag+rewrite pass "
    "is now hash-checked end to end, not just the span coordinates",
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
    pos AS (
      SELECT t.doc_id, gg.i, t.w[gg.i] AS tok
      FROM toks t, unnest(generate_series(1, len(t.w))) AS gg(i)
      WHERE t.doc_id IN (SELECT DISTINCT doc_id FROM sp)),
    kept AS (
      SELECT p.doc_id, p.i, p.tok FROM pos p
      WHERE NOT EXISTS (SELECT 1 FROM sp
                        WHERE sp.doc_id = p.doc_id
                          AND p.i BETWEEN sp.st AND sp.en)),
    rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS t
      FROM kept GROUP BY doc_id)
    SELECT d.doc_id, coalesce(r.t, '') AS new_text
    FROM (SELECT DISTINCT doc_id FROM sp) d
    LEFT JOIN rebuilt r USING (doc_id)
    ORDER BY d.doc_id
    """)
def q179(spark, sf_dir):
    from ..operators.text import apply_span_removal, duplicate_spans
    d = load_table(spark, sf_dir, "documents")
    sp = duplicate_spans(d, window=_DS_W, min_count=2)
    rew = apply_span_removal(d, sp)
    return (rew.join(sp.select("doc_id").distinct(), "doc_id", "semi")
            .select(F.col("doc_id"),
                    F.coalesce(F.col("text"), F.lit(""))
                    .alias("new_text"))
            .orderBy("doc_id"))
