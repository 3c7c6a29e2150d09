"""Corpus-wide physical-plan lint: every declared query's executed plan is
scanned for scale anti-patterns. Occurrences are ALLOWLISTED with a
justification — each one is a tiny-by-construction shape — so any NEW
cartesian / nested-loop / single-partition exchange / row-wise Python
stage appearing anywhere in the query corpus (every CORPUS entry) fails this test, not a
production run at 1000× the data.

(The per-query contracts in test_plan_contracts.py pin what GOOD plans
must contain; this lint pins what NO plan may silently grow.)
"""

import pytest

from nasctn_sea_ingest_spark.plans import CORPUS, RETIRED

# retired queries stay linted: their plan shapes remain library
# surface even without a driver-window slot
ALL = CORPUS + RETIRED

# (query, flag) -> why it's fine. Flags: cartesian = CartesianProduct,
# bnlj = BroadcastNestedLoopJoin, single = Exchange SinglePartition.
ALLOW = {
    # scalar/one-row broadcast shapes: the non-equi "join" has a 1-row side
    ("q06_group_limiter", "bnlj"): "min-group-size scalar broadcast",
    ("q06_group_limiter", "single"): "min-group-size scalar aggregate",
    ("q22_cosine_topk", "bnlj"): "1-row query-vector broadcast",
    ("q33_cross_product", "bnlj"): "J2 IS the cartesian key product (tiny dims)",
    ("q34_scalar_stats", "single"): "global scalar reduction (output=1 row)",
    ("q62_scalar_subquery", "bnlj"): "scalar subquery broadcast",
    ("q62_scalar_subquery", "single"): "scalar subquery aggregate",
    ("q71_promo_revenue_share", "single"): "global ratio reduction",
    ("q84_bm25_retrieval", "bnlj"): "corpus-size scalar broadcast",
    ("q84_bm25_retrieval", "single"): "corpus-size scalar aggregate",
    ("q89_zorder_cells", "bnlj"): "domain min/max scalar broadcast",
    ("q89_zorder_cells", "single"): "domain min/max scalar aggregate",
    ("q69_tfidf_top_terms", "bnlj"): "doc-count scalar broadcast",
    ("q69_tfidf_top_terms", "single"): "doc-count scalar aggregate",
    ("q96_forecast_revenue", "single"): "yearly series regression (rows=years)",
    ("q97_top_revenue_supplier", "single"): "max-over-rollup scalar",
    ("q98_disjunctive_predicate", "single"): "global count reduction",
    ("q101_unigram_logprob", "bnlj"): "LM total-tokens scalar broadcast",
    ("q101_unigram_logprob", "single"): "LM total-tokens scalar aggregate",
    ("q103_histogram", "bnlj"): "per-type min/max stats broadcast",
    ("q103_histogram", "single"): "stats frame is O(types)",
    ("q112_constraint_audit", "single"): "audit report is O(rules)",
    ("q83_seeded_shuffle", "single"): "slice-boundary summary (<= slices rows)",
    ("q11_asof_nearest", "bnlj"): "slice-boundary summary broadcast",
    ("q11_asof_nearest", "single"): "boundary summary (<= slices rows)",
    ("q35_asof_backward", "bnlj"): "slice-boundary summary broadcast",
    ("q35_asof_backward", "single"): "boundary summary (<= slices rows)",
    ("q136_twap", "bnlj"): "keyed_lead slice-bounds 1-row broadcast",
    ("q136_twap", "single"): "bounds sketch scalar aggregate",
    ("q121_pareto_frontier", "single"): "sweep over per-price pre-aggregate",
    ("q126_ab_test", "single"): "2-row arm pivot reduction",
    ("q128_triangle_count", "bnlj"): "1-row x 1-row stats join",
    ("q128_triangle_count", "single"): "1-row count reductions",
    ("q137_corpus_kl", "bnlj"): "corpus-totals (na/nb/V) 1-row broadcast",
    ("q137_corpus_kl", "single"): "corpus-totals scalar aggregate",
    ("q142_token_label_mi", "bnlj"): "corpus-totals (N/N_en) 1-row broadcast",
    ("q142_token_label_mi", "single"): "corpus-totals scalar aggregate + "
                                       "global top-20 TakeOrdered",
    ("q155_peak_concurrency", "bnlj"): "keyed_cumsum slice-bounds 1-row "
                                       "broadcast",
    ("q155_peak_concurrency", "single"): "slice-bounds scalar "
                                         "approx_percentile aggregate",
    ("q158_interval_coverage", "bnlj"): "keyed_cummax/keyed_cumsum "
                                        "slice-bounds 1-row broadcasts",
    ("q158_interval_coverage", "single"): "slice-bounds scalar "
                                          "approx_percentile aggregates",
    ("q159_chi_squared", "bnlj"): "marginal-grid crossJoins: 1-row N and "
                                  "<=5-row status frames, broadcast",
    ("q159_chi_squared", "single"): "N / chi2 scalar aggregates "
                                    "(input <= 15 cells)",
    ("q164_fd_discovery", "single"): "per-FD 1-row g3 reduce (input = "
                                     "partial rows, output = 1 row per "
                                     "candidate)",
}


@pytest.mark.parametrize("q", ALL, ids=[q.name for q in ALL])
def test_no_new_plan_antipatterns(q, spark, sf_dir):
    df = q.spark(spark, sf_dir)
    df.collect()
    p = (df._jdf.queryExecution().executedPlan().toString()
         .split("== Initial Plan ==")[0])
    flags = set()
    if "CartesianProduct" in p:
        flags.add("cartesian")
    if "BroadcastNestedLoopJoin" in p:
        flags.add("bnlj")
    if "Exchange SinglePartition" in p:
        flags.add("single")
    # row-at-a-time Python is never acceptable in the corpus (Arrow-batched
    # mapInPandas shows as MapInPandas / ArrowEvalPython, not BatchEvalPython)
    assert "BatchEvalPython" not in p, q.name
    unexplained = {f for f in flags if (q.name, f) not in ALLOW}
    assert not unexplained, (q.name, unexplained)
