"""Every declared corpus query must hash-match its DuckDB oracle (the same
check the driver runs at sf0.01; tests default to sf0.001 for speed)."""

import pytest

from nasctn_sea_ingest_spark.plans import CORPUS

from .oracle_compare import compare, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("q", [q for q in CORPUS if q.sql is not None],
                         ids=[q.name for q in CORPUS if q.sql is not None])
def test_oracle_match(q, spark, sf_dir, con):
    problems = compare(q.spark(spark, sf_dir), con, q.sql)
    assert not problems, f"{q.name}: " + "; ".join(problems)


@pytest.mark.parametrize("q", [q for q in CORPUS if q.sql is None],
                         ids=[q.name for q in CORPUS if q.sql is None])
def test_rows_only(q, spark, sf_dir):
    assert q.spark(spark, sf_dir).count() >= 0


def test_decimal_output_fails_locally(spark, sf_dir, con):
    """Regression for round-1 q24: a Decimal-typed Spark output column must
    fail the local mirror even when float-coerced values would match, because
    the driver's hash catches decimal-vs-double rounding that coercion hides."""
    from nasctn_sea_ingest_spark.plans.tables import register_tables
    register_tables(spark, sf_dir, ["documents"])
    # `1.0` parses as DECIMAL(2,1) in Spark -> decimal division (the bug shape)
    sdf = spark.sql(
        "SELECT doc_id, round(length(text) * 1.0 / 7, 6) AS ratio "
        "FROM documents LIMIT 10")
    problems = compare(
        sdf, con,
        "SELECT doc_id, round(length(text) * 1.0 / 7, 6) AS ratio "
        "FROM documents LIMIT 10")
    assert problems and "Decimal" in problems[0]


def test_driver_window_covers_unverified_families():
    """The driver oracle-checks the first 50 queries() entries.  The rotated
    order must keep every query with NO hard-signal row yet (new this
    round) plus every query whose only green row is two rounds old
    (round-1-only) inside the first 50 — so each oracle-backed query keeps
    a driver-green row at most two rounds old."""
    names = [q.name for q in CORPUS]
    assert len(names) == len(set(names)) == 130
    window = set(names[:50])
    new_this_round = {
        "q78_returned_item_report", "q79_nation_volume_shipping",
        "q80_market_share", "q81_order_count_distribution",
        "q82_stratified_sample", "q83_seeded_shuffle", "q84_bm25_retrieval",
        "q85_asof_by_key", "q86_pq_ann", "q87_bpe_pair_counts",
        "q88_chunk_dedup", "q89_zorder_cells", "q90_grouped_regression",
        "q91_repetition_filter", "q92_semantic_dedup",
        "q93_salted_skew_agg", "q94_exact_median_large",
        "q95_order_priority_check", "q96_forecast_revenue",
        "q97_top_revenue_supplier", "q98_disjunctive_predicate",
        "q99_global_sales_opportunity", "q100_product_type_profit",
        "q101_unigram_logprob", "q102_merge_upsert", "q103_histogram",
        "q104_winsorized_mean", "q105_chunk_overlap",
        "q106_balanced_sample", "q107_mad_outliers",
        "q108_cohort_retention", "q109_feature_hashing", "q110_ohlc_bars",
        "q111_forward_fill", "q112_constraint_audit",
        "q113_bigram_condprob", "q114_snapshot_diff", "q115_pagerank",
    }
    round1_only = {
        "q27_text_stats", "q28_lang_id",
        "q37_embedding_neardup",
        "q38_bin_aggregate", "q39_daily_rollup", "q40_set_ops", "q42_cube",
        "q43_range_frame", "q67_vocab_topk", "q68_label_centroids",
        "q69_tfidf_top_terms", "q74_decontaminate",
    }
    must_be_inside = new_this_round | round1_only
    assert must_be_inside <= window, must_be_inside - window
