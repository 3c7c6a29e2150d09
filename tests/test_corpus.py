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
    assert len(names) == len(set(names)) == 134
    window = set(names[:50])
    # round 4: never-driver-checked = q116-q130 (new in r03, outside r03's
    # window) plus the queries added this round (q135-q138).
    new_this_round = {
        "q135_setsim_prefix_join", "q136_twap", "q137_corpus_kl",
        "q138_recursive_rollup",
        "q116_copurchase_pairs", "q117_weighted_median",
        "q118_blocked_match", "q119_autocorr_daily", "q120_event_bigrams",
        "q121_pareto_frontier", "q122_partial_agg_merge",
        "q123_model_scoring", "q124_sketch_rollup", "q125_max_drawdown",
        "q126_ab_test", "q127_equidepth_histogram", "q128_triangle_count",
        "q129_sequence_pattern", "q130_first_touch_attribution",
    }
    # queries whose only green row is from round 1 (two rounds old).
    round1_only = {
        "q02_filter_project", "q03_time_range", "q04_conjunctive_slice",
        "q06_group_limiter", "q09_semi_join", "q10_anti_join",
        "q12_union_concat", "q13_distinct", "q19_axis_synthesis",
        "q21_trace_stats", "q29_fingerprint", "q30_midmean",
        "q32_roll_shift", "q33_cross_product", "q34_scalar_stats",
    }
    must_be_inside = new_this_round | round1_only
    assert must_be_inside <= window, must_be_inside - window
