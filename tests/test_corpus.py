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
    """The driver oracle-checks the first 50 queries() entries.  Round 1 left
    q46-q77 outside the window; the rotated order must keep every
    previously-unverified query plus every query changed this round inside
    the first 50, and only round-1-green queries outside it."""
    names = [q.name for q in CORPUS]
    assert len(names) == len(set(names)) == 77
    window = set(names[:50])
    must_be_inside = {
        "q46_ann_lsh", "q47_ann_ivf", "q48_multimodal_features",
        "q50_grouping_sets", "q51_sessionize", "q52_unpivot",
        "q53_percentile_cont", "q54_batch_topk", "q55_hash_split",
        "q56_weighted_mixture", "q57_interval_join", "q58_pii_scrub",
        "q59_approx_aggs", "q60_sequence_pack", "q61_quantize_embeddings",
        "q62_scalar_subquery", "q63_correlated_scalar", "q64_in_having",
        "q65_shipping_priority", "q66_local_supplier_volume",
        "q70_late_shipment_priority", "q71_promo_revenue_share",
        "q72_sole_late_supplier", "q73_event_funnel", "q75_rolling_median",
        "q76_embedding_drift", "q77_ntile_nth",
        "q24_jaccard_neardup", "q11_asof_nearest", "q35_asof_backward",
    }
    assert must_be_inside <= window, must_be_inside - window
