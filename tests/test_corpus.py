"""Every declared corpus query must hash-match its DuckDB oracle (the same
check the driver runs at sf0.01; tests default to sf0.001 for speed)."""

import pytest

from nasctn_sea_ingest_spark.plans import CORPUS, RETIRED

from .oracle_compare import compare, duck_con

# Retired queries left the driver corpus (round-6 saturation policy,
# plans/__init__.py) but keep their hard signal HERE: the same DuckDB
# oracle check the driver runs, every CI run, at sf0.001.
ALL = CORPUS + RETIRED


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("q", [q for q in ALL if q.sql is not None],
                         ids=[q.name for q in ALL if q.sql is not None])
def test_oracle_match(q, spark, sf_dir, con):
    problems = compare(q.spark(spark, sf_dir), con, q.sql)
    assert not problems, f"{q.name}: " + "; ".join(problems)


@pytest.mark.parametrize("q", [q for q in ALL if q.sql is None],
                         ids=[q.name for q in ALL if q.sql is None])
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
    """The driver oracle-checks the first 50 queries() entries.  Since round
    5 the window is derived from the committed CORRECTNESS_r0*.json files
    (oldest-green-first); this asserts the staleness invariant generically:
    every query with NO driver row yet (new this round), every RECHECK
    rewrite, and every query whose latest row is >= 2 rounds old must sit
    inside the first 50, so no oracle-backed query's newest green row ever
    goes three rounds stale and no rewrite waits out the rotation."""
    from nasctn_sea_ingest_spark.plans import (
        RECHECK, RETIRED_NAMES, _latest_driver_round)

    names = [q.name for q in CORPUS]
    assert len(names) == len(set(names))
    window = set(names[:50])
    latest = _latest_driver_round()
    assert latest, "no CORRECTNESS_r*.json found at repo root"
    max_round = max(latest.values())
    must_be_inside = {
        n for n in names
        if latest.get(n, -1) == -1 or latest[n] <= max_round - 2
        or n in RECHECK
    }
    # The invariant only holds if the stale set fits the 50-slot window —
    # assert that explicitly so over-registration in one round fails CI.
    assert len(must_be_inside) <= 50, (
        f"{len(must_be_inside)} stale/new/recheck queries exceed the "
        "50-slot window")
    assert must_be_inside <= window, must_be_inside - window
    # And no fresh query may displace a staler one out of the window
    # (RECHECK rewrites are the sanctioned exception: they jump the queue
    # precisely because their fresh row no longer describes their plan).
    worst_inside = max(latest.get(n, -1) for n in window - RECHECK)
    best_outside = min(latest.get(n, -1) for n in names[50:])
    assert worst_inside <= best_outside, (worst_inside, best_outside)
    # RECHECK hygiene: entries must name live corpus queries.
    assert RECHECK <= set(names), RECHECK - set(names)
    assert not (RECHECK & RETIRED_NAMES)
