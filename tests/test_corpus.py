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
    rewrite, and every query whose latest row is >= 2 ELAPSED DRIVER RUNS
    old must sit inside the first 50, so no oracle-backed query's newest
    green row ever goes three driver runs stale and no rewrite waits out
    the rotation.  Staleness counts runs that actually happened (rounds
    with a CORRECTNESS file), not round numbers — round 6 produced no
    driver artifacts, and a round-number clock ages two cohorts at once
    across the gap (96 stale vs 50 slots: arithmetically unsatisfiable)."""
    from nasctn_sea_ingest_spark.plans import (
        RECHECK, RETIRED_NAMES, _driver_runs, _latest_driver_round,
        _runs_stale)

    names = [q.name for q in CORPUS]
    assert len(names) == len(set(names))
    window = set(names[:50])
    latest = _latest_driver_round()
    runs = _driver_runs()
    assert runs, "no CORRECTNESS_r*.json found at repo root"
    must_be_inside = {
        n for n in names
        if _runs_stale(latest.get(n), runs) >= 2 or n in RECHECK
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


def test_runs_stale_is_skip_robust():
    """Regression for the round-6 gap: a skipped driver round (no
    CORRECTNESS file) must not age queries.  With runs {1..5, 7} a query
    last green in r05 is ONE run stale (only r07 elapsed), r04 is two,
    and landing a hypothetical r08 ages each cohort by exactly one run —
    the round-number clock instead aged r04 AND r05 simultaneously when
    r07 landed, overflowing the 50-slot window."""
    from nasctn_sea_ingest_spark.plans import _runs_stale

    runs = [1, 2, 3, 4, 5, 7]
    assert _runs_stale(7, runs) == 0
    assert _runs_stale(5, runs) == 1      # r06 never ran: one elapsed run
    assert _runs_stale(4, runs) == 2      # stale -> must enter the window
    assert _runs_stale(3, runs) == 3
    assert _runs_stale(None, runs) == 7   # never checked: staler than all
    # Next round lands: every cohort ages by exactly one run.
    runs8 = runs + [8]
    assert [_runs_stale(r, runs8) for r in (7, 5, 4)] == [1, 2, 3]
    # A double skip (r09, r10 missing; r11 lands) still ages by one.
    runs11 = runs8 + [11]
    assert _runs_stale(8, runs11) == 1
    assert _runs_stale(7, runs11) == 2


def test_q177_coreness_pins_q170_k_core(spark, sf_dir):
    """The k_core(k) == {core >= k} identity asserted CROSS-ENGINE on
    the shared witness graph: q177's core >= 2 node set must equal
    q170's 2-core node set (both queries are independently DuckDB-
    oracled by test_oracle_match, so this pins the two operators'
    semantics against each other on driver-checked results)."""
    q = {x.name: x for x in ALL}
    cores = {r.node for r in
             q["q177_core_numbers"].spark(spark, sf_dir)
             .where("core >= 2").collect()}
    kcore = {r.node for r in
             q["q170_k_core"].spark(spark, sf_dir).collect()}
    assert cores == kcore and cores
