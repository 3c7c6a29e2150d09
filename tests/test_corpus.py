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
