import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nasctn_sea_ingest_spark import get_spark


def pytest_collection_modifyitems(config, items):
    """Slow-tier gate (r15 verdict #1): the full suite outgrew the
    driver's verify ceiling (~32 min; VERIFY_r15 truncated mid-run),
    so the tests registered in tests/slow_tier.py — each measured
    over 5 s, none from test_corpus — are collected but skipped
    unless SPARK_GRAFT_FULL_TESTS=1.  Same test count collected,
    nothing deleted; the full tier runs at least once per round."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    from tests.slow_tier import SLOW_TESTS
    mark = pytest.mark.skip(
        reason="slow tier (>5s): run with SPARK_GRAFT_FULL_TESTS=1")
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid.split("tests/")[-1]
        if nodeid in SLOW_TESTS:
            item.add_marker(mark)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.legacy.parquet.nanosAsLong": "true"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
