"""TPC-H Q2/Q11/Q16/Q20 readiness (plans/corpus_partsupp.py).

The driver's schema has no partsupp table, so these queries stay
unregistered in the shipped corpus — but the shapes must be correct the
moment the table appears.  This test builds an sf_dir with the real
test-harness tables plus a deterministic synthetic partsupp, registers
the four queries, oracle-checks each against DuckDB, then restores
CORPUS.  The source scale follows $SPARK_GRAFT_TEST_SF_DIR, so the
per-round full sf0.01 pytest run exercises the quartet end-to-end at
driver scale (sf0.01 part x supplier -> ~66k synthetic partsupp rows),
not just the sf0.001 unit shapes.
"""

import os

import duckdb
import pytest

from nasctn_sea_ingest_spark.plans import CORPUS, corpus_partsupp

from .oracle_compare import compare, duck_con

SF_SRC = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                        "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ps_sf_dir(tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("ps") / "sf0.001ps")
    os.mkdir(sf)
    for t in os.listdir(SF_SRC):
        os.symlink(os.path.join(SF_SRC, t), os.path.join(sf, t))
    # deterministic partsupp: ~1/3 of (part × supplier), integer-derived
    # availqty/supplycost so both engines read identical doubles
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT p.p_partkey AS ps_partkey, s.s_suppkey AS ps_suppkey,
                 CAST((p.p_partkey * 7 + s.s_suppkey * 13) % 1000 + 1
                      AS INT) AS ps_availqty,
                 CAST((p.p_partkey * 31 + s.s_suppkey * 17) % 10000
                      AS DOUBLE) / 100.0 + 1.0 AS ps_supplycost
          FROM '{sf}/part.parquet' p, '{sf}/supplier.parquet' s
          WHERE (p.p_partkey * 3 + s.s_suppkey) % 3 = 0
        ) TO '{sf}/partsupp.parquet' (FORMAT PARQUET)
    """)
    con.close()
    return sf


@pytest.fixture(scope="module")
def ps_queries(ps_sf_dir):
    before = {q.name for q in CORPUS}
    qs = corpus_partsupp._register()
    assert [q.name for q in qs] == [
        "q131_min_cost_supplier", "q132_important_stock",
        "q133_supplier_cnt", "q134_excess_inventory_suppliers"]
    yield qs
    CORPUS[:] = [q for q in CORPUS if q.name in before]


def test_partsupp_gate_matches_filesystem(ps_sf_dir):
    """The import-time gate keys purely on partsupp.parquet existing."""
    root = os.path.dirname(ps_sf_dir)
    assert corpus_partsupp.partsupp_available(sf_root=root)
    assert not corpus_partsupp.partsupp_available(
        sf_root=os.path.join(root, "nonexistent"))


def test_partsupp_queries_match_oracle(spark, ps_sf_dir, ps_queries):
    con = duck_con(ps_sf_dir)
    try:
        for q in ps_queries:
            problems = compare(q.spark(spark, ps_sf_dir), con, q.sql)
            assert not problems, f"{q.name}: " + "; ".join(problems)
            assert q.spark(spark, ps_sf_dir).count() > 0, \
                f"{q.name}: degenerate empty result"
    finally:
        con.close()
