"""Runtime-filtering contracts: the two Catalyst features that cut scan
volume at 100 TB without any query change — dynamic partition pruning
(the fact scan waits for the dim filter's result and prunes partitions at
RUN time) and runtime bloom-filter joins (a selective shuffle-join side
builds a bloom filter that pre-filters the big side's scan).

These are plan contracts like test_plan_contracts.py: the point is that
our star-schema layout (partitioned facts + small filtered dims) keeps
the queries ELIGIBLE for both optimizations — a layout or query change
that silently breaks eligibility fails here.
"""

import pyspark.sql.functions as F
import pytest

from nasctn_sea_ingest_spark.plans import load_table


@pytest.fixture(scope="module")
def part_fact(spark, sf_dir, tmp_path_factory):
    """Orders written partitioned by priority (stands in for the date
    partitioning the ingest warehouse uses)."""
    path = str(tmp_path_factory.mktemp("dpp") / "orders_part")
    (load_table(spark, sf_dir, "orders")
     .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
     .write.mode("overwrite").partitionBy("o_orderpriority").parquet(path))
    return path


def test_dynamic_partition_pruning(spark, part_fact):
    """A join on the partition column against a filtered dim must insert a
    dynamicpruning# subquery into the fact scan's PartitionFilters —
    at scale this is the difference between scanning 1 partition and
    scanning all of them."""
    fact = spark.read.parquet(part_fact)
    dim = spark.createDataFrame(
        [("1-URGENT", "hot"), ("2-HIGH", "hot"), ("3-MEDIUM", "warm"),
         ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold")],
        "prio string, klass string")
    joined = (fact.join(dim, fact.o_orderpriority == dim.prio)
                  .where(F.col("klass") == "hot")
                  .groupBy("o_orderpriority")
                  .agg(F.count("*").alias("n")))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan
    # and it actually pruned: only the 2 'hot' partitions were read
    joined.collect()
    final = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in final


def test_runtime_bloom_filter_join(spark, sf_dir):
    """A selective dim side of a SHUFFLE join must be able to inject a
    runtime bloom filter into the fact scan (Spark's row-level runtime
    filtering).  Thresholds are lowered to make the tiny test data
    eligible — the contract is that the QUERY SHAPE qualifies (equi-join,
    selective creation side, plain column references)."""
    conf = spark.conf
    saved = {k: conf.get(k) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    )}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter."
                 "creationSideThreshold", "100GB")
        conf.set("spark.sql.optimizer.runtime.bloomFilter."
                 "applicationSideScanSizeThreshold", "0")
        li = load_table(spark, sf_dir, "lineitem")
        part = (load_table(spark, sf_dir, "part")
                .where(F.col("p_size") == 1))          # selective dim
        joined = (li.join(part, li.l_partkey == part.p_partkey)
                    .groupBy("p_brand")
                    .agg(F.count("*").alias("n")))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)
