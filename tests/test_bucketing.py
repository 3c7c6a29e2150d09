"""Bucketed-table co-location: the cluster-scale form of the fact-fact join
(SCALE.md §4/§8). Writing both sides ``bucketBy(n, key)`` + ``sortBy(key)``
must let the sort-merge join run with ZERO shuffle exchanges — the layout
swap, not a query rewrite, is what removes the 100 TB shuffle.
"""

import pyspark.sql.functions as F
import pytest

from nasctn_sea_ingest_spark.plans.tables import load_table


@pytest.fixture()
def warehouse(spark, sf_dir, tmp_path):
    # warehouse dir is a static conf — use a throwaway database at a tmp
    # location instead
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/wh'")
    yield
    spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity")
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("bdb.b_orders"))
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
       .sortBy("l_orderkey").saveAsTable("bdb.b_lineitem"))

    bo, bl = spark.table("bdb.b_orders"), spark.table("bdb.b_lineitem")
    j = bo.join(bl, bo.o_orderkey == bl.l_orderkey) \
          .groupBy("o_orderkey") \
          .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    # the join itself reads co-located buckets: no exchange below the join
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan \
        else plan
    assert "Exchange hashpartitioning" not in join_part

    # and it returns the same result as the unbucketed plan
    plain = o.join(li, o.o_orderkey == li.l_orderkey) \
             .groupBy("o_orderkey") \
             .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
