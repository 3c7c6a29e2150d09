"""Subquery + multi-way-join corpus: scalar subqueries (uncorrelated and
correlated), IN-subquery with HAVING, and the classic TPC-H Q3/Q5 join
shapes over the driver's synthetic star schema.

The reference workload never needs subqueries (its "queries" are pandas
method chains), but a user switching engines gets them from Catalyst for
free — this file declares them as oracle-checked corpus entries so the
surface is verified, not just available.  Spark-side plans express each
subquery the way Catalyst itself decorrelates them: uncorrelated scalar →
broadcast one-row cross join; correlated scalar → groupBy + equi-join;
IN (GROUP BY ... HAVING) → aggregate + left-semi join.

Float parity follows corpus.py rules: money sums in DECIMAL then cast to
DOUBLE; scalar-subquery thresholds multiplied only by powers of two (0.5)
so the double math is bit-identical on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .corpus import _dsum, _q
from .tables import load_table, us, us_cmp

_REV = ("cast(l_extendedprice as decimal(12,2)) * "
        "(1.00 - cast(l_discount as decimal(4,2)))")
_REV_SQL = ("CAST(l_extendedprice AS DECIMAL(12,2)) * "
            "(1.00 - CAST(l_discount AS DECIMAL(4,2)))")


@_q("q62_scalar_subquery",
    "uncorrelated scalar subquery → broadcast one-row cross join "
    "(Catalyst's own decorrelation shape)",
    """
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT CAST(sum(CAST(p_retailprice AS
                             DECIMAL(12,2))) AS DOUBLE) / count(*) FROM part)
    """)
def q62(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    avg = p.agg((_dsum(F.col("p_retailprice"), "12,2")
                 / F.count("*")).alias("avg_price"))
    return (p.crossJoin(F.broadcast(avg))
             .where(F.col("p_retailprice") > F.col("avg_price"))
             .select("p_partkey", "p_name", "p_retailprice"))


@_q("q63_correlated_scalar",
    "correlated scalar subquery (TPC-H Q17 shape: lineitems below half the "
    "per-part mean quantity) → per-key aggregate + equi-join",
    """
    SELECT l.l_partkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS small_qty_revenue,
           count(*) AS n_lines
    FROM lineitem l
    WHERE l.l_quantity < 0.5 * (
        SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               / count(*)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
    """)
def q63(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # one shuffle on l_partkey serves both the aggregate and the join; at
    # 100 TB this is the plan you want (no per-row re-aggregation, AQE can
    # still broadcast the avg side if the part count is small)
    per_part = (li.groupBy(F.col("l_partkey").alias("pk"))
                  .agg((_dsum(F.col("l_quantity"), "12,2")
                        / F.count("*")).alias("avg_qty")))
    return (li.join(per_part, li.l_partkey == per_part.pk)
              .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
              .groupBy("l_partkey")
              .agg(_dsum(F.col("l_extendedprice"), "12,2")
                   .alias("small_qty_revenue"),
                   F.count("*").alias("n_lines")))


@_q("q64_in_having",
    "IN (GROUP BY ... HAVING) subquery (TPC-H Q18 shape: large-quantity "
    "orders) → aggregate + left-semi join",
    """
    SELECT c.c_name, o.o_orderkey, epoch_us(o.o_orderdate) AS o_orderdate_us,
           o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150)
    GROUP BY c.c_name, o.o_orderkey, o_orderdate_us, o.o_totalprice
    """)
def q64(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy(F.col("l_orderkey").alias("ok"))
             .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)"))
                  .alias("qty"))
             .where(F.col("qty") > 150))
    return (o.join(big, o.o_orderkey == big.ok, "left_semi")
             .join(c, o.o_custkey == c.c_custkey)
             .join(li, o.o_orderkey == li.l_orderkey)
             .groupBy("c_name", "o_orderkey",
                      F.col("o_orderdate_us"), "o_totalprice")
             .agg(_dsum(F.col("l_quantity"), "12,2").alias("total_qty")))


@_q("q65_shipping_priority",
    "TPC-H Q3 shape: 3-way join + agg + deterministic top-k "
    "(P9 limit + W3 sort over a join pipeline)",
    f"""
    SELECT l.l_orderkey,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
           epoch_us(o.o_orderdate) AS o_orderdate_us, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND epoch_us(o.o_orderdate) < {us('1998-01-01')}
      AND epoch_us(l.l_shipdate) > {us('1998-01-01')}
    GROUP BY l.l_orderkey, o_orderdate_us, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """)
def q65(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = us("1998-01-01")
    return (li.where(us_cmp("l_shipdate", ">", cut))
              .join(o.where(us_cmp("o_orderdate", "<", cut)),
                    F.col("l_orderkey") == o.o_orderkey)
              .join(c.where(F.col("c_mktsegment") == "BUILDING"),
                    o.o_custkey == c.c_custkey, "left_semi")
              .groupBy("l_orderkey", "o_orderdate_us", "o_orderpriority")
              .agg(F.sum(F.expr(_REV)).cast("double").alias("revenue"))
              .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
              .limit(10)
              .select("l_orderkey", "revenue", "o_orderdate_us",
                      "o_orderpriority"))


@_q("q66_local_supplier_volume",
    "TPC-H Q5 shape: 6-way join with non-key cross-condition "
    "(c_nationkey = s_nationkey); nation/region broadcast",
    f"""
    SELECT n.n_name,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND epoch_us(o.o_orderdate) >= {us('1996-01-01')}
      AND epoch_us(o.o_orderdate) < {us('1997-01-01')}
    GROUP BY n.n_name
    """)
def q66(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # restrict nation to the target region first (broadcast, 25 rows), so
    # the big fact-side joins only carry surviving suppliers/customers
    asia_n = (n.join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
                     n.n_regionkey == F.col("r_regionkey"))
               .select("n_nationkey", "n_name"))
    o_win = o.where(us_cmp("o_orderdate", ">=", us("1996-01-01"))
                    & us_cmp("o_orderdate", "<", us("1997-01-01")))
    return (li.join(o_win, li.l_orderkey == o_win.o_orderkey)
              .join(c, o_win.o_custkey == c.c_custkey)
              .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
                    & (c.c_nationkey == s.s_nationkey))
              .join(F.broadcast(asia_n),
                    s.s_nationkey == asia_n.n_nationkey)
              .groupBy("n_name")
              .agg(F.sum(F.expr(_REV)).cast("double").alias("revenue")))


@_q("q70_late_shipment_priority",
    "TPC-H Q12 shape: conditional aggregation (CASE inside sum) over a "
    "fact-fact join — late shipments split by order-priority class",
    """
    SELECT p_class,
           CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT)
             AS late_lines,
           count(*) AS total_lines
    FROM (
      SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'high' ELSE 'low' END AS p_class,
             epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
               > 60 * 86400000000 AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    GROUP BY p_class
    """)
def q70(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    p_class = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
                     "high").otherwise("low")
    late = (F.col("l_shipdate_us") - F.col("o_orderdate_us")
            > 60 * 86_400_000_000)
    return (j.select(p_class.alias("p_class"), late.alias("late"))
             .groupBy("p_class")
             .agg(F.sum(F.when(F.col("late"), 1).otherwise(0))
                  .alias("late_lines"),
                  F.count("*").alias("total_lines")))


@_q("q71_promo_revenue_share",
    "TPC-H Q14 shape: conditional-aggregate ratio — promo share of revenue "
    "in a ship-date month (decimal-exact numerator/denominator)",
    f"""
    SELECT round(
             CAST(sum(CASE WHEN p.p_type = 'PROMO'
                           THEN {_REV_SQL} ELSE CAST(0.00 AS DECIMAL(16,4))
                      END) AS DOUBLE)
             / CAST(sum({_REV_SQL}) AS DOUBLE) * 100, 6) AS promo_pct,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE epoch_us(l.l_shipdate) >= {us('1997-03-01')}
      AND epoch_us(l.l_shipdate) < {us('1997-04-01')}
    """)
def q71(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    win = li.where(us_cmp("l_shipdate", ">=", us("1997-03-01"))
                   & us_cmp("l_shipdate", "<", us("1997-04-01")))
    j = win.join(F.broadcast(p), win.l_partkey == p.p_partkey)
    rev = F.expr(_REV)
    promo = F.when(F.col("p_type") == "PROMO", rev) \
             .otherwise(F.expr("cast(0.00 as decimal(16,4))"))
    return j.agg(
        F.round(F.sum(promo).cast("double")
                / F.sum(rev).cast("double") * 100, 6).alias("promo_pct"),
        F.count("*").alias("n_lines"))


@_q("q72_sole_late_supplier",
    "TPC-H Q21 shape: semi + anti double-correlation — suppliers whose "
    "late line is the ONLY late line of a multi-supplier order",
    f"""
    WITH late AS (
      SELECT l_orderkey, l_suppkey FROM lineitem
      WHERE epoch_us(l_shipdate) > {us('1998-06-01')}),
    multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1)
    SELECT l.l_suppkey, count(*) AS numwait
    FROM late l
    WHERE EXISTS (SELECT 1 FROM multi m WHERE m.l_orderkey = l.l_orderkey)
      AND NOT EXISTS (SELECT 1 FROM late l2
                      WHERE l2.l_orderkey = l.l_orderkey
                        AND l2.l_suppkey <> l.l_suppkey)
    GROUP BY l.l_suppkey
    """)
def q72(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    late = (li.where(us_cmp("l_shipdate", ">", us("1998-06-01")))
              .select("l_orderkey", "l_suppkey"))
    multi = (li.groupBy("l_orderkey")
               .agg(F.countDistinct("l_suppkey").alias("ns"))
               .where(F.col("ns") > 1).select("l_orderkey"))
    other_late = (late.alias("l2")
                  .select(F.col("l_orderkey").alias("ok2"),
                          F.col("l_suppkey").alias("sk2")))
    return (late.join(multi, "l_orderkey", "left_semi")
                .join(other_late,
                      (F.col("l_orderkey") == F.col("ok2"))
                      & (F.col("l_suppkey") != F.col("sk2")), "left_anti")
                .groupBy("l_suppkey")
                .agg(F.count("*").alias("numwait")))


def _year_us(us_col: str) -> "F.Column":
    """Calendar year from epoch-micros, timezone-free on both engines
    (to_date arithmetic — never year(TIMESTAMP), which would read the
    Spark session timezone)."""
    days = F.expr(f"cast({us_col} div 86400000000 as int)")
    return F.year(F.date_add(F.to_date(F.lit("1970-01-01")), days))


@_q("q78_returned_item_report",
    "TPC-H Q10 shape: 4-way join (two fact joins + broadcast dim), "
    "revenue agg per customer, deterministic top-20 — the classic "
    "'who returned the most' report",
    f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue,
           n.n_name, c.c_acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND epoch_us(o.o_orderdate) >= {us('1997-01-01')}
      AND epoch_us(o.o_orderdate) < {us('1997-07-01')}
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """)
def q78(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    o_win = o.where(us_cmp("o_orderdate", ">=", us("1997-01-01"))
                    & us_cmp("o_orderdate", "<", us("1997-07-01")))
    return (li.where(F.col("l_returnflag") == "R")
              .join(o_win, li.l_orderkey == o_win.o_orderkey)
              .join(c, o_win.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
              .agg(F.sum(F.expr(_REV)).cast("double").alias("revenue"))
              .orderBy(F.desc("revenue"), F.asc("c_custkey"))
              .limit(20)
              .select("c_custkey", "c_name", "revenue", "n_name",
                      "c_acctbal"))


@_q("q79_nation_volume_shipping",
    "TPC-H Q7 shape: 6-way join with a symmetric nation-pair predicate, "
    "revenue by (supp_nation, cust_nation, year) — both nation dims "
    "broadcast, year derived timezone-free from epoch-micros",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year, {_REV_SQL} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """)
def q79(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = (n.where(F.col("n_name").isin(*pair))
           .select(F.col("n_nationkey").alias("nk1"),
                   F.col("n_name").alias("supp_nation")))
    n2 = (n.where(F.col("n_name").isin(*pair))
           .select(F.col("n_nationkey").alias("nk2"),
                   F.col("n_name").alias("cust_nation")))
    # nation filters ride broadcast joins INTO the fact scans (supplier /
    # customer shrink before touching lineitem); the symmetric-pair
    # predicate is applied post-join on the two broadcast name columns
    sup = s.join(F.broadcast(n1), s.s_nationkey == F.col("nk1")) \
           .select("s_suppkey", "supp_nation")
    cus = c.join(F.broadcast(n2), c.c_nationkey == F.col("nk2")) \
           .select("c_custkey", "cust_nation")
    return (li.join(F.broadcast(sup), li.l_suppkey == F.col("s_suppkey"))
              .join(o, li.l_orderkey == o.o_orderkey)
              .join(cus, o.o_custkey == F.col("c_custkey"))
              .where(F.col("supp_nation") != F.col("cust_nation"))
              .select("supp_nation", "cust_nation",
                      _year_us("l_shipdate_us").alias("l_year"),
                      F.expr(_REV).alias("volume"))
              .groupBy("supp_nation", "cust_nation", "l_year")
              .agg(F.sum("volume").cast("double").alias("revenue")))


@_q("q80_market_share",
    "TPC-H Q8 shape: 7-way join + conditional-aggregate ratio — one "
    "nation's share of ECONOMY-part revenue sold into ASIA, per order "
    "year (region/nation/part broadcast; share = CASE-sum / sum)",
    f"""
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_8'
                               THEN volume
                               ELSE CAST(0.00 AS DECIMAL(16,4)) END)
                      AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share,
           count(*) AS n_lines
    FROM (
      SELECT year(o.o_orderdate) AS o_year, {_REV_SQL} AS volume,
             n1.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY')
    GROUP BY o_year
    """)
def q80(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    asia_keys = (n.join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
                        n.n_regionkey == F.col("r_regionkey"))
                  .select(F.col("n_nationkey").alias("cnk")))
    sup = (s.join(F.broadcast(n.select(F.col("n_nationkey").alias("snk"),
                                       F.col("n_name")
                                        .alias("supp_nation"))),
                  s.s_nationkey == F.col("snk"))
            .select("s_suppkey", "supp_nation"))
    econ = p.where(F.col("p_type") == "ECONOMY").select("p_partkey")
    vol = F.expr(_REV)
    j = (li.join(F.broadcast(econ), li.l_partkey == F.col("p_partkey"))
           .join(F.broadcast(sup), li.l_suppkey == F.col("s_suppkey"))
           .join(o, li.l_orderkey == o.o_orderkey)
           .join(c, o.o_custkey == c.c_custkey)
           .join(F.broadcast(asia_keys), c.c_nationkey == F.col("cnk"))
           .select(_year_us("o_orderdate_us").alias("o_year"),
                   vol.alias("volume"), "supp_nation"))
    target = F.when(F.col("supp_nation") == "NATION_8",
                    F.col("volume")) \
              .otherwise(F.expr("cast(0.00 as decimal(16,4))"))
    return (j.groupBy("o_year")
             .agg(F.round(F.sum(target).cast("double")
                          / F.sum("volume").cast("double"), 6)
                  .alias("mkt_share"),
                  F.count("*").alias("n_lines")))


@_q("q81_order_count_distribution",
    "TPC-H Q13 shape: left outer join + two-level aggregation — the "
    "orders-per-customer histogram (outer-join null handling feeding a "
    "re-aggregation)",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
    GROUP BY c_count
    """)
def q81(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                 .groupBy("c_custkey")
                 .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@_q("q73_event_funnel",
    "event-funnel conversion: per-user first 'view' then earliest later "
    "'purchase' via conditional window mins — no self-join (the sequence-"
    "analysis shape every event warehouse runs)",
    """
    WITH u AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               AS first_view_us,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS first_purchase_us
      FROM events GROUP BY user_id),
    c AS (
      SELECT user_id, first_view_us,
             (SELECT min(epoch_us(e.ts)) FROM events e
              WHERE e.user_id = u.user_id AND e.event_type = 'purchase'
                AND epoch_us(e.ts) > u.first_view_us) AS conv_us
      FROM u WHERE first_view_us IS NOT NULL)
    SELECT user_id, first_view_us, conv_us,
           conv_us IS NOT NULL AS converted
    FROM c
    """)
def q73(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    firsts = (ev.groupBy("user_id")
                .agg(F.min(F.when(F.col("event_type") == "view",
                                  F.col("ts_us"))).alias("first_view_us"))
                .where(F.col("first_view_us").isNotNull()))
    # conditional re-aggregation against the per-user first view: one
    # shuffle on user_id for the agg + a broadcast-ready join back
    purch = ev.where(F.col("event_type") == "purchase") \
              .select("user_id", F.col("ts_us").alias("p_us"))
    conv = (purch.join(firsts, "user_id")
                 .where(F.col("p_us") > F.col("first_view_us"))
                 .groupBy("user_id")
                 .agg(F.min("p_us").alias("conv_us")))
    return (firsts.join(conv, "user_id", "left")
                  .select("user_id", "first_view_us", "conv_us",
                          F.col("conv_us").isNotNull().alias("converted")))


# ---------------------------------------------------------------------------
# TPC-H completion (round 3).  With q01/q63/q64/q65/q66/q70/q71/q72/q78-q81
# this file covers 18 of the 22 TPC-H query shapes; the remaining four
# (Q2/Q11/Q16/Q20) all require the PARTSUPP table, which the driver's
# synthetic schema does not ship — their defining operator shapes
# (correlated min-subquery, HAVING-over-scalar-subquery, NOT IN + distinct
# count, nested IN chains) are each exercised by other entries below.
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


@_q("q95_order_priority_check",
    "TPC-H Q4 shape: correlated EXISTS with a non-equi condition "
    "(late line on the order) -> left-semi join on key + range, priority "
    "histogram",
    f"""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE epoch_us(o.o_orderdate) >= {us('1997-01-01')}
      AND epoch_us(o.o_orderdate) < {us('1997-04-01')}
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
                        > 30 * 86400000000)
    GROUP BY o.o_orderpriority
    """)
def q95(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o_win = o.where(us_cmp("o_orderdate", ">=", us("1997-01-01"))
                    & us_cmp("o_orderdate", "<", us("1997-04-01")))
    late = li.select("l_orderkey", "l_shipdate_us")
    # semi-join carries the equi-key (shuffle key) plus the correlated
    # range condition; at 100 TB the orders window filter pushes to the
    # scan and only surviving orderkeys shuffle
    return (o_win.join(late,
                       (o_win.o_orderkey == late.l_orderkey)
                       & (late.l_shipdate_us - o_win.o_orderdate_us
                          > 30 * _DAY_US),
                       "left_semi")
                 .groupBy("o_orderpriority")
                 .agg(F.count("*").alias("order_count")))


@_q("q96_forecast_revenue",
    "TPC-H Q6 shape: pure scan -> filter -> scalar aggregate (the "
    "pushdown/pruning benchmark: every predicate lands in PushedFilters)",
    f"""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE epoch_us(l_shipdate) >= {us('1997-01-01')}
      AND epoch_us(l_shipdate) < {us('1998-01-01')}
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """)
def q96(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (li.where(us_cmp("l_shipdate", ">=", us("1997-01-01"))
                     & us_cmp("l_shipdate", "<", us("1998-01-01"))
                     & (F.col("l_discount") >= 0.05)
                     & (F.col("l_discount") <= 0.07)
                     & (F.col("l_quantity") < 24))
              .agg(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")
                         * F.col("l_discount").cast("decimal(4,2)"))
                    .cast("double").alias("revenue"),
                   F.count("*").alias("n_lines")))


@_q("q97_top_revenue_supplier",
    "TPC-H Q15 shape: aggregate view + uncorrelated MAX scalar subquery, "
    "equality on a decimal-exact total (deterministic on both engines)",
    f"""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum({_REV_SQL}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE epoch_us(l_shipdate) >= {us('1997-10-01')}
        AND epoch_us(l_shipdate) < {us('1998-01-01')}
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """)
def q97(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (li.where(us_cmp("l_shipdate", ">=", us("1997-10-01"))
                    & us_cmp("l_shipdate", "<", us("1998-01-01")))
             .groupBy("l_suppkey")
             .agg(F.sum(F.expr(_REV)).cast("double")
                   .alias("total_revenue")))
    # the one-row max side broadcasts; rev is computed once and reused for
    # both the max and the equality filter (Spark reuses the exchange)
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (rev.crossJoin(F.broadcast(mx))
               .where(F.col("total_revenue") == F.col("mx"))
               .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
               .select("s_suppkey", "s_name", "total_revenue"))


@_q("q98_disjunctive_predicate",
    "TPC-H Q19 shape: disjunction of brand/size/quantity conjunction "
    "bands across a lineitem-part join (OR-of-ANDs predicate "
    "normalization; part side broadcast)",
    f"""
    SELECT CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue, count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1  AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#7'  AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """)
def q98(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # part-only disjuncts (brand IN ...) pre-filter the broadcast side;
    # the mixed part+lineitem disjunction applies post-join — Catalyst
    # additionally derives the IN prefilter itself via constraint
    # propagation, but stating it keeps the broadcast side minimal
    p_pre = p.where(F.col("p_brand").isin("Brand#3", "Brand#7",
                                          "Brand#11"))
    band = (
        ((F.col("p_brand") == "Brand#3")
         & F.col("p_size").between(1, 15)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#7")
           & F.col("p_size").between(1, 25)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#11")
           & F.col("p_size").between(1, 35)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30)))
    return (li.join(F.broadcast(p_pre), li.l_partkey == p_pre.p_partkey)
              .where(band)
              .agg(F.sum(F.expr(_REV)).cast("double").alias("revenue"),
                   F.count("*").alias("n_lines")))


@_q("q99_global_sales_opportunity",
    "TPC-H Q22 shape: above-average-balance customers with no orders — "
    "uncorrelated AVG scalar subquery + anti-join, per-nation rollup",
    """
    WITH pos AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / count(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.00)
    SELECT c.c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             AS totacctbal
    FROM customer c, pos
    WHERE c.c_acctbal > pos.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """)
def q99(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (c.where(F.col("c_acctbal") > 0.00)
                .agg((_dsum(F.col("c_acctbal"), "12,2")
                      / F.count("*")).alias("avg_bal")))
    return (c.crossJoin(F.broadcast(avg_bal))
             .where(F.col("c_acctbal") > F.col("avg_bal"))
             .join(o.select("o_custkey"),
                   c.c_custkey == F.col("o_custkey"), "left_anti")
             .groupBy("c_nationkey")
             .agg(F.count("*").alias("numcust"),
                  _dsum(F.col("c_acctbal"), "12,2").alias("totacctbal")))


@_q("q100_product_type_profit",
    "TPC-H Q9 shape (partsupp-free): part-name token filter riding a "
    "5-way join, profit rollup by supplier nation and order year",
    f"""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """)
def q100(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    red = p.where(F.col("p_name").like("%red%")).select("p_partkey")
    sup_n = (s.join(F.broadcast(n),
                    s.s_nationkey == n.n_nationkey)
              .select("s_suppkey", F.col("n_name").alias("nation")))
    return (li.join(F.broadcast(red), li.l_partkey == F.col("p_partkey"))
              .join(F.broadcast(sup_n), li.l_suppkey == F.col("s_suppkey"))
              .join(o, li.l_orderkey == o.o_orderkey)
              .groupBy("nation", _year_us("o_orderdate_us").alias("o_year"))
              .agg(F.sum(F.expr(_REV)).cast("double").alias("sum_profit")))
