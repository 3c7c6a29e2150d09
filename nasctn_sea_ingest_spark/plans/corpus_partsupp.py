"""TPC-H Q2 / Q11 / Q16 / Q20 shapes — the four corpus entries that need a
``partsupp`` table, which the driver's synthetic schema does not (yet)
ship (SURVEY.md §2.12 note).  Everything here is gated on the table's
existence: when ``partsupp.parquet`` appears next to the other testdata
tables these queries self-register into ``CORPUS`` (and the driver window
logic in ``plans/__init__`` pulls them to the front); until then the
module contributes nothing and every shape stays importable + unit-lintable.

Schema expectations follow standard TPC-H, trimmed like the driver trims
its other tables: ``ps_partkey BIGINT, ps_suppkey BIGINT, ps_availqty
INT/BIGINT, ps_supplycost DOUBLE``.  Deliberate adaptations to the
trimmed synthetic schema (documented divergences from spec text, not from
shape):

- Q2: no ``p_mfgr``/``s_address``/``s_phone``/``s_comment`` columns exist
  → projection keeps (s_acctbal, s_name, n_name, p_partkey, p_name).
- Q16: no ``s_comment`` → the "customer complaints" supplier exclusion is
  expressed as a key-list anti-join (same anti-join shape, synthetic
  predicate).
- Date constants use the synthetic data's 1997-1998 span (same as
  q95-q100) rather than TPC-H's 1994-1995.

Float parity per corpus.py rules: money sums in DECIMAL then cast DOUBLE;
the Q11/Q20 scalar fractions are powers of two (1/1024, 1/2) so double
multiplication is bit-exact on both engines.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from .corpus import _q, _dsum
from .tables import load_table, us, us_cmp


def partsupp_available(sf_root: str = "/root/testdata") -> bool:
    """True when any driver scale factor ships partsupp.parquet."""
    import glob
    env = os.environ.get("SPARK_GRAFT_SF_DIR")
    roots = [env] if env else []
    roots += sorted(glob.glob(os.path.join(sf_root, "sf*")))
    return any(os.path.exists(os.path.join(r, "partsupp.parquet"))
               for r in roots if r)


def _register() -> list:
    """Declare the four shapes (idempotent; returns the Query objects)."""

    @_q("q131_min_cost_supplier",
        "TPC-H Q2 shape (minimum-cost supplier): correlated scalar "
        "subquery min(ps_supplycost) per part within a region, "
        "decorrelated Catalyst-style into a per-part aggregate + "
        "equi-join back; region/nation dims broadcast",
        """
        WITH eligible AS (
          SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost,
                 s.s_acctbal, s.s_name, n.n_name
          FROM partsupp ps, supplier s, nation n, region r
          WHERE s.s_suppkey = ps.ps_suppkey
            AND s.s_nationkey = n.n_nationkey
            AND n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'),
        best AS (
          SELECT ps_partkey, min(ps_supplycost) AS min_cost
          FROM eligible GROUP BY ps_partkey)
        SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
               CAST(e.ps_supplycost AS DOUBLE) AS supplycost
        FROM part p, eligible e, best b
        WHERE p.p_partkey = e.ps_partkey AND b.ps_partkey = e.ps_partkey
          AND e.ps_supplycost = b.min_cost
          AND p.p_size BETWEEN 10 AND 20
        ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
        LIMIT 100
        """)
    def q131(spark, sf_dir):
        ps = load_table(spark, sf_dir, "partsupp")
        s = load_table(spark, sf_dir, "supplier")
        n = load_table(spark, sf_dir, "nation")
        r = load_table(spark, sf_dir, "region").where(
            F.col("r_name") == "EUROPE")
        p = load_table(spark, sf_dir, "part").where(
            F.col("p_size").between(10, 20))
        # dims are tiny at any SF → broadcast; partsupp shuffles once on
        # ps_partkey and that partitioning serves BOTH the min() aggregate
        # and the join back (Catalyst reuses the exchange)
        eligible = (ps.join(F.broadcast(s),
                            ps.ps_suppkey == s.s_suppkey)
                      .join(F.broadcast(n),
                            s.s_nationkey == n.n_nationkey)
                      .join(F.broadcast(r),
                            n.n_regionkey == r.r_regionkey)
                      .select("ps_partkey", "ps_supplycost", "s_acctbal",
                              "s_name", "n_name"))
        best = (eligible.groupBy("ps_partkey")
                .agg(F.min("ps_supplycost").alias("min_cost")))
        return (eligible
                .join(best, "ps_partkey")
                .where(F.col("ps_supplycost") == F.col("min_cost"))
                .join(F.broadcast(p),
                      F.col("ps_partkey") == F.col("p_partkey"))
                .select("s_acctbal", "s_name", "n_name", "p_partkey",
                        "p_name",
                        F.col("ps_supplycost").cast("double")
                        .alias("supplycost"))
                .orderBy(F.desc("s_acctbal"), "n_name", "s_name",
                         "p_partkey")
                .limit(100))

    @_q("q132_important_stock",
        "TPC-H Q11 shape (important stock identification): per-part "
        "inventory value within one nation vs a scalar fraction of the "
        "national total — one shuffle on ps_partkey, total as a "
        "broadcast 1-row cross join; fraction 1/1024 is a power of two "
        "so the double threshold is bit-exact on both engines",
        """
        WITH nat AS (
          SELECT ps.ps_partkey,
                 CAST(ps.ps_supplycost AS DECIMAL(12,2))
                   * ps.ps_availqty AS val
          FROM partsupp ps, supplier s, nation n
          WHERE ps.ps_suppkey = s.s_suppkey
            AND s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3')
        SELECT ps_partkey, CAST(sum(val) AS DOUBLE) AS stock_value
        FROM nat GROUP BY ps_partkey
        HAVING CAST(sum(val) AS DOUBLE)
               > (SELECT CAST(sum(val) AS DOUBLE) / 1024.0 FROM nat)
        ORDER BY stock_value DESC, ps_partkey
        """)
    def q132(spark, sf_dir):
        ps = load_table(spark, sf_dir, "partsupp")
        s = load_table(spark, sf_dir, "supplier")
        n = load_table(spark, sf_dir, "nation").where(
            F.col("n_name") == "NATION_3")
        nat = (ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
                 .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                 .select("ps_partkey",
                         (F.col("ps_supplycost").cast("decimal(12,2)")
                          * F.col("ps_availqty")).alias("val")))
        per_part = (nat.groupBy("ps_partkey")
                    .agg(F.sum("val").cast("double").alias("stock_value")))
        total = per_part.agg(
            (F.sum(F.col("stock_value").cast("decimal(18,2)"))
             .cast("double") / 1024.0).alias("threshold"))
        return (per_part.crossJoin(F.broadcast(total))
                .where(F.col("stock_value") > F.col("threshold"))
                .select("ps_partkey", "stock_value")
                .orderBy(F.desc("stock_value"), "ps_partkey"))

    @_q("q133_supplier_cnt",
        "TPC-H Q16 shape (parts/supplier relationship): distinct-supplier "
        "counts per (brand, type, size) bucket with NOT-IN filters and an "
        "anti-join supplier exclusion (the s_comment complaints filter of "
        "the spec, expressed on keys — the synthetic schema has no "
        "comment column)",
        """
        SELECT p.p_brand, p.p_type, p.p_size,
               count(DISTINCT ps.ps_suppkey) AS supplier_cnt
        FROM partsupp ps, part p
        WHERE p.p_partkey = ps.ps_partkey
          AND p.p_brand <> 'Brand#7' AND p.p_type <> 'SMALL'
          AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_suppkey % 13 = 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
        """)
    def q133(spark, sf_dir):
        ps = load_table(spark, sf_dir, "partsupp")
        p = (load_table(spark, sf_dir, "part")
             .where((F.col("p_brand") != "Brand#7")
                    & (F.col("p_type") != "SMALL")
                    & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)))
        excl = (load_table(spark, sf_dir, "supplier")
                .where(F.col("s_suppkey") % 13 == 0)
                .select("s_suppkey"))
        return (ps.join(F.broadcast(excl),
                        ps.ps_suppkey == excl.s_suppkey, "left_anti")
                .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
                .groupBy("p_brand", "p_type", "p_size")
                .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
                .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type",
                         "p_size"))

    @_q("q134_excess_inventory_suppliers",
        "TPC-H Q20 shape (potential part promotion): suppliers holding "
        "more than half a season's shipped quantity of any matching part "
        "— nested semi-join chain decorrelated into per-(part,supp) "
        "shipped-quantity aggregate, equi-joined to partsupp, "
        "semi-joined to supplier; 1/2 fraction keeps doubles exact",
        f"""
        WITH shipped AS (
          SELECT l_partkey, l_suppkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   AS qty
          FROM lineitem
          WHERE epoch_us(l_shipdate) >= {us('1997-01-01')}
            AND epoch_us(l_shipdate) < {us('1998-01-01')}
          GROUP BY l_partkey, l_suppkey),
        hot AS (
          SELECT DISTINCT ps.ps_suppkey
          FROM partsupp ps
          JOIN (SELECT p_partkey FROM part
                WHERE p_name LIKE 'red%') p
            ON ps.ps_partkey = p.p_partkey
          JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                         AND sh.l_suppkey = ps.ps_suppkey
          WHERE ps.ps_availqty > 0.5 * sh.qty)
        SELECT s.s_name, s.s_acctbal
        FROM supplier s JOIN hot ON s.s_suppkey = hot.ps_suppkey
        ORDER BY s.s_name
        """)
    def q134(spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        shipped = (li.where(us_cmp("l_shipdate", ">=", us("1997-01-01"))
                            & us_cmp("l_shipdate", "<", us("1998-01-01")))
                   .groupBy("l_partkey", "l_suppkey")
                   .agg(_dsum(F.col("l_quantity"), "12,2").alias("qty")))
        red = (load_table(spark, sf_dir, "part")
               .where(F.col("p_name").like("red%")).select("p_partkey"))
        ps = load_table(spark, sf_dir, "partsupp")
        hot = (ps.join(F.broadcast(red), ps.ps_partkey == red.p_partkey)
               .join(shipped,
                     (F.col("ps_partkey") == F.col("l_partkey"))
                     & (F.col("ps_suppkey") == F.col("l_suppkey")))
               .where(F.col("ps_availqty") > 0.5 * F.col("qty"))
               .select("ps_suppkey").distinct())
        s = load_table(spark, sf_dir, "supplier")
        return (s.join(hot, s.s_suppkey == hot.ps_suppkey, "left_semi")
                .select("s_name", "s_acctbal").orderBy("s_name"))

    from .corpus import CORPUS
    return [q for q in CORPUS if q.name.startswith(
        ("q131_", "q132_", "q133_", "q134_"))]


REGISTERED: list = []
if partsupp_available():
    REGISTERED = _register()
