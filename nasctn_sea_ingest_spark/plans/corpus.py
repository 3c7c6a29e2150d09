"""Declared query corpus: every ★ operator from SURVEY.md §2 expressed as a
deterministic, oracle-checkable (Spark plan, DuckDB SQL) pair over the
driver's synthetic tables.

Float-parity rules (so order-insensitive value hashes match bit-for-bit):

- Money/quantity sums go through exact DECIMAL arithmetic then cast to DOUBLE
  (decimal addition is associative → identical on both engines regardless of
  aggregation order).
- Transcendental outputs (log10, cosine, quantile interpolation) are rounded
  to 5–6 decimals; the inter-engine ulp noise is ~1e-12 so flip risk is nil.
- Timestamps never appear raw in outputs: epoch-microsecond BIGINTs or
  arithmetic-derived date strings only (timezone-proof on both engines).

Each query's docstring cites the reference operator(s) it re-expresses
(`/root/reference/` file:line via SURVEY.md §2 ids).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .. import functions as FN
from .tables import load_table, register_tables, us, us_between, us_cmp


@dataclass
class Query:
    name: str
    doc: str                      # operator ids covered (SURVEY §2)
    spark: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]            # DuckDB oracle; None → rows-only check


CORPUS: list[Query] = []


def _q(name: str, doc: str, sql: Optional[str]):
    def deco(fn):
        CORPUS.append(Query(name=name, doc=doc, spark=fn, sql=sql))
        return fn
    return deco


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _dsum(col, prec="18,2"):
    """Exact decimal sum of a money-like double column, as double."""
    return F.sum(col.cast(f"decimal({prec})")).cast("double")


# date string from epoch micros without using session timezone
def _date_str(us_col: str) -> F.Column:
    days = F.expr(f"cast({us_col} div 86400000000 as int)")
    return F.date_add(F.to_date(F.lit("1970-01-01")), days).cast("string")


# ---------------------------------------------------------------------------
# 1. Relational core (lineitem / orders / customer / events)
# ---------------------------------------------------------------------------

@_q("q01_pricing_summary",
    "P3 filter + A hash-agg + W3 sort (capture_summary-style rollup, "
    "dask_processing cell 3 analog; TPC-H Q1 shape)",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2))) * (1.00 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE epoch_us(l_shipdate) <= {cutoff}
    GROUP BY l_returnflag, l_linestatus
    """.format(cutoff=us("1998-09-01")))
def q01(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (li.where(us_cmp("l_shipdate", "<=", us("1998-09-01")))
              .groupBy("l_returnflag", "l_linestatus")
              .agg(_dsum(F.col("l_quantity"), "12,2").alias("sum_qty"),
                   _dsum(F.col("l_extendedprice"), "12,2").alias("sum_base_price"),
                   F.sum(F.expr("cast(l_extendedprice as decimal(12,2)) * (1.00 - cast(l_discount as decimal(4,2)))")).cast("double").alias("sum_disc_price"),
                   F.sum(F.expr("cast(l_extendedprice as decimal(12,2)) * (1.00 - cast(l_discount as decimal(4,2))) * (1.00 + cast(l_tax as decimal(4,2)))")).cast("double").alias("sum_charge"),
                   (_dsum(F.col("l_quantity"), "12,2") / F.count("*")).alias("avg_qty"),
                   (_dsum(F.col("l_extendedprice"), "12,2") / F.count("*")).alias("avg_price"),
                   (_dsum(F.col("l_discount"), "4,2") / F.count("*")).alias("avg_disc"),
                   F.count("*").alias("count_order")))


@_q("q02_filter_project",
    "P1 trace()/xs selector → WHERE + SELECT (util.py:97-128)",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 45
    """)
def q02(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (li.where((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45))
              .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))


@_q("q03_time_range",
    "P3 .loc datetime slice with partition pruning (dask_processing cell 6)",
    f"""
    SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
    FROM events
    WHERE epoch_us(ts) >= {us('2024-01-10')} AND epoch_us(ts) < {us('2024-01-12')}
    """)
def q03(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (ev.where(us_cmp("ts", ">=", us("2024-01-10"))
                     & us_cmp("ts", "<", us("2024-01-12")))
              .select("event_id", "ts_us", "event_type", "value"))


@_q("q04_conjunctive_slice",
    "P4 multi-level .loc slice → conjunctive WHERE (read_ziparchive cell 6)",
    f"""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag = 'A' AND l_linestatus = 'F'
      AND epoch_us(l_shipdate) BETWEEN {us('1996-01-01')} AND {us('1996-12-31')}
      AND l_quantity BETWEEN 10 AND 20
    """)
def q04(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (li.where((F.col("l_returnflag") == "A") & (F.col("l_linestatus") == "F")
                     & us_between("l_shipdate", us("1996-01-01"), us("1996-12-31"))
                     & F.col("l_quantity").between(10, 20))
              .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))


@_q("q05_mask_nullify",
    "P5 boolean mask → NaN (3gpp cell 11) + F11 bool→category map",
    """
    SELECT event_id,
           CASE WHEN value < 50 THEN NULL ELSE value END AS masked_value,
           CASE WHEN event_type = 'error' THEN -1 ELSE 1 END AS flag
    FROM events
    """)
def q05(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") < 50, F.lit(None)).otherwise(F.col("value")).alias("masked_value"),
        F.when(F.col("event_type") == "error", F.lit(-1)).otherwise(F.lit(1)).alias("flag"))


@_q("q06_group_limiter",
    "P8/W2/A9 limiter: truncate each group to the min group size "
    "(colormap_plots cell 2)",
    """
    WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
         m AS (SELECT min(n) AS mn FROM c),
         r AS (SELECT event_type, event_id,
                      row_number() OVER (PARTITION BY event_type ORDER BY epoch_us(ts), event_id) AS rn
               FROM events)
    SELECT r.event_type, r.event_id FROM r, m WHERE r.rn <= m.mn
    """)
def q06(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return FN.limiter(ev, ["event_type"], ["ts_us", "event_id"]) \
        .select("event_type", "event_id")


@_q("q07_topk",
    "P9/W3 deterministic top-k (head/sort_index)",
    """
    SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS o_date
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """)
def q07(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (o.orderBy(F.desc("o_totalprice"), "o_orderkey")
             .select("o_orderkey", "o_totalprice",
                     _date_str("o_orderdate_us").alias("o_date"))
             .limit(10))


@_q("q08_join_agg",
    "J4 keyed column concat → equi-join + agg; J5 broadcast small dims",
    """
    SELECT r.r_name, c.c_mktsegment,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, c.c_mktsegment
    """)
def q08(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (o.join(c, o.o_custkey == c.c_custkey)
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .groupBy("r_name", "c_mktsegment")
             .agg(_dsum(F.col("o_totalprice"), "14,2").alias("revenue"),
                  F.count("*").alias("n_orders")))


@_q("q09_semi_join",
    "left-semi join (workload-required join surface, SURVEY §2.3)",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """)
def q09(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 300000)
    return (c.join(big, c.c_custkey == big.o_custkey, "left_semi")
             .select("c_custkey", "c_name"))


@_q("q10_anti_join",
    "left-anti join (SURVEY §2.3)",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """)
def q10(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .select("c_custkey", "c_name"))


@_q("q11_asof_nearest",
    "J1 bidirectional-nearest as-of alignment (plots.py:76-77, "
    "get_indexer(method='nearest')) via the sorted-union window trick",
    """
    WITH u AS (
      SELECT epoch_us(ts) AS ts_us, event_id, NULL::BIGINT AS err_id, 0 AS is_err
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT epoch_us(ts) AS ts_us, NULL::BIGINT, event_id, 1
      FROM events WHERE event_type = 'error'
    ), w AS (
      SELECT *,
        last_value(err_id IGNORE NULLS) OVER
          (ORDER BY ts_us, is_err DESC, err_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_id,
        last_value(CASE WHEN is_err = 1 THEN ts_us END IGNORE NULLS) OVER
          (ORDER BY ts_us, is_err DESC, err_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
        first_value(err_id IGNORE NULLS) OVER
          (ORDER BY ts_us, is_err DESC, err_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_id,
        first_value(CASE WHEN is_err = 1 THEN ts_us END IGNORE NULLS) OVER
          (ORDER BY ts_us, is_err DESC, err_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
      FROM u
    )
    SELECT event_id, ts_us,
      CASE WHEN prev_id IS NULL THEN next_id
           WHEN next_id IS NULL THEN prev_id
           WHEN (next_ts - ts_us) < (ts_us - prev_ts) THEN next_id
           ELSE prev_id END AS nearest_err_id,
      CASE WHEN prev_id IS NULL THEN next_ts - ts_us
           WHEN next_id IS NULL THEN ts_us - prev_ts
           WHEN (next_ts - ts_us) < (ts_us - prev_ts) THEN next_ts - ts_us
           ELSE ts_us - prev_ts END AS diff_us
    FROM w WHERE is_err = 0
    """)
def q11(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    left = (ev.where(F.col("event_type") == "purchase")
              .select("event_id", "ts_us"))
    right = (ev.where(F.col("event_type") == "error")
               .select(F.col("event_id").alias("err_id"), "ts_us"))
    out = FN.asof_join(left, right, on="ts_us", right_cols=["err_id"])
    return out.select("event_id", "ts_us",
                      F.col("err_id").alias("nearest_err_id"),
                      F.col("asof_dist").cast("long").alias("diff_us"))


@_q("q12_union_concat",
    "J3 concat_dicts keyed union (ziparchive.py:189-204) → unionByName + agg",
    """
    SELECT event_type, count(*) AS n FROM (
      SELECT event_type FROM events WHERE value < 5
      UNION ALL
      SELECT event_type FROM events WHERE event_type = 'signup'
    ) GROUP BY event_type
    """)
def q12(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("value") < 5).select("event_type")
    b = ev.where(F.col("event_type") == "signup").select("event_type")
    return a.unionByName(b).groupBy("event_type").agg(F.count("*").alias("n"))


@_q("q13_distinct",
    "A12 unique level values → SELECT DISTINCT (colormap_plots cells 4-6)",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")
def q13(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@_q("q14_gap_detect",
    "W1 consecutive-timestamp diff for gap detection (colormap_plots cell 12)",
    """
    WITH d AS (
      SELECT user_id, event_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
      FROM events)
    SELECT user_id, event_id, gap_us FROM d WHERE gap_us > 7200000000
    """)
def q14(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (ev.withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w))
              .where(F.col("gap_us") > 7_200_000_000)
              .select("user_id", "event_id", "gap_us"))


@_q("q15_rank_topn",
    "W2 per-group ranked truncation (row_number window)",
    """
    SELECT event_type, event_id, value, rn FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM events) WHERE rn <= 3
    """)
def q15(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (ev.withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") <= 3)
              .select("event_type", "event_id", "value", "rn"))


@_q("q16_exact_quantiles",
    "A1/A4/A10 exact median + quantiles per group (dask_processing cell 3)",
    """
    SELECT l_returnflag,
           round(CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE), 5) AS q25,
           round(CAST(quantile_cont(l_quantity, 0.50) AS DOUBLE), 5) AS median_qty,
           round(CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE), 5) AS q75,
           min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """)
def q16(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # one percentile buffer per group for all three quantiles (the scalar
    # form holds three copies of every group's values at 100 TB)
    return (li.groupBy("l_returnflag")
              .agg(F.expr("percentile(l_quantity, array(0.25D, 0.50D, 0.75D))")
                    .alias("qs"),
                   F.min("l_quantity").alias("min_qty"),
                   F.max("l_quantity").alias("max_qty"))
              .select("l_returnflag",
                      F.round(F.col("qs")[0], 5).alias("q25"),
                      F.round(F.col("qs")[1], 5).alias("median_qty"),
                      F.round(F.col("qs")[2], 5).alias("q75"),
                      "min_qty", "max_qty"))


@_q("q17_pivot_wide",
    "R3 unstack/pivot (plots.py:150-165, colormap unstack)",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_F,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """)
def q17(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = (li.groupBy("l_returnflag")
           .pivot("l_linestatus", ["F", "O"])
           .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")))
    return p.select("l_returnflag", F.col("F").alias("qty_F"), F.col("O").alias("qty_O"))


@_q("q18_db_aggregates",
    "F4 dB↔linear + A8 dbsum + A3 linear-domain mean in dB "
    "(3gpp cell 0/11, colormap cell 2)",
    """
    SELECT event_type,
           round(10.0 * log10(sum(pow(10.0, value / 10.0))), 5) AS db_sum,
           round(10.0 * log10(avg(pow(10.0, value / 10.0))), 5) AS db_mean,
           count(*) AS n
    FROM events WHERE value <= 100 GROUP BY event_type
    """)
def q18(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(F.col("value") <= 100)
    lin = F.pow(F.lit(10.0), F.col("value") / 10.0)
    return (ev.groupBy("event_type")
              .agg(F.round(10.0 * F.log10(F.sum(lin)), 5).alias("db_sum"),
                   F.round(10.0 * F.log10(F.avg(lin)), 5).alias("db_mean"),
                   F.count("*").alias("n")))


@_q("q19_axis_synthesis",
    "F10 physical axis synthesis + R5 explode (seamf.py:67-115 axis math)",
    """
    SELECT vec_id, unnest(generate_series(0, 624)) AS bin,
           -4992000.0 + unnest(generate_series(0, 624)) * 16000.0 AS x_hz
    FROM embeddings WHERE vec_id < 5
    """)
def q19(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return (emb.where(F.col("vec_id") < 5)
               .select("vec_id", F.explode(F.sequence(F.lit(0), F.lit(624))).alias("bin"))
               .withColumn("x_hz", F.lit(-4992000.0) + F.col("bin") * F.lit(16000.0)))


@_q("q20_cadence_coverage",
    "A13 missed-coverage ratio vs ideal cadence (colormap_plots cell 12)",
    """
    SELECT user_id, count(*) AS n,
           round(count(*) * 86400000000.0 /
                 (max(epoch_us(ts)) - min(epoch_us(ts))), 5) AS events_per_day
    FROM events GROUP BY user_id HAVING count(*) > 1
    """)
def q20(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
              .agg(F.count("*").alias("n"),
                   F.round(F.count("*") * F.lit(86400000000.0) /
                           (F.max("ts_us") - F.min("ts_us")), 5).alias("events_per_day"))
              .where(F.col("n") > 1))


# ---------------------------------------------------------------------------
# 2. Trace/array operators over the embeddings table (axis=1 semantics)
# ---------------------------------------------------------------------------

@_q("q21_trace_stats",
    "A1/A2 per-trace (array-axis) max/min/mean/exact-median "
    "(dask_processing cell 3 median_rms_pfp / max_max_pfp)",
    """
    WITH v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)
    SELECT vec_id,
           round(max(x), 5) AS trace_max,
           round(min(x), 5) AS trace_min,
           round(sum(x) / count(*), 5) AS trace_mean,
           round(CAST(quantile_cont(x, 0.5) AS DOUBLE), 5) AS trace_median
    FROM v GROUP BY vec_id
    """)
def q21(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    v = FN.array_double("embedding")
    return emb.select(
        "vec_id",
        F.round(F.array_max(v), 5).alias("trace_max"),
        F.round(F.array_min(v), 5).alias("trace_min"),
        F.round(FN.array_mean("embedding"), 5).alias("trace_mean"),
        F.round(FN.array_median("embedding"), 5).alias("trace_median"))


@_q("q22_cosine_topk",
    "similarity search: brute-force cosine top-k over embeddings "
    "(BASELINE.json north-star LLM-pipeline op)",
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    z AS (SELECT e.vec_id, CAST(unnest(e.embedding) AS DOUBLE) AS x,
                 CAST(unnest(q.qe) AS DOUBLE) AS y
          FROM embeddings e, q WHERE e.vec_id <> 0),
    s AS (SELECT vec_id, sum(x*y) AS dot,
                 sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
          FROM z GROUP BY vec_id)
    SELECT vec_id, round(dot / (na * nb), 5) AS cos_sim
    FROM s ORDER BY dot / (na * nb) DESC, vec_id LIMIT 10
    """)
def q22(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    j = emb.where(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    dot = F.expr("aggregate(zip_with(embedding, qe, (x, y) -> cast(x as double) * cast(y as double)), 0D, (a, v) -> a + v)")
    na = F.sqrt(F.expr("aggregate(embedding, 0D, (a, x) -> a + cast(x as double) * cast(x as double))"))
    nb = F.sqrt(F.expr("aggregate(qe, 0D, (a, x) -> a + cast(x as double) * cast(x as double))"))
    return (j.withColumn("cos", dot / (na * nb))
             .orderBy(F.desc("cos"), "vec_id")
             .select("vec_id", F.round(F.col("cos"), 5).alias("cos_sim"))
             .limit(10))


@_q("q30_midmean",
    "A5 midmean / trimmed mean between exact q25–q75 (3gpp cell 4)",
    """
    WITH v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
    q AS (SELECT vec_id, CAST(quantile_cont(x, 0.25) AS DOUBLE) AS lo,
                 CAST(quantile_cont(x, 0.75) AS DOUBLE) AS hi
          FROM v GROUP BY vec_id)
    SELECT v.vec_id, round(sum(x) / count(*), 5) AS midmean
    FROM v JOIN q ON v.vec_id = q.vec_id
    WHERE x >= lo AND x <= hi GROUP BY v.vec_id
    """)
def q30(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id",
                      F.round(FN.array_midmean("embedding"), 5).alias("midmean"))


@_q("q31_block_resample",
    "A7 block-resample mean in linear power domain, back to dB "
    "(colormap_plots cell 2 resampledf/dbmean) + R5 explode",
    """
    WITH v AS (SELECT vec_id, CAST(x AS DOUBLE) AS x, i
               FROM (SELECT vec_id, unnest(embedding) AS x,
                            generate_subscripts(embedding, 1) - 1 AS i
                     FROM embeddings))
    SELECT vec_id, i // 8 AS block,
           round(10.0 * log10(avg(pow(10.0, x / 10.0))), 5) AS db_mean
    FROM v GROUP BY vec_id, i // 8
    """)
def q31(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("vec_id", F.posexplode(F.expr("transform(embedding, x -> cast(x as double))")).alias("i", "x"))
    return (ex.groupBy("vec_id", F.expr("i div 8").alias("block"))
              .agg(F.round(10.0 * F.log10(F.avg(F.pow(F.lit(10.0), F.col("x") / 10.0))), 5).alias("db_mean")))


@_q("q32_roll_shift",
    "W4 circular per-row roll by per-capture offset (3gpp cell 4 roll)",
    """
    SELECT vec_id,
           CAST(embedding[((CAST(vec_id % 7 AS INTEGER)) % 64) + 1] AS DOUBLE) AS e0,
           CAST(embedding[((10 + CAST(vec_id % 7 AS INTEGER)) % 64) + 1] AS DOUBLE) AS e10,
           round(list_sum(list_transform(generate_series(0, 7),
                 i -> CAST(embedding[((i + CAST(vec_id % 7 AS INTEGER)) % 64) + 1] AS DOUBLE))), 5) AS head8_sum
    FROM embeddings
    """)
def q32(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    # rolled = concat(slice(v, s+1, n-s), slice(v, 1, s)) — materialize the roll,
    # then read scalar probes off it (array outputs stay scalar for the oracle hash)
    d = emb.withColumn("s", F.expr("cast(vec_id % 7 as int)")) \
           .withColumn("rolled", F.expr(
               "concat(slice(embedding, s + 1, size(embedding) - s), slice(embedding, 1, s))"))
    return d.select(
        "vec_id",
        F.expr("cast(element_at(rolled, 1) as double)").alias("e0"),
        F.expr("cast(element_at(rolled, 11) as double)").alias("e10"),
        F.round(F.expr("aggregate(slice(rolled, 1, 8), 0D, (a, x) -> a + cast(x as double))"), 5).alias("head8_sum"))


@_q("q33_cross_product",
    "J2 cartesian index product (util.py:131-147) → crossJoin",
    "SELECT r_name, n_name FROM region CROSS JOIN nation")
def q33(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@_q("q35_asof_backward",
    "J1 as-of join, backward direction with tolerance (merge_asof semantics; "
    "library FN.asof_join surface)",
    f"""
    WITH u AS (
      SELECT epoch_us(ts) AS ts_us, event_id, NULL::BIGINT AS err_id, 0 AS is_err
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT epoch_us(ts), NULL::BIGINT, event_id, 1
      FROM events WHERE event_type = 'error'
    ), w AS (
      SELECT *,
        last_value(err_id IGNORE NULLS) OVER
          (ORDER BY ts_us, is_err DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_id,
        last_value(CASE WHEN is_err = 1 THEN ts_us END IGNORE NULLS) OVER
          (ORDER BY ts_us, is_err DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts
      FROM u)
    SELECT event_id, ts_us,
      CASE WHEN ts_us - prev_ts <= 3600000000 THEN prev_id END AS err_id,
      CASE WHEN ts_us - prev_ts <= 3600000000 THEN ts_us - prev_ts END AS diff_us
    FROM w WHERE is_err = 0
    """)
def q35(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "purchase").select("event_id", "ts_us")
    right = (ev.where(F.col("event_type") == "error")
               .select(F.col("event_id").alias("err_id"), "ts_us"))
    out = FN.asof_join(left, right, on="ts_us", direction="backward",
                       tolerance=3_600_000_000)
    return out.select("event_id", "ts_us", "err_id",
                      F.col("asof_dist").cast("long").alias("diff_us"))


@_q("q85_asof_by_key",
    "J1 as-of join, BY-KEYED path (the 100 TB form: one shuffle on the by-"
    "key, per-key sorted-union windows — each user's latest purchase at or "
    "before each view, plus the FORWARD leg: first purchase at or after, "
    "both inclusive of equal timestamps like pandas merge_asof); oracle = "
    "correlated max/min subqueries",
    """
    WITH v AS (SELECT event_id, user_id, epoch_us(ts) AS view_us
               FROM events WHERE event_type = 'view'),
    p AS (SELECT user_id, epoch_us(ts) AS t FROM events
          WHERE event_type = 'purchase')
    SELECT v.event_id, v.user_id, v.view_us,
           (SELECT max(p.t) FROM p
            WHERE p.user_id = v.user_id AND p.t <= v.view_us) AS matched_us,
           (SELECT min(p.t) FROM p
            WHERE p.user_id = v.user_id AND p.t >= v.view_us) AS next_us
    FROM v
    """)
def q85(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    left = (ev.where(F.col("event_type") == "view")
              .select("event_id", "user_id",
                      F.col("ts_us").alias("view_us")))
    right = (ev.where(F.col("event_type") == "purchase")
               .select("user_id", F.col("ts_us").alias("view_us"),
                       F.col("ts_us").alias("p_us")))
    back = FN.asof_join(left, right, on="view_us", by=["user_id"],
                        direction="backward", right_cols=["p_us"])
    fwd = FN.asof_join(left, right, on="view_us", by=["user_id"],
                       direction="forward", right_cols=["p_us"])
    return (back.select("event_id", "user_id", "view_us",
                        F.col("p_us").alias("matched_us"))
                .join(fwd.select("event_id",
                                 F.col("p_us").alias("next_us")),
                      "event_id"))


@_q("q36_rayleigh_transform",
    "D8 APD Rayleigh x-transform: x = −10·log10(−ln p) "
    "(seamf_quickplot cell 7 semantics over a synthetic probability)",
    """
    SELECT event_id,
           round((value + 0.5) / 101.0, 9) AS p,
           round(-10.0 * log10(-ln((value + 0.5) / 101.0)), 5) AS rayleigh_x
    FROM events WHERE value >= 0 AND value <= 100
    """)
def q36(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    p = (F.col("value") + 0.5) / 101.0
    return (ev.where(F.col("value").between(0, 100))
              .select("event_id",
                      F.round(p, 9).alias("p"),
                      F.round(FN.rayleigh_amplitude(p), 5).alias("rayleigh_x")))


@_q("q37_embedding_neardup",
    "embedding-cosine near-dup via deterministic quantization buckets "
    "(LSH shape: bucket join replaces the all-pairs cross join; "
    "LLM-pipeline dedup op)",
    """
    WITH b AS (SELECT vec_id, embedding,
                      CAST(floor(embedding[1] * 5) AS INT) AS b1,
                      CAST(floor(embedding[2] * 5) AS INT) AS b2
               FROM embeddings),
    p AS (SELECT a.vec_id AS d1, c.vec_id AS d2,
                 list_sum(list_transform(generate_series(1, 64),
                   i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x)))
                  * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * x)))) AS cos
          FROM b a JOIN b c
            ON a.b1 = c.b1 AND a.b2 = c.b2 AND a.vec_id < c.vec_id)
    SELECT d1, d2, round(cos, 5) AS cos_sim FROM p WHERE cos >= 0.35
    """)
def q37(spark, sf_dir):
    from ..operators.similarity import cosine_pairs
    emb = load_table(spark, sf_dir, "embeddings")
    # quantization cells on the first two dims are the blocking scheme; the
    # per-cell pairwise scores run as one BLAS block product per chunk
    # (cosine_pairs) instead of a per-pair interpreted aggregate expression
    b = emb.select(
        "vec_id", "embedding",
        F.floor(F.element_at("embedding", 1) * 5).cast("int").alias("b1"),
        F.floor(F.element_at("embedding", 2) * 5).cast("int").alias("b2"))
    return cosine_pairs(b, ["b1", "b2"], 0.35)


@_q("q38_bin_aggregate",
    "A6 time-axis aggregate per frame-time bin over a span: explode traces, "
    "GROUP BY bin, linear-domain mean + max (3gpp cell 9 agg_mean/agg_max)",
    """
    WITH v AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                      generate_subscripts(embedding, 1) - 1 AS i
               FROM embeddings WHERE vec_id < 100)
    SELECT i AS bin,
           round(10.0 * log10(avg(pow(10.0, x / 10.0))), 5) AS db_mean,
           round(max(x), 5) AS x_max,
           count(*) AS n
    FROM v GROUP BY i
    """)
def q38(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    ex = (emb.where(F.col("vec_id") < 100)
             .select(F.posexplode(
                 F.expr("transform(embedding, x -> cast(x as double))"))
                 .alias("bin", "x")))
    return (ex.groupBy("bin")
              .agg(F.round(10.0 * F.log10(
                       F.avg(F.pow(F.lit(10.0), F.col("x") / 10.0))), 5)
                   .alias("db_mean"),
                   F.round(F.max("x"), 5).alias("x_max"),
                   F.count("*").alias("n")))


@_q("q39_daily_rollup",
    "tumbling 1-day rollup (batch analog of streaming.daily_rollup; "
    "F13 date bucketing + exact decimal sums)",
    """
    SELECT epoch_us(ts) // 86400000000 AS day_no, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(14,6))) AS DOUBLE) AS value_sum
    FROM events GROUP BY 1, 2
    """)
def q39(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.expr("ts_us div 86400000000").alias("day_no"),
                       "event_type")
              .agg(F.count("*").alias("n"),
                   F.sum(F.col("value").cast("decimal(14,6)"))
                    .cast("double").alias("value_sum")))


@_q("q34_scalar_stats",
    "A10 scalar stats over a column (3gpp cell 4 print block)",
    """
    SELECT round(max(l_extendedprice), 5) AS max_price,
           round(min(l_extendedprice), 5) AS min_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
           round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 5) AS median_price
    FROM lineitem
    """)
def q34(spark, sf_dir):
    # exact interpolated median via sort-rank selection (row_number over
    # the sorted column + pick the two bracketing order statistics)
    # instead of percentile(): the buffering aggregate is interpreted,
    # keeps a value map per expression, and measured 2x the cost once
    # the round-5 noop action stopped count() from pruning it.  The
    # whole pipeline below is codegen.  (Very large single-group
    # cardinality: q94/q117's histogram refinement is the scale path.)
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    ranked = li.select(
        "l_extendedprice",
        F.row_number().over(Window.orderBy("l_extendedprice")).alias("rn"),
        F.count("*").over(Window.partitionBy(F.lit(1))).alias("n"))
    r = (F.col("n") - 1) * F.lit(0.5)
    g = ranked.agg(
        F.round(F.max("l_extendedprice"), 5).alias("max_price"),
        F.round(F.min("l_extendedprice"), 5).alias("min_price"),
        (_dsum(F.col("l_extendedprice"), "12,2") / F.count("*"))
        .alias("avg_price"),
        F.min(F.when(F.col("rn") == F.floor(r) + 1,
                     F.col("l_extendedprice"))).alias("lo"),
        F.min(F.when(F.col("rn") == F.ceil(r) + 1,
                     F.col("l_extendedprice"))).alias("hi"),
        F.max("n").alias("n"))
    rr = (F.col("n") - 1) * F.lit(0.5)
    frac = rr - F.floor(rr)
    return g.select(
        "max_price", "min_price", "avg_price",
        F.round(F.col("lo") + frac * (F.col("hi") - F.col("lo")), 5)
        .alias("median_price"))
