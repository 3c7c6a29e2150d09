"""Round-7 corpus extensions: interval-coverage merge, chi-squared
independence audit, and time-bounded funnel conversion.

Three workload families the corpus did not yet cover:

* q158 is the OTHER canonical interval question next to q155's peak
  concurrency — not "how many at once" but "how much wall-clock was
  covered at all, in how many contiguous busy islands" (utilization /
  uptime accounting).  Gaps-and-islands via the prior-rows running max
  of interval ends, routed through the new
  :func:`functions.keyed_cummax` so the handful-of-event-types sweep
  keeps full parallelism instead of one task per key.
* q159 is the categorical-association audit: a Pearson chi-squared
  independence test over a contingency table (is order priority
  independent of order status?) — the inferential companion to the
  descriptive profiling families (q141 dim profile, q151 Benford,
  q154 entropy).
* q160 is the product-analytics funnel: per 30-day signup cohort, how
  many users progressed view -> click (within 7 days of first view) ->
  purchase (within 7 days of first click).  Unlike q129's CEP regex
  match (any-pattern search over a sequence), the funnel pins STEP
  ANCHORS (first qualifying event per user per step) and time-bounds
  each transition — the conversion-rate query every growth dashboard
  runs.

Scale shapes: q158 is a distinct-instant pre-aggregate followed by two
slice-parallel scans (keyed_cummax + keyed_cumsum — no key-count window
ceiling) and two hash aggregates.  q159 reduces the fact table to a
|priorities|x|statuses| grid in one hash aggregate; everything after is
broadcast arithmetic on <=15 rows.  q160 is three filtered hash
aggregates over events plus two high-cardinality equi-joins on user_id
(never a range join: the 7-day bound is a filter on the joined pair,
applied after an equi-join whose build side is one row per user).

Float parity per corpus.py rules: q158 is pure integer arithmetic end to
end.  q159 computes expected counts and chi-squared terms with the same
IEEE op sequence on both engines from identical integers, then
floor-quantizes each term BEFORE the cross-cell sum (integer sum —
order-proof, the q137 KL precedent).  q160's two conversion ratios are
single double divisions of integer counts, floor-quantized.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .. import functions as FN
from .corpus import _q
from .tables import load_table

_DAY_US = 86_400_000_000
_WEEK_US = 7 * _DAY_US
_COHORT_US = 30 * _DAY_US


@_q("q158_interval_coverage",
    "interval-coverage merge (gaps-and-islands union length): each "
    "event opens [ts, ts + value seconds); per event_type, merge "
    "overlapping/touching intervals into islands and report total "
    "covered micros, island count, and the longest island.  Island "
    "boundaries come from the PRIOR-rows running max of interval ends "
    "(keyed_cummax inclusive=False — slice-parallel, not a "
    "key-count-task window); island ids from keyed_cumsum over the "
    "boundary flags.  Ties pre-aggregated away (distinct start instant "
    "keeps its max end) so both scans see unique order keys",
    """
    WITH iv AS (
      SELECT event_type,
             epoch_us(ts) AS s,
             max(epoch_us(ts)
                 + CAST(floor(value * 100 + 0.5) AS BIGINT) * 10000) AS e
      FROM events GROUP BY 1, 2),
    pm AS (
      SELECT event_type, s, e,
             max(e) OVER (PARTITION BY event_type ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM iv),
    fl AS (
      SELECT event_type, s, e,
             CASE WHEN prev_max IS NULL OR s > prev_max
                  THEN 1 ELSE 0 END AS flag
      FROM pm),
    isl AS (
      SELECT event_type, s, e,
             sum(flag) OVER (PARTITION BY event_type ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
      FROM fl),
    g AS (
      SELECT event_type, gid, min(s) AS s0, max(e) AS e1
      FROM isl GROUP BY 1, 2)
    SELECT event_type,
           CAST(sum(e1 - s0) AS BIGINT) AS covered_us,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(e1 - s0) AS BIGINT) AS longest_us
    FROM g GROUP BY 1 ORDER BY 1
    """)
def q158(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # duration recipe identical to q155: value carries 2 decimal digits,
    # floor(value*100 + 0.5) is exact on both engines (never within an
    # ulp of a half boundary), so s/e are pure integers.
    dur = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint") * 10000
    iv = (ev.select("event_type", F.col("ts_us").alias("s"),
                    (F.col("ts_us") + dur).alias("e"))
          # unique order keys per group (keyed_* tie precondition): a
          # start instant keeps only its farthest-reaching end — island
          # structure is unchanged, the scans become deterministic
          .groupBy("event_type", "s").agg(F.max("e").alias("e")))
    pm = FN.keyed_cummax(iv, ["event_type"], ["s"], "e",
                         out="prev_max", inclusive=False)
    fl = pm.withColumn(
        "flag",
        F.when(F.col("prev_max").isNull()
               | (F.col("s") > F.col("prev_max")), 1).otherwise(0))
    isl = FN.keyed_cumsum(fl, ["event_type"], ["s"], "flag", out="gid")
    g = (isl.groupBy("event_type", "gid")
         .agg(F.min("s").alias("s0"), F.max("e").alias("e1")))
    return (g.groupBy("event_type")
            .agg(F.sum(F.col("e1") - F.col("s0")).cast("bigint")
                 .alias("covered_us"),
                 F.count("*").cast("bigint").alias("n_islands"),
                 F.max(F.col("e1") - F.col("s0")).cast("bigint")
                 .alias("longest_us"))
            .orderBy("event_type"))


@_q("q159_chi_squared",
    "Pearson chi-squared independence test: is o_orderpriority "
    "independent of o_orderstatus?  One hash aggregate reduces orders "
    "to the observed contingency grid; marginals, expected counts "
    "e = r*c/N, and per-cell terms (obs-e)^2/e are broadcast "
    "arithmetic on <=15 rows.  Zero-observation cells enter via the "
    "marginal cross grid (their term is e).  Per-cell terms are "
    "floor-quantized to 1e-9 BEFORE the cross-cell sum, making the "
    "statistic an integer sum — order-proof across engines",
    """
    WITH obs AS (
      SELECT o_orderpriority AS p, o_orderstatus AS s,
             CAST(count(*) AS BIGINT) AS obs
      FROM orders GROUP BY 1, 2),
    r AS (SELECT p, CAST(sum(obs) AS BIGINT) AS r FROM obs GROUP BY 1),
    c AS (SELECT s, CAST(sum(obs) AS BIGINT) AS c FROM obs GROUP BY 1),
    n AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM obs),
    cells AS (
      SELECT r.p, c.s, r.r, c.c, n.n, coalesce(o.obs, 0) AS obs
      FROM r CROSS JOIN c CROSS JOIN n
      LEFT JOIN obs o ON o.p = r.p AND o.s = c.s),
    t AS (
      SELECT p, s, obs, n,
             CAST(r * c AS DOUBLE) / n AS e
      FROM cells),
    t2 AS (
      SELECT p, s, obs, n, e,
             (CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e) / e
               AS term
      FROM t),
    tot AS (
      SELECT CAST(sum(CAST(floor(term * 1000000000) AS BIGINT)) AS DOUBLE)
               / 1000000000.0 AS chi2,
             CAST((count(DISTINCT p) - 1) * (count(DISTINCT s) - 1)
               AS BIGINT) AS dof
      FROM t2)
    SELECT t2.p AS o_orderpriority, t2.s AS o_orderstatus,
           CAST(t2.obs AS BIGINT) AS obs,
           floor(t2.e * 1000000) / 1000000.0 AS expected,
           floor(t2.term * 1000000000) / 1000000000.0 AS contrib,
           tot.chi2, tot.dof, CAST(t2.n AS BIGINT) AS n
    FROM t2 CROSS JOIN tot
    ORDER BY 1, 2
    """)
def q159(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    obs = (o.groupBy(F.col("o_orderpriority").alias("p"),
                     F.col("o_orderstatus").alias("s"))
           .agg(F.count("*").cast("bigint").alias("obs")))
    # NOTE: no localCheckpoint here — the r8 driver bench proved the
    # q159 digest flips with session context, and the round-9 probe
    # pinned the cause on RewriteDistinctAggregates (see dof below),
    # not on recompute cost: every frame past `obs` is <=15 rows.
    r = obs.groupBy("p").agg(F.sum("obs").cast("bigint").alias("r"))
    c = obs.groupBy("s").agg(F.sum("obs").cast("bigint").alias("c"))
    n = obs.agg(F.sum("obs").cast("bigint").alias("n"))
    cells = (r.crossJoin(F.broadcast(c)).crossJoin(F.broadcast(n))
             .join(obs.withColumnRenamed("obs", "o_obs"), ["p", "s"],
                   "left")
             .withColumn("obs", F.coalesce("o_obs", F.lit(0).cast("bigint")))
             .drop("o_obs"))
    # identical IEEE op sequence on both engines from identical integer
    # inputs: one exact BIGINT product, one double division, then
    # subtract/square/divide — floor-quantize per cell, sum integers
    e = (F.col("r") * F.col("c")).cast("double") / F.col("n")
    t = cells.withColumn("e", e)
    d = F.col("obs").cast("double") - F.col("e")
    t2 = t.withColumn("term", d * d / F.col("e"))
    # dof comes from the marginal frames' row counts, NOT from two
    # countDistincts in one aggregate: Catalyst's
    # RewriteDistinctAggregates compiles multi-distinct through an
    # Expand whose gid-group ordering follows session expression-id
    # state, so the SAME query text produced digest e576 in a fresh
    # session and 945b mid-bench (the r8 "digest_changed: [q159]"
    # false alarm).  count(*) over r/c is semantically identical
    # (r has one row per distinct p, c one per distinct s) and
    # compiles to a deterministic plan.
    nr = r.agg(F.count("*").cast("bigint").alias("nr"))
    nc = c.agg(F.count("*").cast("bigint").alias("nc"))
    tot = (t2.agg(
        (F.sum(F.floor(F.col("term") * 1000000000).cast("bigint"))
         .cast("double") / F.lit(1000000000.0)).alias("chi2"))
        .crossJoin(F.broadcast(nr)).crossJoin(F.broadcast(nc))
        .select("chi2",
                ((F.col("nr") - 1) * (F.col("nc") - 1))
                .cast("bigint").alias("dof")))
    return (t2.crossJoin(F.broadcast(tot))
            .select(F.col("p").alias("o_orderpriority"),
                    F.col("s").alias("o_orderstatus"),
                    F.col("obs").cast("bigint").alias("obs"),
                    (F.floor(F.col("e") * 1000000) / F.lit(1000000.0))
                    .alias("expected"),
                    (F.floor(F.col("term") * 1000000000)
                     / F.lit(1000000000.0)).alias("contrib"),
                    "chi2", "dof",
                    F.col("n").cast("bigint").alias("n"))
            .orderBy("o_orderpriority", "o_orderstatus"))


@_q("q160_funnel_conversion",
    "time-bounded funnel conversion per 30-day cohort: anchor = each "
    "user's FIRST view; step 2 = first click within 7 days of the "
    "anchor; step 3 = first purchase within 7 days of that click.  "
    "Cohort = anchor epoch-30-day bucket.  Counts per step plus "
    "floor-quantized conversion ratios (0.0, not NULL, when a cohort "
    "has no clicks — keeps the output float-parity-safe).  Two "
    "equi-joins on user_id with the time bound as a post-join filter — "
    "never a range join",
    """
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS v_us
      FROM events WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS c_us
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click'
        AND epoch_us(e.ts) >= v.v_us
        AND epoch_us(e.ts) < v.v_us + 604800000000
      GROUP BY 1),
    p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase'
        AND epoch_us(e.ts) >= c.c_us
        AND epoch_us(e.ts) < c.c_us + 604800000000
      GROUP BY 1),
    u AS (
      SELECT v.user_id, v.v_us // 2592000000000 AS cohort,
             c.c_us, p.p_us
      FROM v LEFT JOIN c ON c.user_id = v.user_id
             LEFT JOIN p ON p.user_id = v.user_id),
    g AS (
      SELECT cohort,
             CAST(count(*) AS BIGINT) AS n_view,
             CAST(count(c_us) AS BIGINT) AS n_click,
             CAST(count(p_us) AS BIGINT) AS n_purchase
      FROM u GROUP BY 1)
    SELECT CAST(cohort AS BIGINT) AS cohort, n_view, n_click, n_purchase,
           floor(CAST(n_click AS DOUBLE) / n_view * 1000000)
             / 1000000.0 AS r_click,
           CASE WHEN n_click = 0 THEN 0.0
                ELSE floor(CAST(n_purchase AS DOUBLE) / n_click * 1000000)
                     / 1000000.0 END AS r_purchase
    FROM g ORDER BY cohort
    """)
def q160(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    v = (ev.where(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts_us").alias("v_us")))
    v = v.localCheckpoint(eager=False)
    clicks = ev.where(F.col("event_type") == "click") \
               .select("user_id", "ts_us")
    c = (clicks.join(v, "user_id")
         .where((F.col("ts_us") >= F.col("v_us"))
                & (F.col("ts_us") < F.col("v_us") + F.lit(_WEEK_US)))
         .groupBy("user_id").agg(F.min("ts_us").alias("c_us")))
    c = c.localCheckpoint(eager=False)
    purch = ev.where(F.col("event_type") == "purchase") \
              .select("user_id", "ts_us")
    p = (purch.join(c, "user_id")
         .where((F.col("ts_us") >= F.col("c_us"))
                & (F.col("ts_us") < F.col("c_us") + F.lit(_WEEK_US)))
         .groupBy("user_id").agg(F.min("ts_us").alias("p_us")))
    u = (v.withColumn("cohort", F.expr(f"v_us div {_COHORT_US}"))
         .join(c, "user_id", "left")
         .join(p, "user_id", "left"))
    g = (u.groupBy("cohort")
         .agg(F.count("*").cast("bigint").alias("n_view"),
              F.count("c_us").cast("bigint").alias("n_click"),
              F.count("p_us").cast("bigint").alias("n_purchase")))
    r_click = (F.floor(F.col("n_click").cast("double") / F.col("n_view")
                       * 1000000) / F.lit(1000000.0))
    r_purchase = F.when(F.col("n_click") == 0, F.lit(0.0)).otherwise(
        F.floor(F.col("n_purchase").cast("double") / F.col("n_click")
                * 1000000) / F.lit(1000000.0))
    return (g.select(F.col("cohort").cast("bigint").alias("cohort"),
                     "n_view", "n_click", "n_purchase",
                     r_click.alias("r_click"),
                     r_purchase.alias("r_purchase"))
            .orderBy("cohort"))
