"""Round-6 corpus extensions: peak-concurrency sweep line and seasonal
day-of-week anomaly detection.

Both fill monitoring-workload gaps (SURVEY.md §2.12 round-6 row) rather
than re-covering §2: q155 is the canonical interval-overlap question
("how many captures/sessions were in flight at once, and when did the
high-water mark happen") answered with the endpoint sweep line — the
shape every resource-utilization audit runs; q156 is seasonal anomaly
surfacing (daily totals scored against their own day-of-week baseline),
the weekday/weekend-aware variant of plain z-scoring.

Scale shapes: q155 routes its running occupancy through
``functions.keyed_cumsum`` — the two-phase parallel prefix sum (local
running sums per order-domain slice + a broadcast exclusive prefix of
per-slice totals), so the handful-of-event-types series never serializes
onto key-count tasks the way a plain ``PARTITION BY event_type`` window
would.  q156 is a daily pre-aggregate (bounds all later stages at
keys×days rows) joined to a broadcast keys×7 baseline.

Float parity per corpus.py rules: q155 is pure integer arithmetic end to
end (epoch micros, +1/-1 deltas; durations derived via floor(x+0.5) on a
double that is never near a half boundary).  q156 sums daily values as
exact DECIMALs, derives mean/variance from the exact sufficient
statistics with pure IEEE ops (identical doubles on both engines — the
q144 rolling-correlation precedent), and floor-quantizes only the output
z-score.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .. import functions as FN
from .corpus import _q
from .tables import load_table

_DAY_US = 86_400_000_000


@_q("q155_peak_concurrency",
    "interval-overlap sweep line: each event opens an interval "
    "[ts, ts + value seconds); endpoints become +1/-1 deltas, net "
    "delta per (type, instant) is pre-aggregated (ties away — makes "
    "the running sum frame-agnostic AND map-side combinable), the "
    "running occupancy is a keyed_cumsum (slice-parallel prefix sum, "
    "not a key-count-task window), and the answer is each type's "
    "high-water mark with the earliest instant it was reached "
    "(single max(struct(occ, -t)) aggregate)",
    """
    WITH iv AS (
      SELECT event_type,
             epoch_us(ts) AS s,
             epoch_us(ts)
               + CAST(floor(value * 100 + 0.5) AS BIGINT) * 10000 AS e
      FROM events),
    deltas AS (
      SELECT event_type, s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS d FROM iv),
    agg AS (
      SELECT event_type, t, CAST(sum(d) AS BIGINT) AS d
      FROM deltas GROUP BY 1, 2),
    occ AS (
      SELECT event_type, t,
             CAST(sum(d) OVER (PARTITION BY event_type ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS occ
      FROM agg),
    mx AS (SELECT event_type, max(occ) AS peak FROM occ GROUP BY 1)
    SELECT o.event_type, m.peak,
           CAST(min(o.t) AS BIGINT) AS peak_at_us
    FROM occ o
    JOIN mx m ON o.event_type = m.event_type AND o.occ = m.peak
    GROUP BY o.event_type, m.peak
    ORDER BY o.event_type
    """)
def q155(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # duration = value seconds.  value carries 2 decimal digits, so
    # value*100 is integer ± 1 ulp; floor(x + 0.5) is exact on both
    # engines because x + 0.5 is never within an ulp of an integer
    # (DuckDB CAST(double AS BIGINT) rounds where Spark truncates — the
    # raw cast would flip on negative-ulp values).
    dur = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint") * 10000
    iv = ev.select("event_type", F.col("ts_us").alias("s"),
                   (F.col("ts_us") + dur).alias("e"))
    deltas = iv.select("event_type", F.col("s").alias("t"),
                       F.lit(1).alias("d")).unionAll(
        iv.select("event_type", F.col("e").alias("t"),
                  F.lit(-1).alias("d")))
    # net delta per instant: unique order keys per type (keyed_cumsum's
    # tie precondition) and a map-side-combinable pre-aggregation — the
    # sweep input shrinks to distinct timestamps before any window
    agg = (deltas.groupBy("event_type", "t")
           .agg(F.sum("d").cast("bigint").alias("d")))
    occ = FN.keyed_cumsum(agg, ["event_type"], ["t"], "d", out="occ")
    # earliest instant at the max: one aggregate — struct ordering gives
    # (max occ, then max -t = min t)
    peak = occ.groupBy("event_type").agg(
        F.max(F.struct(F.col("occ").alias("o"),
                       (-F.col("t")).alias("nt"))).alias("mx"))
    return (peak.select("event_type",
                        F.col("mx.o").cast("bigint").alias("peak"),
                        (-F.col("mx.nt")).cast("bigint")
                        .alias("peak_at_us"))
            .orderBy("event_type"))


@_q("q157_pit_features",
    "point-in-time feature backfill (the feature-store training-data "
    "op): for every purchase event, that user's click count and exact "
    "decimal click-value sum over the 7 days STRICTLY BEFORE the "
    "purchase day — leakage-free as-of features.  Expressed as a "
    "day-bucket offset EQUI-join (daily pre-aggregate x 7 exploded "
    "offsets, q139's trick), never a range/theta join: at 100 TB the "
    "range form rewrites to a per-day-pair equi-shuffle while this is "
    "one already.  Anchors with no prior clicks keep zero rows via the "
    "left join (feature completeness)",
    """
    WITH clicks AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS v
      FROM events WHERE event_type = 'click' GROUP BY 1, 2),
    anchors AS (
      SELECT event_id, user_id, epoch_us(ts) // 86400000000 AS day
      FROM events WHERE event_type = 'purchase'),
    contrib AS (
      SELECT a.event_id, c.n, c.v
      FROM anchors a
      CROSS JOIN generate_series(1, 7) AS t(k)
      JOIN clicks c ON c.user_id = a.user_id AND c.day = a.day - t.k),
    g AS (
      SELECT event_id, CAST(sum(n) AS BIGINT) AS n7,
             CAST(sum(v) AS DOUBLE) AS v7
      FROM contrib GROUP BY 1)
    SELECT a.event_id, coalesce(g.n7, 0) AS n_clicks_7d,
           coalesce(g.v7, 0.0) AS click_value_7d
    FROM anchors a LEFT JOIN g USING (event_id)
    ORDER BY a.event_id
    """)
def q157(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    clicks = (ev.where(F.col("event_type") == "click")
              .groupBy("user_id",
                       F.expr(f"ts_us div {_DAY_US}").alias("day"))
              .agg(F.count("*").cast("bigint").alias("n"),
                   F.sum(F.col("value").cast("decimal(12,2)"))
                   .cast("decimal(18,2)").alias("v")))
    anchors = (ev.where(F.col("event_type") == "purchase")
               .select("event_id", "user_id",
                       F.expr(f"ts_us div {_DAY_US}").alias("day")))
    offs = (anchors.select(
        "event_id", "user_id", "day",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("k"))
        .select("event_id", "user_id",
                (F.col("day") - F.col("k")).alias("day")))
    g = (offs.join(clicks, ["user_id", "day"])
         .groupBy("event_id")
         .agg(F.sum("n").cast("bigint").alias("n7"),
              F.sum("v").cast("double").alias("v7")))
    return (anchors.join(g, "event_id", "left")
            .select("event_id",
                    F.coalesce("n7", F.lit(0).cast("bigint"))
                    .alias("n_clicks_7d"),
                    F.coalesce("v7", F.lit(0.0)).alias("click_value_7d"))
            .orderBy("event_id"))


@_q("q156_seasonal_anomaly",
    "seasonal anomaly surfacing: per-(event_type, day) totals scored "
    "against their own (event_type, day-of-week) baseline — "
    "z = (x - mean) / stddev_pop from EXACT decimal sufficient "
    "statistics (sum, sum-of-squares as DECIMAL, cast once), flag "
    "|z| >= 1.5 (the 2-sigma textbook cut flags nothing on the tame "
    "synthetic series at any SF — an empty result would make the "
    "driver check vacuous).  Day-of-week is pure integer arithmetic "
    "on the epoch "
    "day index (1970-01-01 + 4 ≡ Sunday-origin), timezone-proof on "
    "both engines.  The baseline is a keys×7 broadcast join; the "
    "daily pre-aggregate bounds every later stage",
    """
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS v
      FROM events GROUP BY 1, 2),
    base AS (
      SELECT event_type, (day + 4) % 7 AS dow,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS DOUBLE) AS sx,
             CAST(sum(CAST(v * v AS DECIMAL(38,4))) AS DOUBLE) AS sx2
      FROM daily GROUP BY 1, 2),
    sel AS (
      SELECT d.event_type, d.day, (d.day + 4) % 7 AS dow,
             CAST(d.v AS DOUBLE) AS x, b.n, b.sx, b.sx2
      FROM daily d
      JOIN base b ON b.event_type = d.event_type
                 AND b.dow = (d.day + 4) % 7
      WHERE b.n >= 4),
    z AS (
      SELECT event_type, day, dow, x,
             (x - sx / n) / sqrt((sx2 - sx * sx / n) / n) AS zval,
             (sx2 - sx * sx / n) / n AS varp
      FROM sel)
    SELECT event_type, CAST(day AS BIGINT) AS day,
           CAST(dow AS BIGINT) AS dow, x AS daily_total,
           floor(zval * 1000000) / 1000000.0 AS z
    FROM z
    WHERE varp > 0 AND abs(zval) >= 1.5
    ORDER BY event_type, day
    """)
def q156(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.expr(f"ts_us div {_DAY_US}").alias("day"))
             .agg(F.sum(F.col("value").cast("decimal(12,2)"))
                  .cast("decimal(18,2)").alias("v")))
    daily = daily.localCheckpoint(eager=False)
    dow = (F.col("day") + 4) % 7
    # exact sufficient statistics: decimal sums cast to double ONCE —
    # every downstream mean/var/z op is then identical IEEE arithmetic
    # on identical doubles (the q144 rolling-correlation precedent)
    base = (daily.groupBy("event_type", dow.alias("dow"))
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.sum("v").cast("double").alias("sx"),
                 F.sum((F.col("v") * F.col("v")).cast("decimal(38,4)"))
                 .cast("double").alias("sx2"))
            .where(F.col("n") >= 4))
    sel = (daily.withColumn("dow", dow)
           .join(F.broadcast(base), ["event_type", "dow"])
           .select("event_type", "day", "dow",
                   F.col("v").cast("double").alias("x"),
                   "n", "sx", "sx2"))
    mean = F.col("sx") / F.col("n")
    varp = (F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")) \
        / F.col("n")
    zval = (F.col("x") - mean) / F.sqrt(varp)
    return (sel.withColumn("varp", varp).withColumn("zval", zval)
            .where((F.col("varp") > 0) & (F.abs(F.col("zval")) >= 1.5))
            .select("event_type", F.col("day").cast("bigint").alias("day"),
                    F.col("dow").cast("bigint").alias("dow"),
                    F.col("x").alias("daily_total"),
                    (F.floor(F.col("zval") * 1000000)
                     / F.lit(1000000.0)).alias("z"))
            .orderBy("event_type", "day"))
