"""Round-5 corpus extensions: decay-weighted smoothing (EWMA), an
order-independent table fingerprint, per-dimension embedding profiling,
token<->label mutual information, gap interpolation over a sparse
series, rolling correlation, bounded reachability, weighted sampling,
gaps-and-islands streaks, SCD2 change-log compaction, a Lloyd k-means
step, CUSUM changepoint detection, and a Benford first-digit audit.

Like the round-4 set, these fill genuine workload gaps rather than
re-covering SURVEY.md §2: q139/q143 are the irregular-time-series
smoothing and repair shapes (monitoring, sensor pipelines), q140 is the
cross-engine data-integrity check every 100 TB migration runs (copy
verified by checksum, not by re-reading both sides through one engine),
q141/q142 are embedding-column and feature-selection audits from the
LLM-pipeline toolbox.

Float parity per corpus.py rules: money sums in DECIMAL, transcendental
per-term values rounded then summed as DECIMAL (associative —
order-proof), per-row scalar expressions on integer inputs are
deterministic as-is, no raw timestamps (day indexes are epoch-micros
div 86400000000).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from .corpus import _q
from .tables import load_table, register_tables

_DAY_US = 86_400_000_000


@_q("q139_ewma_daily",
    "exponentially-weighted moving average over the per-day revenue "
    "series of each event_type (half-life = 1 day, 8-day support): "
    "EWMA(d) = sum_k 0.5^k * v(d-k) / sum_k 0.5^k over the days that "
    "exist — decay smoothing for irregular series, expressed as an "
    "offset-explode EQUI-join (day-k key match), never a range/theta "
    "join.  Weighted terms are EXACT decimals (v carries 2 digits, "
    "0.5^k at most 9), summed losslessly — order-proof with no "
    "rounding anywhere; only the final quotient is floor-quantized to "
    "6 decimals (pure IEEE ops, engine-identical)",
    """
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS v
      FROM events GROUP BY 1, 2),
    contrib AS (
      SELECT d.event_type, d.day,
             CAST(d2.v * CAST(pow(0.5, t.k) AS DECIMAL(11,9))
                  AS DECIMAL(30,11)) AS term,
             CAST(pow(0.5, t.k) AS DECIMAL(11,9)) AS w
      FROM daily d
      CROSS JOIN generate_series(0, 7) AS t(k)
      JOIN daily d2 ON d2.event_type = d.event_type
                   AND d2.day = d.day - t.k)
    SELECT event_type, CAST(day AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS n_obs,
           floor(CAST(sum(term) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
                 * 1000000) / 1000000.0 AS ewma
    FROM contrib GROUP BY event_type, day
    ORDER BY event_type, day
    """)
def q139(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.expr(f"ts_us div {_DAY_US}").alias("day"))
             .agg(F.sum(F.col("value").cast("decimal(12,2)"))
                  .cast("decimal(18,2)").alias("v")))
    # the daily relation anchors the output AND supplies the decayed
    # contributors — two branches over one aggregate; materialize once
    # (lazy localCheckpoint, the q128/q135 multi-branch persist)
    daily = daily.localCheckpoint(eager=False)
    anchors = daily.select(
        "event_type", "day",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("k"))
    # contributor side renamed BEFORE the join: anchors and d2 share the
    # checkpointed lineage, so same-name refs would be an ambiguous
    # self-join
    d2 = daily.select(F.col("event_type").alias("c_type"),
                      F.col("day").alias("c_day"),
                      F.col("v").alias("c_v"))
    # terms are EXACT decimals, no rounding anywhere: v carries 2
    # decimal digits and 0.5^k (k<=7) carries 9, so v*w is exact in
    # DECIMAL(30,11) — per-term round() was the first attempt and both
    # engines disagreed on its half boundaries
    wdec = F.pow(F.lit(0.5), F.col("k")).cast("decimal(11,9)")
    contrib = (anchors.join(
        d2, (F.col("event_type") == F.col("c_type"))
        & (F.col("c_day") == F.col("day") - F.col("k")))
        .select("event_type", "day",
                (F.col("c_v") * wdec).cast("decimal(30,11)").alias("term"),
                wdec.alias("w")))
    # floor-quantize rather than round(x, 6): the quotient double is
    # bit-identical on both engines, but round() is BigDecimal-exact in
    # Spark vs FP-trick in DuckDB and the two disagree on half
    # boundaries (hit at sf0.001, day 19752).  floor(x*1e6)/1e6 is pure
    # IEEE arithmetic — identical everywhere.
    q6 = (F.floor(F.sum("term").cast("double")
                  / F.sum("w").cast("double") * 1000000)
          / F.lit(1000000.0))
    return (contrib.groupBy("event_type", "day")
            .agg(F.count("*").cast("bigint").alias("n_obs"),
                 q6.alias("ewma"))
            .select("event_type", F.col("day").cast("bigint").alias("day"),
                    "n_obs", "ewma")
            .orderBy("event_type", "day"))


@_q("q140_table_fingerprint",
    "order-independent table fingerprint per l_returnflag partition: "
    "each row canonicalizes its key columns to one string, hashes to a "
    "60-bit integer (md5 prefix — identical bytes on any engine, unlike "
    "engine-native hash()), and the partition digest is bit_xor(h) + "
    "row count + a modular checksum.  XOR is commutative/associative, "
    "so the digest is independent of row order, partitioning, and "
    "parallelism — the cross-engine integrity check a 100 TB copy is "
    "verified with (source and destination compute digests "
    "independently; only 3 rows cross the wire).  Row canonicalization "
    "is injective (round-6): every column length-prefixes its string "
    "form (<chars>:<value>, NULL = bare 'N'), so NULL-shifted and "
    "delimiter-bearing corruptions change the digest — concat_ws alone "
    "silently dropped NULL columns.  DuckDB's concat ignores NULLs, so "
    "the oracle uses || (NULL-propagating) inside the coalesce",
    """
    WITH h AS (
      SELECT l_returnflag,
             CAST(('0x' || substr(md5(concat_ws('|',
                    coalesce(CAST(length(CAST(l_orderkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_orderkey AS VARCHAR), 'N'),
                    coalesce(CAST(length(CAST(l_partkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR), 'N'),
                    coalesce(CAST(length(CAST(l_suppkey AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_suppkey AS VARCHAR), 'N'),
                    coalesce(CAST(length(CAST(l_linenumber AS VARCHAR)) AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR), 'N'),
                    coalesce(CAST(length(l_returnflag) AS VARCHAR) || ':' || l_returnflag, 'N'),
                    coalesce(CAST(length(l_linestatus) AS VARCHAR) || ':' || l_linestatus, 'N'))), 1, 15)) AS BIGINT) AS hv
      FROM lineitem)
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(hv) AS BIGINT) AS fingerprint,
           CAST(sum(hv % 1000003) AS BIGINT) AS mod_checksum
    FROM h GROUP BY l_returnflag ORDER BY l_returnflag
    """)
def q140(spark, sf_dir):
    register_tables(spark, sf_dir, ["lineitem"])
    # same injective <chars>:<value> / 'N' canonicalization as
    # functions.table_fingerprint (Spark concat propagates NULL, so
    # concat is safe here where DuckDB needed ||)
    enc = ("coalesce(concat(CAST(length(CAST({0} AS STRING)) AS STRING), "
           "':', CAST({0} AS STRING)), 'N')")
    cols = ", ".join(enc.format(c) for c in (
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus"))
    return spark.sql(f"""
    WITH h AS (
      SELECT l_returnflag,
             CAST(conv(substr(md5(concat_ws('|', {cols})), 1, 15), 16, 10)
                  AS BIGINT) AS hv
      FROM lineitem)
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(hv) AS BIGINT) AS fingerprint,
           CAST(sum(hv % 1000003) AS BIGINT) AS mod_checksum
    FROM h GROUP BY l_returnflag ORDER BY l_returnflag
    """)


@_q("q141_embedding_dim_profile",
    "per-dimension profile of the embedding column (the feature-audit "
    "pass before training: dead dimensions, scale outliers, drift "
    "candidates): posexplode each vector, then per dimension n / mean / "
    "population std / min / max.  Components are rounded to fixed "
    "decimals and summed as DECIMAL (order-proof); float32 inputs are "
    "exact in DECIMAL(20,8) so sum(x) carries no FP reorder noise at "
    "all.  Map-side explode + one 64-key aggregate — no shuffle wider "
    "than the dimension count at any data scale",
    """
    WITH x AS (
      SELECT unnest(range(1, len(embedding) + 1)) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    s AS (
      SELECT dim, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(x, 8) AS DECIMAL(20,8)))
                  AS DOUBLE) AS sx,
             CAST(sum(CAST(round(x * x, 12) AS DECIMAL(30,12)))
                  AS DOUBLE) AS sxx,
             round(min(x), 6) AS min_x, round(max(x), 6) AS max_x
      FROM x GROUP BY dim)
    SELECT CAST(dim AS INT) AS dim, n,
           round(sx / n, 6) AS mean_x,
           round(sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0.0)), 6)
             AS std_x,
           min_x, max_x
    FROM s ORDER BY dim
    """)
def q141(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(F.posexplode("embedding").alias("pos", "xf")) \
         .select((F.col("pos") + 1).alias("dim"),
                 F.col("xf").cast("double").alias("x"))
    s = (x.groupBy("dim")
         .agg(F.count("*").cast("bigint").alias("n"),
              F.sum(F.round("x", 8).cast("decimal(20,8)"))
              .cast("double").alias("sx"),
              F.sum(F.round(F.col("x") * F.col("x"), 12)
                    .cast("decimal(30,12)")).cast("double").alias("sxx"),
              F.round(F.min("x"), 6).alias("min_x"),
              F.round(F.max("x"), 6).alias("max_x")))
    mean = F.col("sx") / F.col("n")
    var = F.greatest(F.col("sxx") / F.col("n") - mean * mean, F.lit(0.0))
    return (s.select(F.col("dim").cast("int").alias("dim"), "n",
                     F.round(mean, 6).alias("mean_x"),
                     F.round(F.sqrt(var), 6).alias("std_x"),
                     "min_x", "max_x")
            .orderBy("dim"))


@_q("q142_token_label_mi",
    "feature selection by mutual information between token PRESENCE "
    "(distinct per doc) and the binary label lang='en': per token the "
    "2x2 contingency table comes from one distinct-pair aggregate plus "
    "broadcast 1-row corpus totals, MI = sum nij/N * ln(N*nij/(ni*nj)) "
    "with empty cells contributing zero.  Every MI value is a scalar "
    "expression over INTEGER counts — bit-identical on both engines, no "
    "DECIMAL machinery needed.  Top 20 tokens by MI (token tiebreak), "
    "min document frequency 5",
    """
    WITH dt AS (
      SELECT DISTINCT doc_id, CAST(lang = 'en' AS INT) AS is_en, tok
      FROM (SELECT doc_id, lang,
                   unnest(string_split_regex(lower(trim(text)), '\\s+'))
                     AS tok
            FROM documents)
      WHERE tok <> '' AND length(tok) >= 3),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CAST(lang = 'en' AS INT)) AS BIGINT) AS n_en
            FROM documents),
    c AS (SELECT tok, CAST(sum(is_en) AS BIGINT) AS n11,
                 CAST(sum(1 - is_en) AS BIGINT) AS n10
          FROM dt GROUP BY tok HAVING count(*) >= 5),
    m AS (
      SELECT tok, n11, n10, n_docs, n_en,
             n_en - n11 AS n01, n_docs - n_en - n10 AS n00,
             n11 + n10 AS dfreq
      FROM c CROSS JOIN tot),
    mi AS (
      SELECT tok, dfreq, n11, n10,
        round(
          (CASE WHEN n11 > 0 THEN (CAST(n11 AS DOUBLE)/n_docs)
              * ln(CAST(n_docs AS DOUBLE)*n11/(CAST(dfreq AS DOUBLE)*n_en))
            ELSE 0 END)
        + (CASE WHEN n10 > 0 THEN (CAST(n10 AS DOUBLE)/n_docs)
              * ln(CAST(n_docs AS DOUBLE)*n10
                   /(CAST(dfreq AS DOUBLE)*(n_docs - n_en)))
            ELSE 0 END)
        + (CASE WHEN n01 > 0 THEN (CAST(n01 AS DOUBLE)/n_docs)
              * ln(CAST(n_docs AS DOUBLE)*n01
                   /(CAST(n_docs - dfreq AS DOUBLE)*n_en))
            ELSE 0 END)
        + (CASE WHEN n00 > 0 THEN (CAST(n00 AS DOUBLE)/n_docs)
              * ln(CAST(n_docs AS DOUBLE)*n00
                   /(CAST(n_docs - dfreq AS DOUBLE)*(n_docs - n_en)))
            ELSE 0 END), 10) AS mi
      FROM m)
    SELECT tok, dfreq, n11, n10, mi
    FROM mi ORDER BY mi DESC, tok LIMIT 20
    """)
def q142(spark, sf_dir):
    register_tables(spark, sf_dir, ["documents"])
    return spark.sql("""
    WITH dt AS (
      SELECT DISTINCT doc_id, CAST(lang = 'en' AS INT) AS is_en, tok
      FROM (SELECT doc_id, lang,
                   explode(split(lower(trim(text)), '\\\\s+')) AS tok
            FROM documents)
      WHERE tok <> '' AND length(tok) >= 3),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CAST(lang = 'en' AS INT)) AS BIGINT) AS n_en
            FROM documents),
    c AS (SELECT tok, CAST(sum(is_en) AS BIGINT) AS n11,
                 CAST(sum(1 - is_en) AS BIGINT) AS n10
          FROM dt GROUP BY tok HAVING count(*) >= 5),
    m AS (
      SELECT tok, n11, n10, n_docs, n_en,
             n_en - n11 AS n01, n_docs - n_en - n10 AS n00,
             n11 + n10 AS dfreq
      FROM c CROSS JOIN tot),
    mi AS (
      SELECT tok, dfreq, n11, n10,
        round(
          (CASE WHEN n11 > 0 THEN (CAST(n11 AS DOUBLE)/n_docs)
              * ln(CAST(n_docs AS DOUBLE)*n11/(CAST(dfreq AS DOUBLE)*n_en))
            ELSE 0 END)
        + (CASE WHEN n10 > 0 THEN (CAST(n10 AS DOUBLE)/n_docs)
              * ln(CAST(n_docs AS DOUBLE)*n10
                   /(CAST(dfreq AS DOUBLE)*(n_docs - n_en)))
            ELSE 0 END)
        + (CASE WHEN n01 > 0 THEN (CAST(n01 AS DOUBLE)/n_docs)
              * ln(CAST(n_docs AS DOUBLE)*n01
                   /(CAST(n_docs - dfreq AS DOUBLE)*n_en))
            ELSE 0 END)
        + (CASE WHEN n00 > 0 THEN (CAST(n00 AS DOUBLE)/n_docs)
              * ln(CAST(n_docs AS DOUBLE)*n00
                   /(CAST(n_docs - dfreq AS DOUBLE)*(n_docs - n_en)))
            ELSE 0 END), 10) AS mi
      FROM m)
    SELECT tok, dfreq, n11, n10, mi
    FROM mi ORDER BY mi DESC, tok LIMIT 20
    """)


@_q("q143_gap_interpolation",
    "linear interpolation over a gapped daily series (sensor/metric "
    "repair before feature extraction): per event_type, the day grid "
    "spans min..max day (explode of a sequence — no driver loop), a "
    "deterministic mask (day mod 3 = 0) plus genuinely absent days form "
    "the gaps, and each gap fills from its bracketing observations via "
    "two IGNORE-NULLS window walks (last obs before, first obs after) "
    "— one window shuffle on the series key, O(1) state per row, no "
    "self-join.  Leading/trailing gaps (no bracket) are dropped",
    """
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS v
      FROM events GROUP BY 1, 2),
    grid AS (
      SELECT event_type, unnest(range(d0, d1 + 1)) AS day
      FROM (SELECT event_type, min(day) AS d0, max(day) AS d1
            FROM daily GROUP BY event_type)),
    masked AS (
      SELECT g.event_type, g.day,
             CASE WHEN g.day % 3 = 0 THEN NULL ELSE dd.v END AS v
      FROM grid g LEFT JOIN daily dd
        ON dd.event_type = g.event_type AND dd.day = g.day),
    walked AS (
      SELECT event_type, day, v,
             last_value(v IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER w_prev AS pd,
             first_value(v IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER w_next AS nd
      FROM masked
      WINDOW w_prev AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_next AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_type, CAST(day AS BIGINT) AS day,
           CASE WHEN v IS NOT NULL THEN 'obs' ELSE 'interp' END AS src,
           round(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                      ELSE CAST(pv AS DOUBLE)
                           + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                             * (day - pd) / (nd - pd) END, 6) AS filled
    FROM walked
    WHERE v IS NOT NULL OR (pd IS NOT NULL AND nd IS NOT NULL)
    ORDER BY event_type, day
    """)
def q143(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.expr(f"ts_us div {_DAY_US}").alias("day"))
             .agg(F.sum(F.col("value").cast("decimal(12,2)"))
                  .cast("decimal(18,2)").alias("v")))
    daily = daily.localCheckpoint(eager=False)
    grid = (daily.groupBy("event_type")
            .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
            .select("event_type",
                    F.explode(F.sequence("d0", "d1")).alias("day")))
    masked = (grid.join(daily, ["event_type", "day"], "left")
              .select("event_type", "day",
                      F.when(F.col("day") % 3 == 0, F.lit(None))
                      .otherwise(F.col("v")).alias("v")))
    wp = (Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # next-observation walk as a running frame over the REVERSED sort —
    # first_value over [current, unboundedFollowing] re-aggregates the
    # tail per row (O(rows²) per key partition in WindowExec, the r15
    # asof_join finding); the reversed running last is the same value.
    # `day` is unique within event_type (grid rows), so the reverse
    # order is exact, not a tie class.
    wn = (Window.partitionBy("event_type").orderBy(F.desc("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    walked = masked.select(
        "event_type", "day", "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("pd"),
        F.last("v", ignorenulls=True).over(wn).alias("nv"),
        F.last(obs_day, ignorenulls=True).over(wn).alias("nd"))
    interp = (F.col("pv").cast("double")
              + (F.col("nv").cast("double") - F.col("pv").cast("double"))
              * (F.col("day") - F.col("pd"))
              / (F.col("nd") - F.col("pd")))
    return (walked
            .where(F.col("v").isNotNull()
                   | (F.col("pd").isNotNull() & F.col("nd").isNotNull()))
            .select("event_type", F.col("day").cast("bigint").alias("day"),
                    F.when(F.col("v").isNotNull(), F.lit("obs"))
                    .otherwise(F.lit("interp")).alias("src"),
                    F.round(F.when(F.col("v").isNotNull(),
                                   F.col("v").cast("double"))
                            .otherwise(interp), 6).alias("filled"))
            .orderBy("event_type", "day"))


@_q("q144_rolling_corr",
    "trailing 7-day Pearson correlation between the click and purchase "
    "daily-revenue series: the window's sufficient statistics (n, Sx, "
    "Sy, Sxx, Syy, Sxy) accumulate as EXACT decimal sums gathered by "
    "the q139 offset-explode equi-join — never a range join, and never "
    "a streaming corr() whose update order (and hence low bits) is "
    "engine-private.  corr is then one scalar DOUBLE expression over "
    "exact sums, floor-quantized to 6 decimals.  The day-grid output "
    "is date-range-bound, so the shuffle is fixed at any input scale",
    """
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CASE WHEN event_type = 'click'
                           THEN CAST(value AS DECIMAL(12,2)) END)
                  AS DECIMAL(18,2)) AS vc,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(12,2)) END)
                  AS DECIMAL(18,2)) AS vp
      FROM events GROUP BY 1),
    s AS (SELECT day, vc, vp FROM daily
          WHERE vc IS NOT NULL AND vp IS NOT NULL),
    g AS (
      SELECT a.day, CAST(count(*) AS BIGINT) AS n,
             sum(c.vc) AS sx, sum(c.vp) AS sy,
             sum(CAST(c.vc * c.vc AS DECIMAL(32,4))) AS sxx,
             sum(CAST(c.vp * c.vp AS DECIMAL(32,4))) AS syy,
             sum(CAST(c.vc * c.vp AS DECIMAL(32,4))) AS sxy
      FROM s a
      CROSS JOIN generate_series(0, 6) AS t(k)
      JOIN s c ON c.day = a.day - t.k
      GROUP BY a.day),
    r AS (
      SELECT day, n,
             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS den2
      FROM g WHERE n >= 3)
    SELECT CAST(day AS BIGINT) AS day, n,
           floor(cov_n / sqrt(den2) * 1000000) / 1000000.0 AS corr7
    FROM r WHERE den2 > 0
    ORDER BY day
    """)
def q144(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(12,2)")
    daily = (ev.groupBy(F.expr(f"ts_us div {_DAY_US}").alias("day"))
             .agg(F.sum(F.when(F.col("event_type") == "click", vdec))
                  .cast("decimal(18,2)").alias("vc"),
                  F.sum(F.when(F.col("event_type") == "purchase", vdec))
                  .cast("decimal(18,2)").alias("vp")))
    s = (daily.where(F.col("vc").isNotNull() & F.col("vp").isNotNull())
         # anchors and contributors both read this relation — one
         # materialization (q139's shared-checkpoint pattern)
         .localCheckpoint(eager=False))
    anchors = s.select("day",
                       F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"))
    c = s.select(F.col("day").alias("c_day"),
                 F.col("vc").alias("c_vc"), F.col("vp").alias("c_vp"))
    g = (anchors.join(c, F.col("c_day") == F.col("day") - F.col("k"))
         .groupBy("day")
         .agg(F.count("*").cast("bigint").alias("n"),
              F.sum("c_vc").alias("sx"), F.sum("c_vp").alias("sy"),
              F.sum((F.col("c_vc") * F.col("c_vc"))
                    .cast("decimal(32,4)")).alias("sxx"),
              F.sum((F.col("c_vp") * F.col("c_vp"))
                    .cast("decimal(32,4)")).alias("syy"),
              F.sum((F.col("c_vc") * F.col("c_vp"))
                    .cast("decimal(32,4)")).alias("sxy"))
         .where(F.col("n") >= 3))
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy").cast("double") \
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    den2 = (nd * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")) \
        * (nd * F.col("syy").cast("double")
           - F.col("sy").cast("double") * F.col("sy").cast("double"))
    return (g.select(F.col("day").cast("bigint").alias("day"), "n",
                     (F.floor(cov_n / F.sqrt(den2) * 1000000)
                      / F.lit(1000000.0)).alias("corr7"),
                     den2.alias("_d2"))
            .where(F.col("_d2") > 0).drop("_d2")
            .orderBy("day"))


@_q("q145_reachability",
    "bounded multi-hop graph reachability, declaratively: from each "
    "low-id part, every part reachable within 3 hops over the "
    "co-purchase graph (q116's support>=2 edges, undirected), via "
    "WITH RECURSIVE — count of distinct reached nodes and the hop "
    "radius per source.  Each iteration is one equi-join of the "
    "frontier against the edge list; the edge list is built ONCE and "
    "checkpointed (a naive CTE reference would re-run the basket "
    "self-join every iteration).  The frontier is DEDUPED at every "
    "hop (SELECT DISTINCT in the recursive term; the oracle uses "
    "UNION, Spark does not support it in recursion yet), so state is "
    "bounded by src x nodes per hop even on dense graphs — raw UNION "
    "ALL path multiplicity is degree^3 and blew Spark's recursion row "
    "limit on the 16x densified probe graph",
    """
    WITH RECURSIVE
    d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (SELECT a.l_partkey AS u, b.l_partkey AS v
           FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    srcs AS (SELECT DISTINCT u AS src FROM e WHERE u <= 50),
    r AS (
      SELECT src, src AS node, 0 AS depth FROM srcs
      UNION
      SELECT r.src, e.v AS node, r.depth + 1
      FROM r JOIN e ON e.u = r.node WHERE r.depth < 3)
    SELECT src, CAST(count(DISTINCT node) - 1 AS BIGINT) AS n_reach,
           CAST(max(depth) AS INT) AS radius
    FROM r GROUP BY src ORDER BY src
    """)
def q145(spark, sf_dir):
    # the loop's total row production is the union of per-hop frontiers —
    # on a dense graph that IS the answer's size (srcs x reachable
    # nodes), so the 1M default guardrail trips on output-driven state
    # long before anything pathological (hit on the 16x densified probe
    # graph).  Raise the guardrail on a CLONED session (own SQLConf +
    # temp-view namespace, shared SparkContext): the returned DataFrame
    # executes lazily, so a set/restore in this function body would
    # restore before the recursion ever runs — and a bare set leaked the
    # 200M limit to every later query in the same bench/driver session
    # (round-5 advisor item).  The per-hop DISTINCT above keeps the
    # state bounded by srcs x nodes regardless.
    spark = spark.newSession()
    register_tables(spark, sf_dir, ["lineitem"])
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(200_000_000))
    e0 = spark.sql("""
      WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2""")
    # undirected edge list, materialized ONCE: the recursive loop joins
    # the frontier against it every iteration, and a plain CTE reference
    # would re-run the lineitem self-join per hop
    e = (e0.selectExpr("u", "v")
         .unionByName(e0.selectExpr("v AS u", "u AS v"))
         .localCheckpoint(eager=False))
    e.createOrReplaceTempView("copurchase_edges_r5")
    return spark.sql("""
    WITH RECURSIVE
    srcs AS (SELECT DISTINCT u AS src FROM copurchase_edges_r5
             WHERE u <= 50),
    r AS (
      SELECT src, src AS node, 0 AS depth FROM srcs
      UNION ALL
      SELECT DISTINCT r.src, e.v AS node, r.depth + 1
      FROM r JOIN copurchase_edges_r5 e ON e.u = r.node
      WHERE r.depth < 3)
    SELECT src, CAST(count(DISTINCT node) - 1 AS BIGINT) AS n_reach,
           CAST(max(depth) AS INT) AS radius
    FROM r GROUP BY src ORDER BY src
    """)


@_q("q146_weighted_sample",
    "deterministic weighted sampling WITHOUT replacement (Efraimidis-"
    "Spirakis exponential keys): each document draws u from its md5 "
    "hash (portable uniform in (0,1], the q55 split-rule trick), key = "
    "-ln(u)/w with weight w = its char length, and the top-10 keys per "
    "lang are the sample — provably equivalent to sequential weighted "
    "draws, fully deterministic on any engine, and distributed as one "
    "map-side key computation + per-group top-k (no sort of the "
    "corpus, no sequential state).  The standard reservoir-A-ES shape "
    "for weighted corpus subsampling at 100 TB",
    """
    WITH k AS (
      SELECT doc_id, lang, n_chars,
             -ln((CAST(('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 13))
                       AS BIGINT) + 1.0) / 4503599627370497.0)
               / n_chars AS es_key
      FROM documents WHERE n_chars > 0),
    r AS (SELECT *, row_number() OVER (PARTITION BY lang
                                       ORDER BY es_key, doc_id) AS rn
          FROM k)
    SELECT lang, doc_id, n_chars,
           floor(es_key * 1e9) / 1e9 AS es_key9, rn
    FROM r WHERE rn <= 10 ORDER BY lang, rn
    """)
def q146(spark, sf_dir):
    register_tables(spark, sf_dir, ["documents"])
    return spark.sql("""
    WITH k AS (
      SELECT doc_id, lang, n_chars,
             -ln((CAST(conv(substr(md5(cast(doc_id AS STRING)), 1, 13),
                            16, 10) AS BIGINT) + 1.0) / 4503599627370497.0)
               / n_chars AS es_key
      FROM documents WHERE n_chars > 0),
    r AS (SELECT *, row_number() OVER (PARTITION BY lang
                                       ORDER BY es_key, doc_id) AS rn
          FROM k)
    SELECT lang, doc_id, n_chars,
           floor(es_key * 1e9) / 1e9 AS es_key9, rn
    FROM r WHERE rn <= 10 ORDER BY lang, rn
    """)


@_q("q147_order_streaks",
    "gaps-and-islands: longest run of CONSECUTIVE order days per "
    "customer (day - row_number() island key, the classic streak "
    "rewrite — no self-join, no recursion).  Every window and the "
    "island aggregate share the o_custkey partitioning, so the whole "
    "query is ONE shuffle on customer at any scale; all outputs are "
    "integers (day indexes, counts) — nothing to round",
    """
    WITH d AS (
      SELECT DISTINCT o_custkey,
             epoch_us(o_orderdate) // 86400000000 AS day
      FROM orders),
    i AS (
      SELECT o_custkey, day,
             day - row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY day) AS island
      FROM d),
    runs AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS len,
             CAST(min(day) AS BIGINT) AS start_day
      FROM i GROUP BY o_custkey, island),
    best AS (
      SELECT o_custkey, len, start_day,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY len DESC, start_day) AS rk,
             CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT)
               AS n_runs,
             CAST(sum(len) OVER (PARTITION BY o_custkey) AS BIGINT)
               AS n_days
      FROM runs)
    SELECT o_custkey, len AS best_len, start_day AS best_start,
           n_runs, n_days
    FROM best WHERE rk = 1 ORDER BY o_custkey
    """)
def q147(spark, sf_dir):
    register_tables(spark, sf_dir, ["orders"])
    return spark.sql("""
    WITH d AS (
      SELECT DISTINCT o_custkey,
             o_orderdate_us div 86400000000 AS day
      FROM orders),
    i AS (
      SELECT o_custkey, day,
             day - row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY day) AS island
      FROM d),
    runs AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS len,
             CAST(min(day) AS BIGINT) AS start_day
      FROM i GROUP BY o_custkey, island),
    best AS (
      SELECT o_custkey, len, start_day,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY len DESC, start_day) AS rk,
             CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT)
               AS n_runs,
             CAST(sum(len) OVER (PARTITION BY o_custkey) AS BIGINT)
               AS n_days
      FROM runs)
    SELECT o_custkey, len AS best_len, start_day AS best_start,
           n_runs, n_days
    FROM best WHERE rk = 1 ORDER BY o_custkey
    """)


@_q("q148_scd2_compaction",
    "SCD type-2 dimension build from a change log: per user the event "
    "stream (ordered by ts, event_id tiebreak) is compacted into "
    "validity intervals — a change flag via lag(), version = running "
    "sum of flags, one row per run with valid_from / valid_to "
    "(lead of the next run's start; -1 = current).  The standard "
    "CDC-to-warehouse dimension rebuild; every window partitions on "
    "user_id so the whole plan is one shuffle, and all outputs are "
    "integer epoch-micros and counts",
    """
    WITH s AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id)
               AS prev
      FROM events),
    f AS (
      SELECT *, CASE WHEN prev IS NULL OR prev <> event_type
                     THEN 1 ELSE 0 END AS chg
      FROM s),
    g AS (
      SELECT *, sum(chg) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS ver
      FROM f),
    runs AS (
      SELECT user_id, CAST(ver AS BIGINT) AS version, event_type,
             CAST(min(ts_us) AS BIGINT) AS valid_from_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM g GROUP BY user_id, ver, event_type),
    scd AS (
      SELECT *, lead(valid_from_us) OVER (PARTITION BY user_id
                                          ORDER BY version) AS v_to
      FROM runs)
    SELECT user_id, version, event_type, valid_from_us,
           CAST(coalesce(v_to, -1) AS BIGINT) AS valid_to_us, n_events
    FROM scd ORDER BY user_id, version
    """)
def q148(spark, sf_dir):
    register_tables(spark, sf_dir, ["events"])
    return spark.sql("""
    WITH s AS (
      SELECT user_id, event_id, ts_us, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id) AS prev
      FROM events),
    f AS (
      SELECT *, CASE WHEN prev IS NULL OR prev <> event_type
                     THEN 1 ELSE 0 END AS chg
      FROM s),
    g AS (
      SELECT *, sum(chg) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS ver
      FROM f),
    runs AS (
      SELECT user_id, CAST(ver AS BIGINT) AS version, event_type,
             CAST(min(ts_us) AS BIGINT) AS valid_from_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM g GROUP BY user_id, ver, event_type),
    scd AS (
      SELECT *, lead(valid_from_us) OVER (PARTITION BY user_id
                                          ORDER BY version) AS v_to
      FROM runs)
    SELECT user_id, version, event_type, valid_from_us,
           CAST(coalesce(v_to, -1) AS BIGINT) AS valid_to_us, n_events
    FROM scd ORDER BY user_id, version
    """)


@_q("q149_kmeans_step",
    "one exact Lloyd iteration of k-means (k=8, centroids seeded from "
    "the 8 lowest vec_ids): assign every embedding to its nearest "
    "centroid by squared L2, then recompute centroid means.  Distances "
    "are sums of per-dimension DECIMAL terms (each squared diff is a "
    "deterministic double, rounded to 12 digits before the exact sum) "
    "so the argmin is order-proof on both engines; ties break by cid. "
    "The distance stage is a BROADCAST equi-join on dimension (k*D "
    "centroid rows ship to every executor — the standard distributed "
    "k-means shape, N*D*k work with no all-pairs shuffle); the "
    "assignment and the mean recompute both shuffle on vec_id/cid "
    "only.  Output: the new centroids' first 8 dimensions",
    """
    WITH c AS (
      SELECT vec_id AS cid,
             unnest(range(1, len(embedding) + 1)) AS cdim,
             CAST(unnest(embedding) AS DOUBLE) AS c
      FROM embeddings WHERE vec_id < 8),
    p AS (
      SELECT vec_id,
             unnest(range(1, len(embedding) + 1)) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    d AS (
      SELECT p.vec_id, c.cid,
             sum(CAST(round((p.x - c.c) * (p.x - c.c), 12)
                      AS DECIMAL(30,12))) AS d2
      FROM p JOIN c ON c.cdim = p.dim
      GROUP BY p.vec_id, c.cid),
    a AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d2, cid) AS rk
      FROM d),
    m AS (SELECT vec_id, cid FROM a WHERE rk = 1),
    nc AS (
      SELECT m.cid, p.dim, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(p.x, 8) AS DECIMAL(20,8)))
                  AS DOUBLE) AS sx
      FROM m JOIN p ON p.vec_id = m.vec_id
      WHERE p.dim <= 8
      GROUP BY m.cid, p.dim)
    SELECT CAST(cid AS BIGINT) AS cid, CAST(dim AS INT) AS dim, n,
           floor(sx / n * 1000000) / 1000000.0 AS new_c
    FROM nc ORDER BY cid, dim
    """)
def q149(spark, sf_dir):
    from .tables import fan_out_small_scan
    # the N*k DECIMAL distance stage is the CPU stage: fan out the
    # single-file scan (measured -62% at sf0.1; no-op on real tables)
    e = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))

    def exploded(df, id_alias, dim_alias, val_alias):
        return (df.select(F.col("vec_id").alias(id_alias),
                          F.posexplode("embedding").alias("pos", "xf"))
                .select(id_alias, (F.col("pos") + 1).alias(dim_alias),
                        F.col("xf").cast("double").alias(val_alias)))

    # points re-derive from the parquet scan per branch (map-only explode
    # — cheaper at scale than checkpointing the N*D exploded relation)
    p = exploded(e, "vec_id", "dim", "x")
    c = exploded(e.where("vec_id < 8"), "cid", "cdim", "c")
    d = (p.join(F.broadcast(c), F.col("dim") == F.col("cdim"))
         .groupBy("vec_id", "cid")
         .agg(F.sum(F.round((F.col("x") - F.col("c"))
                            * (F.col("x") - F.col("c")), 12)
                    .cast("decimal(30,12)")).alias("d2")))
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    m = (d.withColumn("rk", F.row_number().over(w))
         .where("rk = 1").select("vec_id", "cid"))
    nc = (m.join(exploded(e, "vec_id", "dim", "x").where("dim <= 8"),
                 ["vec_id"])
          .groupBy("cid", "dim")
          .agg(F.count("*").cast("bigint").alias("n"),
               F.sum(F.round("x", 8).cast("decimal(20,8)"))
               .cast("double").alias("sx")))
    return (nc.select(F.col("cid").cast("bigint").alias("cid"),
                      F.col("dim").cast("int").alias("dim"), "n",
                      (F.floor(F.col("sx") / F.col("n") * 1000000)
                       / F.lit(1000000.0)).alias("new_c"))
            .orderBy("cid", "dim"))


@_q("q150_cusum_changepoint",
    "CUSUM changepoint detection per event_type: the daily revenue "
    "series (integer cents via floor(v*100+0.5) — pure IEEE, no "
    "round-half mode ambiguity) is centered EXACTLY by scaling "
    "(dev = v*n_days - total, all BIGINT — no mean division, no "
    "floats), and the candidate changepoint is the day of max "
    "|running sum|.  One shuffle builds the daily aggregate, the "
    "per-type totals broadcast back, and the cumulative window "
    "re-uses the event_type partitioning — integer-exact end to end",
    """
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS vc
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(vc) AS BIGINT) AS total
      FROM daily GROUP BY 1),
    c AS (
      SELECT d.event_type, d.day, s.n_days,
             sum(d.vc * s.n_days - s.total)
               OVER (PARTITION BY d.event_type ORDER BY d.day
                     ROWS UNBOUNDED PRECEDING) AS cusum
      FROM daily d JOIN stats s ON s.event_type = d.event_type),
    r AS (
      SELECT event_type, day, n_days, cusum,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum) DESC, day) AS rk
      FROM c)
    SELECT event_type, CAST(day AS BIGINT) AS cp_day,
           CAST(cusum AS BIGINT) AS cusum_scaled, n_days
    FROM r WHERE rk = 1 ORDER BY event_type
    """)
def q150(spark, sf_dir):
    register_tables(spark, sf_dir, ["events"])
    return spark.sql("""
    WITH daily AS (
      SELECT event_type, ts_us div 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS vc
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(vc) AS BIGINT) AS total
      FROM daily GROUP BY 1),
    c AS (
      SELECT d.event_type, d.day, s.n_days,
             sum(d.vc * s.n_days - s.total)
               OVER (PARTITION BY d.event_type ORDER BY d.day
                     ROWS UNBOUNDED PRECEDING) AS cusum
      FROM daily d JOIN stats s ON s.event_type = d.event_type),
    r AS (
      SELECT event_type, day, n_days, cusum,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum) DESC, day) AS rk
      FROM c)
    SELECT event_type, CAST(day AS BIGINT) AS cp_day,
           CAST(cusum AS BIGINT) AS cusum_scaled, n_days
    FROM r WHERE rk = 1 ORDER BY event_type
    """)


@_q("q151_benford_audit",
    "Benford's-law first-digit audit per l_returnflag (the fraud / "
    "data-quality screen over a money column): the leading digit comes "
    "from integer string math (floor then substr of the BIGINT — never "
    "float log10 of the value, whose 1-ulp engine differences could "
    "flip a power-of-10 boundary), and the Benford probabilities are "
    "fixed DECIMAL literals (n_tot*p is an exact decimal product — "
    "runtime log10 differs by 1 ulp between JVM and C libm, which "
    "flipped a floor-quantize boundary at sf0.1), "
    "and each digit row carries its chi-square term.  One digit "
    "histogram shuffle + a broadcast per-flag total — O(27) output "
    "rows at any scale",
    """
    WITH digits AS (
      SELECT l_returnflag,
             CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS d
      FROM lineitem WHERE l_extendedprice >= 1),
    counts AS (
      SELECT l_returnflag, d, CAST(count(*) AS BIGINT) AS n_obs
      FROM digits GROUP BY 1, 2),
    tot AS (
      SELECT l_returnflag, CAST(sum(n_obs) AS BIGINT) AS n_tot
      FROM counts GROUP BY 1)
    SELECT c.l_returnflag, c.d, c.n_obs,
           floor(CAST(t.n_tot * (CASE c.d
               WHEN 1 THEN CAST(0.301029995663981 AS DECIMAL(16,15))
               WHEN 2 THEN CAST(0.176091259055681 AS DECIMAL(16,15))
               WHEN 3 THEN CAST(0.124938736608300 AS DECIMAL(16,15))
               WHEN 4 THEN CAST(0.096910013008056 AS DECIMAL(16,15))
               WHEN 5 THEN CAST(0.079181246047625 AS DECIMAL(16,15))
               WHEN 6 THEN CAST(0.066946789630613 AS DECIMAL(16,15))
               WHEN 7 THEN CAST(0.057991946977687 AS DECIMAL(16,15))
               WHEN 8 THEN CAST(0.051152522447381 AS DECIMAL(16,15))
               ELSE CAST(0.045757490560675 AS DECIMAL(16,15)) END) AS DOUBLE) * 1000000)
             / 1000000.0 AS expected6,
           floor(pow(c.n_obs - CAST(t.n_tot * (CASE c.d
               WHEN 1 THEN CAST(0.301029995663981 AS DECIMAL(16,15))
               WHEN 2 THEN CAST(0.176091259055681 AS DECIMAL(16,15))
               WHEN 3 THEN CAST(0.124938736608300 AS DECIMAL(16,15))
               WHEN 4 THEN CAST(0.096910013008056 AS DECIMAL(16,15))
               WHEN 5 THEN CAST(0.079181246047625 AS DECIMAL(16,15))
               WHEN 6 THEN CAST(0.066946789630613 AS DECIMAL(16,15))
               WHEN 7 THEN CAST(0.057991946977687 AS DECIMAL(16,15))
               WHEN 8 THEN CAST(0.051152522447381 AS DECIMAL(16,15))
               ELSE CAST(0.045757490560675 AS DECIMAL(16,15)) END) AS DOUBLE), 2)
                 / CAST(t.n_tot * (CASE c.d
               WHEN 1 THEN CAST(0.301029995663981 AS DECIMAL(16,15))
               WHEN 2 THEN CAST(0.176091259055681 AS DECIMAL(16,15))
               WHEN 3 THEN CAST(0.124938736608300 AS DECIMAL(16,15))
               WHEN 4 THEN CAST(0.096910013008056 AS DECIMAL(16,15))
               WHEN 5 THEN CAST(0.079181246047625 AS DECIMAL(16,15))
               WHEN 6 THEN CAST(0.066946789630613 AS DECIMAL(16,15))
               WHEN 7 THEN CAST(0.057991946977687 AS DECIMAL(16,15))
               WHEN 8 THEN CAST(0.051152522447381 AS DECIMAL(16,15))
               ELSE CAST(0.045757490560675 AS DECIMAL(16,15)) END) AS DOUBLE) * 1000000)
             / 1000000.0 AS chi2_term6
    FROM counts c JOIN tot t ON t.l_returnflag = c.l_returnflag
    ORDER BY c.l_returnflag, c.d
    """)
def q151(spark, sf_dir):
    register_tables(spark, sf_dir, ["lineitem"])
    return spark.sql("""
    WITH digits AS (
      SELECT l_returnflag,
             CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                              AS STRING), 1, 1) AS INT) AS d
      FROM lineitem WHERE l_extendedprice >= 1),
    counts AS (
      SELECT l_returnflag, d, CAST(count(*) AS BIGINT) AS n_obs
      FROM digits GROUP BY 1, 2),
    tot AS (
      SELECT l_returnflag, CAST(sum(n_obs) AS BIGINT) AS n_tot
      FROM counts GROUP BY 1)
    SELECT c.l_returnflag, c.d, c.n_obs,
           floor(CAST(t.n_tot * (CASE c.d
               WHEN 1 THEN CAST(0.301029995663981 AS DECIMAL(16,15))
               WHEN 2 THEN CAST(0.176091259055681 AS DECIMAL(16,15))
               WHEN 3 THEN CAST(0.124938736608300 AS DECIMAL(16,15))
               WHEN 4 THEN CAST(0.096910013008056 AS DECIMAL(16,15))
               WHEN 5 THEN CAST(0.079181246047625 AS DECIMAL(16,15))
               WHEN 6 THEN CAST(0.066946789630613 AS DECIMAL(16,15))
               WHEN 7 THEN CAST(0.057991946977687 AS DECIMAL(16,15))
               WHEN 8 THEN CAST(0.051152522447381 AS DECIMAL(16,15))
               ELSE CAST(0.045757490560675 AS DECIMAL(16,15)) END) AS DOUBLE) * 1e6)
             / 1e6 AS expected6,
           floor(pow(c.n_obs - CAST(t.n_tot * (CASE c.d
               WHEN 1 THEN CAST(0.301029995663981 AS DECIMAL(16,15))
               WHEN 2 THEN CAST(0.176091259055681 AS DECIMAL(16,15))
               WHEN 3 THEN CAST(0.124938736608300 AS DECIMAL(16,15))
               WHEN 4 THEN CAST(0.096910013008056 AS DECIMAL(16,15))
               WHEN 5 THEN CAST(0.079181246047625 AS DECIMAL(16,15))
               WHEN 6 THEN CAST(0.066946789630613 AS DECIMAL(16,15))
               WHEN 7 THEN CAST(0.057991946977687 AS DECIMAL(16,15))
               WHEN 8 THEN CAST(0.051152522447381 AS DECIMAL(16,15))
               ELSE CAST(0.045757490560675 AS DECIMAL(16,15)) END) AS DOUBLE), 2)
                 / CAST(t.n_tot * (CASE c.d
               WHEN 1 THEN CAST(0.301029995663981 AS DECIMAL(16,15))
               WHEN 2 THEN CAST(0.176091259055681 AS DECIMAL(16,15))
               WHEN 3 THEN CAST(0.124938736608300 AS DECIMAL(16,15))
               WHEN 4 THEN CAST(0.096910013008056 AS DECIMAL(16,15))
               WHEN 5 THEN CAST(0.079181246047625 AS DECIMAL(16,15))
               WHEN 6 THEN CAST(0.066946789630613 AS DECIMAL(16,15))
               WHEN 7 THEN CAST(0.057991946977687 AS DECIMAL(16,15))
               WHEN 8 THEN CAST(0.051152522447381 AS DECIMAL(16,15))
               ELSE CAST(0.045757490560675 AS DECIMAL(16,15)) END) AS DOUBLE) * 1e6)
             / 1e6 AS chi2_term6
    FROM counts c JOIN tot t ON t.l_returnflag = c.l_returnflag
    ORDER BY c.l_returnflag, c.d
    """)


@_q("q152_gini_inequality",
    "Gini coefficient of per-user revenue inside each event_type (the "
    "inequality / data-balance audit for training-mix curation): "
    "G = (2*sum(rank*s) - (n+1)*total) / (n*total) over ascending "
    "(s, user_id) ranks — integer cents end to end, so the only float "
    "op is the final division (deterministic IEEE, floor-quantized). "
    "The rank window and both aggregates share the event_type "
    "partitioning downstream of one (event_type, user_id) rollup — "
    "two bounded shuffles at any scale, no sort of raw rows",
    """
    WITH per_user AS (
      SELECT event_type, user_id,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS s
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT event_type, s,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY s, user_id) AS rn
      FROM per_user),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(s) AS BIGINT) AS total_cents,
             CAST(sum(rn * s) AS BIGINT) AS a
      FROM ranked GROUP BY event_type)
    SELECT event_type, n_users, total_cents,
           floor((2.0 * a - (n_users + 1.0) * total_cents)
                 / (CAST(n_users AS DOUBLE) * total_cents) * 1000000)
             / 1000000.0 AS gini6
    FROM g ORDER BY event_type
    """)
def q152(spark, sf_dir):
    register_tables(spark, sf_dir, ["events"])
    return spark.sql("""
    WITH per_user AS (
      SELECT event_type, user_id,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS s
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT event_type, s,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY s, user_id) AS rn
      FROM per_user),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(s) AS BIGINT) AS total_cents,
             CAST(sum(rn * s) AS BIGINT) AS a
      FROM ranked GROUP BY event_type)
    SELECT event_type, n_users, total_cents,
           floor((2.0 * a - (n_users + 1.0) * total_cents)
                 / (CAST(n_users AS DOUBLE) * total_cents) * 1e6)
             / 1e6 AS gini6
    FROM g ORDER BY event_type
    """)


@_q("q153_theil_sen_slope",
    "Theil-Sen robust trend per event_type: the median of all pairwise "
    "slopes of the daily-revenue series (integer cents over integer "
    "day gaps — each slope is one deterministic double, floor-"
    "quantized to 9 digits BEFORE the median so both engines rank "
    "identical values).  The pair generation is a per-type equi-join "
    "of the DAILY aggregate against itself (O(d^2) per type where d = "
    "distinct days — bounded by the calendar, never by row count; the "
    "q24-style honest quadratic over a pre-shrunk relation), and the "
    "exact median interpolates the two middle quantized slopes",
    """
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS vc
      FROM events GROUP BY 1, 2),
    slopes AS (
      SELECT a.event_type,
             floor(CAST(b.vc - a.vc AS DOUBLE) / (b.day - a.day)
                   * 1000000000) / 1000000000.0 AS slope9
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day > a.day)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           floor(quantile_cont(slope9, 0.5) * 1000000) / 1000000.0
             AS ts_slope6
    FROM slopes GROUP BY event_type ORDER BY event_type
    """)
def q153(spark, sf_dir):
    register_tables(spark, sf_dir, ["events"])
    return spark.sql("""
    WITH daily AS (
      SELECT event_type, ts_us div 86400000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS vc
      FROM events GROUP BY 1, 2),
    slopes AS (
      SELECT a.event_type,
             floor(CAST(b.vc - a.vc AS DOUBLE) / (b.day - a.day)
                   * 1e9) / 1e9 AS slope9
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day > a.day)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           floor(percentile(slope9, 0.5) * 1e6) / 1e6 AS ts_slope6
    FROM slopes GROUP BY event_type ORDER BY event_type
    """)


@_q("q154_column_entropy",
    "column-profiling audit: Shannon entropy + distinct count for each "
    "DISCRETE column of the events table (event_type, user_id, day, "
    "props — value-as-string only for types whose string form is "
    "engine-identical, never raw doubles).  H = ln(N) - sum(c*ln c)/N "
    "with the c*ln(c) terms rounded then summed as DECIMAL (the q142 "
    "order-proof trick).  Unpivot is map-side (stack/UNION ALL), the "
    "per-column value counts are one shuffle keyed by (column, value), "
    "and the final reduce is O(columns)",
    """
    WITH stacked AS (
      SELECT 'event_type' AS col, event_type AS val FROM events
      UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
      UNION ALL SELECT 'day',
        CAST(epoch_us(ts) // 86400000000 AS VARCHAR) FROM events
      UNION ALL SELECT 'props', props FROM events),
    counts AS (
      SELECT col, val, CAST(count(*) AS BIGINT) AS c
      FROM stacked WHERE val IS NOT NULL GROUP BY 1, 2),
    percol AS (
      SELECT col, CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CAST(round(c * ln(c), 6) AS DECIMAL(30,6)))
                  AS DOUBLE) AS sclogc
      FROM counts GROUP BY col)
    SELECT col, n_distinct, n,
           floor((ln(n) - sclogc / n) * 1000000) / 1000000.0
             AS entropy6
    FROM percol ORDER BY col
    """)
def q154(spark, sf_dir):
    register_tables(spark, sf_dir, ["events"])
    return spark.sql("""
    WITH stacked AS (
      SELECT stack(4,
        'event_type', event_type,
        'user_id', CAST(user_id AS STRING),
        'day', CAST(ts_us div 86400000000 AS STRING),
        'props', props) AS (col, val)
      FROM events),
    counts AS (
      SELECT col, val, CAST(count(*) AS BIGINT) AS c
      FROM stacked WHERE val IS NOT NULL GROUP BY 1, 2),
    percol AS (
      SELECT col, CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CAST(round(c * ln(c), 6) AS DECIMAL(30,6)))
                  AS DOUBLE) AS sclogc
      FROM counts GROUP BY col)
    SELECT col, n_distinct, n,
           floor((ln(n) - sclogc / n) * 1e6) / 1e6 AS entropy6
    FROM percol ORDER BY col
    """)
