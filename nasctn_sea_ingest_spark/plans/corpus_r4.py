"""Round-4 corpus extensions: exact set-similarity join with prefix
filtering (PPJoin-style), time-weighted averages over irregular series,
corpus-drift KL divergence, and a recursive-CTE hierarchy rollup (Spark
4.x ``WITH RECURSIVE``).

These fill genuine workload gaps rather than re-covering SURVEY.md §2:
q135 is the EXACT counterpart of the probabilistic near-dup family
(q24/q25 give candidates; q135 proves the lossless-filter algebra at the
engine level), q136/q137 are profiling shapes every event/LLM warehouse
runs, q138 exercises the engine's iterative-plan surface declaratively.

Float parity per corpus.py rules: thresholds as integer cross-products
(5·inter ≥ 3·union — no float Jaccard in any predicate), money/value
sums in DECIMAL then cast DOUBLE, transcendental per-token terms rounded
to 12 decimals and summed as DECIMAL (associative — order-proof), no raw
timestamps.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from .corpus import _q
from .tables import load_table, register_tables

from .corpus_docs import _DUCK_SHINGLES, _SPARK_SHINGLES


@_q("q135_setsim_prefix_join",
    "EXACT set-similarity self-join at Jaccard >= 0.6 over word 3-gram "
    "SHINGLE sets via PPJoin-style prefix filtering: shingles ranked "
    "rarest-first by global document frequency, each doc emits only its "
    "first (l - ceil(0.6 l) + 1) shingles, candidates come from an "
    "equi-join on those prefixes (lossless: any qualifying pair must "
    "share a prefix element) narrowed by the Jaccard length filter "
    "(5*min(l) >= 3*max(l)), then one array_intersect verifies.  The "
    "oracle is the exhaustive ground truth (shingle-join intersections "
    "over ALL pairs) — proving the filter drops nothing.  This is the "
    "exact-answer complement of q25 MinHash-LSH (which can miss pairs); "
    "thresholds stay integral (5*inter >= 3*union) so no float enters "
    "any predicate.",
    f"""
    WITH {_DUCK_SHINGLES},
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS l
              FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             CAST(count(*) AS BIGINT) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT da, db, inter, s1.l + s2.l - inter AS uni
    FROM pairs
    JOIN sizes s1 ON s1.doc_id = da
    JOIN sizes s2 ON s2.doc_id = db
    WHERE 5 * inter >= 3 * (s1.l + s2.l - inter)
    """)
def q135(spark, sf_dir):
    register_tables(spark, sf_dir, ["documents"])
    sh = spark.sql(f"WITH {_SPARK_SHINGLES} SELECT doc_id, shingle FROM sh")
    # The shingle relation feeds THREE branches — global document
    # frequency, the ranked prefix windows, and the verification sets —
    # whose differing projections defeat physical exchange reuse (round 4
    # shipped with the explode re-executing per branch).  A LAZY
    # localCheckpoint (the q128 multi-branch persist) materializes the
    # explode exactly once at first action; O(shingles) like any shuffle.
    sh = sh.localCheckpoint(eager=False)
    # global shingle frequency ranks prefix elements rarest-first -- the
    # standard PPJoin ordering that minimizes candidate-bucket sizes (a
    # corpus-wide common shingle in a prefix would put half the corpus
    # into one bucket)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = (sh.join(dfreq, "shingle")
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("doc_id").orderBy("df", "shingle")))
              .withColumn("l", F.count("*").over(
                  Window.partitionBy("doc_id"))))
    # prefix length = l - ceil(0.6 l) + 1, in INTEGER arithmetic:
    # ceil(3l/5) = (3l + 4) div 5  (0.6*l in floats mis-ceils at l % 5 = 0)
    prefix = ranked.where(
        F.col("rn") <= F.col("l") - F.expr("(3 * l + 4) div 5") + 1)
    a, b = prefix.alias("a"), prefix.alias("b")
    # Jaccard length filter inside the candidate join: J >= 0.6 forces
    # 0.6*max(|A|,|B|) <= min(|A|,|B|) -- integral as 5*min >= 3*max
    cand = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.doc_id") < F.col("b.doc_id"))
                   & (5 * F.least("a.l", "b.l")
                      >= 3 * F.greatest("a.l", "b.l")))
            .select(F.col("a.doc_id").alias("da"),
                    F.col("b.doc_id").alias("db"))
            .distinct())
    # verification sets come from the ranked relation (one row per
    # distinct (doc, shingle), already hash-partitioned on doc_id by the
    # window exchange) — not a fresh pass over sh
    sets = (ranked.groupBy("doc_id")
            .agg(F.collect_list("shingle").alias("ss"),
                 F.max("l").cast("bigint").alias("l")))
    out = (cand
           .join(sets.select(F.col("doc_id").alias("da"),
                             F.col("ss").alias("sa"),
                             F.col("l").alias("la")), "da")
           .join(sets.select(F.col("doc_id").alias("db"),
                             F.col("ss").alias("sb"),
                             F.col("l").alias("lb")), "db")
           .withColumn("inter",
                       F.size(F.array_intersect("sa", "sb")).cast("bigint"))
           .withColumn("uni", F.col("la") + F.col("lb") - F.col("inter"))
           .where(5 * F.col("inter") >= 3 * F.col("uni"))
           .select("da", "db", "inter", "uni"))
    return out


@_q("q136_twap",
    "time-weighted average over an irregular event series, per "
    "event_type: each value holds until the next event (duration from a "
    "lead window over epoch micros; the series' last point carries no "
    "weight), TWAP = sum(value*dur)/sum(dur) with the weighted sum in "
    "exact DECIMAL — the canonical irregular-sampling aggregate "
    "(sensor readings, price feeds) that a plain avg() silently gets "
    "wrong",
    """
    WITH s AS (
      SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
             lead(epoch_us(ts)) OVER (PARTITION BY event_type
                                      ORDER BY epoch_us(ts), event_id)
               - epoch_us(ts) AS dur
      FROM events)
    SELECT event_type,
           CAST(count(dur) AS BIGINT) AS n_spans,
           CAST(sum(dur) AS BIGINT) AS total_us,
           round(CAST(sum(v * dur) AS DOUBLE)
                 / CAST(sum(dur) AS DOUBLE), 6) AS twap
    FROM s WHERE dur IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """)
def q136(spark, sf_dir):
    from ..functions import keyed_lead
    ev = load_table(spark, sf_dir, "events")
    # keyed_lead, not Window.partitionBy(event_type): a handful of event
    # types caps the plain window at key-count parallelism (measured 2x
    # at the 16x probe; at 100 TB it is 5 tasks for the whole table).
    # The sliced form runs per (key, time-range) with a broadcast
    # boundary repair — same rows, same leads.
    led = keyed_lead(ev.select("event_type", "ts_us", "event_id", "value"),
                     by=["event_type"], order=["ts_us", "event_id"],
                     cols=["ts_us"])
    s = led.select(
        "event_type",
        F.col("value").cast("decimal(12,2)").alias("v"),
        (F.col("ts_us__next") - F.col("ts_us")).alias("dur"))
    return (s.where(F.col("dur").isNotNull())
            .groupBy("event_type")
            .agg(F.count("dur").cast("bigint").alias("n_spans"),
                 F.sum("dur").cast("bigint").alias("total_us"),
                 F.round(F.sum(F.col("v") * F.col("dur")).cast("double")
                         / F.sum("dur").cast("double"), 6).alias("twap"))
            .orderBy("event_type"))


@_q("q137_corpus_kl",
    "corpus drift: KL(P||Q) between the unigram distributions of the "
    "md5-hash train/eval halves (q55's split rule), add-one smoothing "
    "over the shared vocabulary. Per-token contributions are doubles "
    "(identical on both engines — pure arithmetic on integer counts), "
    "rounded to 12 decimals and summed as DECIMAL so the reduction is "
    "associative — order-proof parity for a transcendental aggregate. "
    "Reported per md5 token bucket (8 rows) plus token counts — the "
    "distribution-shift monitor every LLM data pipeline runs between "
    "corpus snapshots",
    """
    WITH d AS (
      SELECT CASE WHEN cast(('0x' || substr(md5(cast(doc_id AS VARCHAR)),
                                            1, 15)) AS BIGINT) % 2 = 0
                  THEN 0 ELSE 1 END AS half,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents),
    c AS (SELECT tok,
                 CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
                 CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cb
          FROM d WHERE tok <> '' GROUP BY tok),
    tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                   CAST(sum(cb) AS BIGINT) AS nb,
                   CAST(count(*) AS BIGINT) AS v FROM c),
    terms AS (
      SELECT cast(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 8
               AS bucket,
             CAST(round(
               (CAST(ca + 1 AS DOUBLE) / (na + v))
               * ln((CAST(ca + 1 AS DOUBLE) / (na + v))
                    / (CAST(cb + 1 AS DOUBLE) / (nb + v))), 12)
               AS DECIMAL(24,12)) AS term
      FROM c, tot)
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(term) AS DOUBLE) AS kl_part
    FROM terms GROUP BY bucket ORDER BY bucket
    """)
def q137(spark, sf_dir):
    register_tables(spark, sf_dir, ["documents"])
    return spark.sql("""
    WITH d AS (
      SELECT CASE WHEN CAST(conv(substr(md5(cast(doc_id AS STRING)), 1, 15),
                             16, 10) AS BIGINT) % 2 = 0
                  THEN 0 ELSE 1 END AS half,
             explode(split(lower(trim(text)), '\\\\s+')) AS tok
      FROM documents),
    c AS (SELECT tok,
                 CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
                 CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cb
          FROM d WHERE tok <> '' GROUP BY tok),
    tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                   CAST(sum(cb) AS BIGINT) AS nb,
                   CAST(count(*) AS BIGINT) AS v FROM c),
    terms AS (
      SELECT CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT) % 8
               AS bucket,
             CAST(round(
               (CAST(ca + 1 AS DOUBLE) / (na + v))
               * ln((CAST(ca + 1 AS DOUBLE) / (na + v))
                    / (CAST(cb + 1 AS DOUBLE) / (nb + v))), 12)
               AS DECIMAL(24,12)) AS term
      FROM c CROSS JOIN tot)
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(term) AS DOUBLE) AS kl_part
    FROM terms GROUP BY bucket ORDER BY bucket
    """)


@_q("q138_recursive_rollup",
    "hierarchy rollup via WITH RECURSIVE (Spark 4.x recursive CTE — the "
    "engine's declarative iterative-plan surface): parts form an "
    "implicit binary tree (parent = partkey div 2), each part <= 500 "
    "walks its ancestor chain to the root and rolls up depth + exact "
    "DECIMAL price-along-path. Iterations = tree depth (log2 of the key "
    "domain), each one equi-join against the broadcastable part dim — "
    "the BOM-explosion / org-chart shape relational engines answer with "
    "recursive CTEs rather than driver loops",
    """
    WITH RECURSIVE anc AS (
      SELECT p_partkey AS leaf, p_partkey AS node, 0 AS depth,
             CAST(p_retailprice AS DECIMAL(14,2)) AS path_price
      FROM part WHERE p_partkey <= 500
      UNION ALL
      SELECT a.leaf, p.p_partkey, a.depth + 1,
             CAST(a.path_price + CAST(p.p_retailprice AS DECIMAL(14,2))
                  AS DECIMAL(14,2))
      FROM anc a JOIN part p ON p.p_partkey = a.node // 2
      WHERE a.node > 1)
    SELECT leaf, CAST(max(depth) AS INT) AS depth,
           CAST(max_by(path_price, depth) AS DOUBLE) AS root_path_price,
           CAST(count(*) AS BIGINT) AS chain_len
    FROM anc GROUP BY leaf ORDER BY leaf
    """)
def q138(spark, sf_dir):
    register_tables(spark, sf_dir, ["part"])
    return spark.sql("""
    WITH RECURSIVE anc AS (
      SELECT p_partkey AS leaf, p_partkey AS node, 0 AS depth,
             CAST(p_retailprice AS DECIMAL(14,2)) AS path_price
      FROM part WHERE p_partkey <= 500
      UNION ALL
      SELECT a.leaf, p.p_partkey, a.depth + 1,
             CAST(a.path_price + CAST(p.p_retailprice AS DECIMAL(14,2))
                  AS DECIMAL(14,2))
      FROM anc a JOIN part p ON p.p_partkey = a.node div 2
      WHERE a.node > 1)
    SELECT leaf, CAST(max(depth) AS INT) AS depth,
           CAST(max_by(path_price, depth) AS DOUBLE) AS root_path_price,
           CAST(count(*) AS BIGINT) AS chain_len
    FROM anc GROUP BY leaf ORDER BY leaf
    """)
