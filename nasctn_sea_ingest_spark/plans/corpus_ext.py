"""Extended corpus: the relational surface the reference never needed but a
Spark engine gets natively (SURVEY.md §2.4/§2.6 "Catalyst provides them"),
plus the ANN and multimodal scale paths as declared queries.

Scale notes (100 TB):

- set ops and distinct-aggs shuffle on their full key; both are
  partial-aggregated map-side by Catalyst before the exchange.
- ROLLUP/CUBE expand to grouping sets in a single pass (one shuffle, the
  expand operator multiplies rows map-side) — no per-level rescan.
- RANGE-frame windows sort within (user) partitions only; the frame scan is
  streaming (one pass per partition), so trailing-window state is O(frame).
- ANN queries scan candidates pruned by bucket/cell predicates that reach
  the parquet scan when the table is stored partitioned/bucketed by that
  key; the exact cosine re-rank touches only the pruned slice.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..operators import similarity
from ..sources.multimodal import extract_features
from .corpus import _q
from .tables import load_table, register_tables, us

US_HOUR = 3_600_000_000
US_DAY = 86_400_000_000


# ---------------------------------------------------------------------------
# set operations (§2.6 — native INTERSECT / EXCEPT, distinct semantics)
# ---------------------------------------------------------------------------

@_q("q40_set_ops",
    "INTERSECT + EXCEPT over nation keys (§2.6: set ops beyond the "
    "reference's union-only surface)",
    """
    SELECT 'both' AS tag, x FROM (
      SELECT c_nationkey AS x FROM customer
      INTERSECT
      SELECT s_nationkey AS x FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS tag, x FROM (
      SELECT c_nationkey AS x FROM customer
      EXCEPT
      SELECT s_nationkey AS x FROM supplier)
    """)
def q40(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("x"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("x"))
    both = c.intersect(s).select(F.lit("both").alias("tag"), "x")
    only = c.subtract(s).select(F.lit("customer_only").alias("tag"), "x")
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# multi-level aggregation (§2.4 — grouping sets family)
# ---------------------------------------------------------------------------

@_q("q41_rollup",
    "GROUP BY ROLLUP — subtotal + grand-total levels in one pass "
    "(§2.4: grouping-sets surface the reference lacks)",
    """
    SELECT coalesce(l_returnflag, '(all)') AS rf,
           coalesce(l_linestatus, '(all)') AS ls,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """)
def q41(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
              .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)"))
                    .cast("double").alias("sum_qty"),
                   F.count("*").alias("n"))
              .select(F.coalesce("l_returnflag", F.lit("(all)")).alias("rf"),
                      F.coalesce("l_linestatus", F.lit("(all)")).alias("ls"),
                      "sum_qty", "n"))


@_q("q42_cube",
    "GROUP BY CUBE over (event_type, day bucket) — all grouping-set "
    "combinations in one shuffle (§2.4)",
    f"""
    SELECT coalesce(event_type, '(all)') AS et,
           coalesce(epoch_us(ts) // {US_DAY}, -1) AS day_no,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(14,6))) AS DOUBLE) AS value_sum
    FROM events GROUP BY CUBE (event_type, epoch_us(ts) // {US_DAY})
    """)
def q42(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events") \
        .withColumn("day_no0", F.expr(f"ts_us div {US_DAY}"))
    return (ev.cube("event_type", "day_no0")
              .agg(F.count("*").alias("n"),
                   F.sum(F.col("value").cast("decimal(14,6)"))
                    .cast("double").alias("value_sum"))
              .select(F.coalesce("event_type", F.lit("(all)")).alias("et"),
                      F.coalesce("day_no0", F.lit(-1)).alias("day_no"),
                      "n", "value_sum"))


# ---------------------------------------------------------------------------
# window frames (§2.5 — RANGE frames beyond the reference's lag/row_number)
# ---------------------------------------------------------------------------

@_q("q43_range_frame",
    "trailing 1-hour RANGE-frame window per user: event count + exact "
    "decimal sum over a value-range frame (§2.5 extension)",
    f"""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           count(*) OVER w AS n_1h,
           CAST(sum(CAST(value AS DECIMAL(14,6))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {US_HOUR} PRECEDING AND CURRENT ROW)
    """)
def q43(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts_us")
               .rangeBetween(-US_HOUR, 0))
    return ev.select(
        "event_id", "user_id", "ts_us",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(14,6)")).over(w)
         .cast("double").alias("sum_1h"))


@_q("q49_window_suite",
    "ranking + navigation window functions beyond the reference's "
    "lag/row_number: lead, dense_rank, percent_rank, cume_dist, "
    "first/last value over running frames (§2.5 extension)",
    """
    SELECT event_id, user_id,
           lead(value, 1) OVER w AS next_value,
           dense_rank() OVER r AS value_rank,
           round(percent_rank() OVER r, 6) AS pct_rank,
           round(cume_dist() OVER r, 6) AS cume,
           first_value(event_id) OVER w AS first_event,
           last_value(event_id) OVER
             (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
           r AS (PARTITION BY user_id ORDER BY value, event_id)
    """)
def q49(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    r = Window.partitionBy("user_id").orderBy("value", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id", "user_id",
        F.lead("value", 1).over(w).alias("next_value"),
        F.dense_rank().over(r).alias("value_rank"),
        F.round(F.percent_rank().over(r), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(r), 6).alias("cume"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(wfull).alias("last_event"))


# ---------------------------------------------------------------------------
# distinct aggregates (§2.4 — native in Catalyst)
# ---------------------------------------------------------------------------

@_q("q44_distinct_agg",
    "exact COUNT(DISTINCT ...) per group — the distinct-agg surface "
    "(§2.4; Catalyst expands to a two-phase aggregate)",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """)
def q44(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # Each distinct count runs as its own distinct-then-count branch
    # joined on the 3-row group key, NOT as multiple countDistincts in
    # one agg: RewriteDistinctAggregates compiles the latter through
    # an Expand whose gid-group ordering follows session expression-id
    # state (the q159 digest flake, round 8), and the Expand also
    # triples shuffle rows at scale.  Single-distinct branches compile
    # to plain deterministic two-phase hash aggregates, and each
    # shuffles compact (group, key) pairs instead of expanded rows.
    s = (li.select("l_returnflag", "l_suppkey").distinct()
         .groupBy("l_returnflag").agg(F.count("*").alias("n_supp")))
    p = (li.select("l_returnflag", "l_partkey").distinct()
         .groupBy("l_returnflag").agg(F.count("*").alias("n_part")))
    n = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    return (n.join(s, "l_returnflag").join(p, "l_returnflag")
            .select("l_returnflag", "n_supp", "n_part", "n"))


# ---------------------------------------------------------------------------
# JSON + string/regex scalar functions (§2.7 F12 extension)
# ---------------------------------------------------------------------------

@_q("q45_json_string",
    "JSON field extraction (F12 get_json_object), regexp extraction, string "
    "case/substring math, epoch-derived hour bucket (§2.7)",
    f"""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           CAST(regexp_extract(props, '([0-9]+)', 1) AS INTEGER) AS k_re,
           upper(substr(event_type, 1, 3)) AS et3,
           length(event_type) AS et_len,
           (epoch_us(ts) % {US_DAY}) // {US_HOUR} AS hour_utc
    FROM events WHERE event_type IN ('purchase', 'signup')
    """)
def q45(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (ev.where(F.col("event_type").isin("purchase", "signup"))
              .select(
                  "event_id",
                  F.get_json_object("props", "$.k").cast("int").alias("k"),
                  F.regexp_extract("props", "([0-9]+)", 1).cast("int")
                   .alias("k_re"),
                  F.upper(F.substring("event_type", 1, 3)).alias("et3"),
                  F.length("event_type").alias("et_len"),
                  F.expr(f"(ts_us % {US_DAY}) div {US_HOUR}")
                   .alias("hour_utc")))


# ---------------------------------------------------------------------------
# ANN scale paths (rows-only: approximate by design, library-tested for
# recall/exactness in tests/test_llm_ops.py)
# ---------------------------------------------------------------------------

def _query_vec(spark, sf_dir, vec_id: int = 0):
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.where(F.col("vec_id") == vec_id).select("embedding").first()
    return emb, [float(x) for x in row[0]]


@_q("q46_ann_lsh",
    "ANN top-k via sign-LSH bucket + multiprobe, exact cosine re-rank "
    "(similarity.lsh_topk — 100 TB scale path for q22)",
    None)
def q46(spark, sf_dir):
    emb, qvec = _query_vec(spark, sf_dir)
    out = similarity.lsh_topk(emb.where(F.col("vec_id") != 0), qvec, k=10,
                              multiprobe_bits=1)
    return out.select("vec_id", F.round("cos_sim", 5).alias("cos_sim"))


@_q("q47_ann_ivf",
    "ANN top-k via IVF coarse quantizer, n_probe=2 cells, exact cosine "
    "re-rank (similarity.ivf_topk — 100 TB scale path for q22)",
    None)
def q47(spark, sf_dir):
    emb, qvec = _query_vec(spark, sf_dir)
    cents = similarity.sample_centroids(emb, n_centroids=8)
    out = similarity.ivf_topk(emb.where(F.col("vec_id") != 0), qvec, k=10,
                              centroids=cents, n_probe=2)
    return out.select("vec_id", F.round("cos_sim", 5).alias("cos_sim"))


@_q("q86_pq_ann",
    "ANN top-k via IVF-PQ: per-subspace codebooks (deterministic sampled "
    "centroids), SMALLINT codes, cell probe + asymmetric-distance scoring "
    "over the code column only (similarity.pq_encode/ivfpq_topk — the "
    "billion-vector storage layout: ~30× less IO than a float scan)",
    None)  # rows-only: approximate by design (like q46/q47)
def q86(spark, sf_dir):
    import numpy as np
    emb, qvec = _query_vec(spark, sf_dir)
    base = emb.where(F.col("vec_id") != 0)
    # deterministic sampled codebooks (k-means-free, like q47's
    # sample_centroids — the MLlib-trained path is pq_train, library-tested)
    rows = (base.orderBy("vec_id").limit(16)
            .select("embedding").collect())
    sub = np.array([r.embedding for r in rows], dtype=np.float64)
    dim = sub.shape[1]
    m, dsub = 8, dim // 8
    books = np.stack([sub[:, j * dsub:(j + 1) * dsub] for j in range(m)])
    cents = similarity.sample_centroids(base, n_centroids=4)
    stored = similarity.pq_encode(similarity.ivf_assign(base, cents), books)
    out = similarity.ivfpq_topk(stored, cents, books, qvec, 10, n_probe=2)
    return out.select("vec_id", F.round("adc_dist", 5).alias("adc_dist"))


# ---------------------------------------------------------------------------
# multimodal plumbing (rows-only: features are codec-derived vectors with
# no SQL analog — the Spark-side schema/batching/partitioning plus the REAL
# WAV-PCM / BMP decode paths are what this declares)
# ---------------------------------------------------------------------------

@_q("q48_multimodal_features",
    "binary media columns + Arrow-batched feature extraction: real "
    "WAV-PCM (stdlib wave + FFT bands), 24-bit BMP (numpy pixel parse) "
    "and RAWV video (uncompressed frame container, middle-frame grid "
    "luma + motion statistic) decodes; sha256 stub only for undecodable "
    "payloads (sources.multimodal synthesize_media -> extract_features)",
    None)
def q48(spark, sf_dir):
    from ..sources.multimodal import synthesize_media
    d = load_table(spark, sf_dir, "documents")
    keys = d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"))
    feats = extract_features(synthesize_media(keys), dim=16)
    return feats.select(
        "media_id", "kind", "backend",
        F.size("feature").alias("dim"),
        F.round(F.element_at("feature", 1).cast("double"), 5).alias("f0"))


# ---------------------------------------------------------------------------
# grouping sets, sessionization, unpivot, interpolated percentiles
# (§2.4/§2.5/§2.8 extensions — native Catalyst surfaces)
# ---------------------------------------------------------------------------

@_q("q50_grouping_sets",
    "explicit GROUPING SETS with grouping() markers — the general form of "
    "the rollup/cube family (§2.4); one expand + one shuffle",
    """
    SELECT coalesce(o_orderpriority, '(all)') AS pri,
           coalesce(o_orderstatus, '(all)') AS st,
           CAST(grouping(o_orderpriority) AS INTEGER) AS g_pri,
           CAST(grouping(o_orderstatus) AS INTEGER) AS g_st,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS rev
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
    """)
def q50(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (o.groupingSets([["o_orderpriority", "o_orderstatus"],
                            ["o_orderpriority"], []],
                           "o_orderpriority", "o_orderstatus")
             .agg(F.count("*").alias("n"),
                  F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
                   .cast("double").alias("rev"),
                  F.grouping("o_orderpriority").cast("int").alias("g_pri"),
                  F.grouping("o_orderstatus").cast("int").alias("g_st"))
             .select(F.coalesce("o_orderpriority", F.lit("(all)")).alias("pri"),
                     F.coalesce("o_orderstatus", F.lit("(all)")).alias("st"),
                     "g_pri", "g_st", "n", "rev"))


US_30MIN = 1_800_000_000


@_q("q51_sessionize",
    "sessionization: 30-min-gap session ids via lag + running sum, then "
    "per-session stats (the batch analog of streaming session windows)",
    f"""
    WITH g AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {US_30MIN}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    s AS (
      SELECT user_id, event_id, ts_us,
             CAST(sum(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_no
      FROM g)
    SELECT user_id, session_no, count(*) AS n_events,
           min(ts_us) AS t_start_us, max(ts_us) - min(ts_us) AS duration_us
    FROM s GROUP BY user_id, session_no
    """)
def q51(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    is_new = F.when(prev.isNull()
                    | (F.col("ts_us") - prev > US_30MIN), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts_us", "event_id") \
                .rowsBetween(Window.unboundedPreceding, 0)
    s = ev.select("user_id", "event_id", "ts_us",
                  F.sum(is_new).over(run).cast("bigint").alias("session_no"))
    return (s.groupBy("user_id", "session_no")
             .agg(F.count("*").alias("n_events"),
                  F.min("ts_us").alias("t_start_us"),
                  (F.max("ts_us") - F.min("ts_us")).alias("duration_us")))


@_q("q52_unpivot",
    "UNPIVOT / melt: wide measure columns to long (measure, val) rows — "
    "the R4 reshape direction as a native operator (§2.8)",
    """
    SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure,
           l_extendedprice AS val
    FROM lineitem WHERE l_orderkey % 10 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey % 10 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey % 10 = 0
    """)
def q52(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem") \
        .where(F.col("l_orderkey") % 10 == 0)
    return li.unpivot(["l_orderkey", "l_linenumber"],
                      ["l_extendedprice", "l_discount", "l_tax"],
                      "measure", "val")


@_q("q53_percentile_cont",
    "interpolated percentiles (percentile_cont semantics) per group — the "
    "scalar complement of the exact array quantiles in q16 (§2.4)",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 5) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 5) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 5) AS p75,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """)
def q53(spark, sf_dir):
    # sort-rank selection (q34's round-5 rewrite): ONE ranked pass feeds
    # all three interpolated percentiles, vs percentile() keeping an
    # interpreted value-buffer per expression (3 maps over 600k rows —
    # 2x this plan's cost once the noop action stopped count() from
    # pruning it).  Per-group serialization of the sort is the q127
    # caveat; q117's histogram refinement is the huge-group scale path.
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_returnflag", "l_extendedprice")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = li.select(
        "l_returnflag", "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("l_returnflag")).alias("n"))
    ps = ((".25", 0.25), (".5", 0.50), (".75", 0.75))
    aggs = []
    for i, (_, p) in enumerate(ps):
        r = (F.col("n") - 1) * F.lit(p)
        aggs += [
            F.min(F.when(F.col("rn") == F.floor(r) + 1,
                         F.col("l_extendedprice"))).alias(f"lo{i}"),
            F.min(F.when(F.col("rn") == F.ceil(r) + 1,
                         F.col("l_extendedprice"))).alias(f"hi{i}")]
    g = (ranked.groupBy("l_returnflag")
         .agg(F.max("n").alias("n"), *aggs))
    cols = ["l_returnflag"]
    for i, (tag, p) in enumerate((("p25", 0.25), ("p50", 0.50),
                                  ("p75", 0.75))):
        r = (F.col("n") - 1) * F.lit(p)
        frac = r - F.floor(r)
        cols.append(F.round(
            F.col(f"lo{i}") + frac * (F.col(f"hi{i}") - F.col(f"lo{i}")),
            5).alias(tag))
    cols.append(F.col("n"))
    return g.select(*cols)


@_q("q54_batch_topk",
    "batched similarity search: exact cosine top-k for MANY query vectors "
    "in ONE table scan (similarity.cosine_topk_batch — per-partition BLAS "
    "local top-k, then a per-query window; the production ANN shape)",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe
               FROM embeddings WHERE vec_id IN (0, 1, 2, 3)),
    s AS (
      SELECT q.query_id, e.vec_id,
             list_sum(list_transform(generate_series(1, 64),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE) * x)))
              * sqrt(list_sum(list_transform(q.qe,
                  x -> CAST(x AS DOUBLE) * x)))) AS cos
      FROM embeddings e CROSS JOIN q),
    r AS (SELECT query_id, vec_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, vec_id) AS rn
          FROM s)
    SELECT query_id, vec_id, round(cos, 5) AS cos_sim FROM r WHERE rn <= 10
    """)
def q54(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qrows = (emb.where(F.col("vec_id").isin(0, 1, 2, 3))
                .select("vec_id", "embedding").collect())
    queries = {int(r.vec_id): [float(x) for x in r.embedding] for r in qrows}
    return similarity.cosine_topk_batch(emb, queries, 10, round_to=5)


# ---------------------------------------------------------------------------
# deterministic sampling / splitting (training-data pipeline ops; membership
# is a pure function of the data, so both engines agree row-for-row)
# ---------------------------------------------------------------------------

_DUCK_HB = ("cast(('0x' || substr(md5(cast(doc_id AS VARCHAR){salt}), 1, 15)) "
            "AS BIGINT) % 10000")


@_q("q55_hash_split",
    "reproducible train/val/test split + independent 25% subsample, both "
    "from key hashes (operators.sampling — stable under repartitioning and "
    "appends, unlike sample()/randomSplit; leakage-proof across runs)",
    f"""
    WITH b AS (SELECT doc_id,
                      {_DUCK_HB.format(salt="")} AS hb,
                      {_DUCK_HB.format(salt=" || 's1'")} AS hs
               FROM documents)
    SELECT doc_id,
           CASE WHEN hb < 8000 THEN 'train'
                WHEN hb < 9000 THEN 'val' ELSE 'test' END AS split,
           hs < 2500 AS in_sample
    FROM b
    """)
def q55(spark, sf_dir):
    from ..operators import sampling
    d = load_table(spark, sf_dir, "documents")
    out = sampling.hash_split(d, {"train": 0.8, "val": 0.1, "test": 0.1},
                              "doc_id")
    return out.select(
        "doc_id", "split",
        (sampling.hash_bucket("doc_id", "s1") < 2500).alias("in_sample"))


@_q("q56_weighted_mixture",
    "data mixing: per-source keep rates via key hashes "
    "(operators.sampling.weighted_mixture — the corpus-mixture op of an "
    "LLM data pipeline; map-only, no shuffle)",
    f"""
    WITH b AS (SELECT doc_id, lang, {_DUCK_HB.format(salt="")} AS hb
               FROM documents)
    SELECT doc_id, lang FROM b
    WHERE (lang = 'en')
       OR (lang = 'fr' AND hb < 5000)
       OR (lang = 'es' AND hb < 2500)
    """)
def q56(spark, sf_dir):
    from ..operators import sampling
    d = load_table(spark, sf_dir, "documents")
    out = sampling.weighted_mixture(
        d, {"en": 1.0, "fr": 0.5, "es": 0.25}, "lang", "doc_id")
    return out.select("doc_id", "lang")


US_2H = 7_200_000_000


@_q("q57_interval_join",
    "interval (range) join: events falling inside each user's first-2h "
    "window, via the bucketed equi-join rewrite (functions.interval_join — "
    "Spark has no native range join; naive BETWEEN plans nested-loop)",
    f"""
    WITH w AS (SELECT user_id AS w_user, min(epoch_us(ts)) AS s_us,
                      min(epoch_us(ts)) + {US_2H} AS e_us
               FROM events GROUP BY user_id)
    SELECT w.w_user, count(*) AS n_events, min(e.event_id) AS first_event
    FROM w JOIN events e ON epoch_us(e.ts) BETWEEN w.s_us AND w.e_us
    GROUP BY w.w_user
    """)
def q57(spark, sf_dir):
    from ..functions import interval_join
    ev = load_table(spark, sf_dir, "events")
    w = (ev.groupBy(F.col("user_id").alias("w_user"))
           .agg(F.min("ts_us").alias("s_us"),
                (F.min("ts_us") + US_2H).alias("e_us")))
    j = interval_join(ev, w, "ts_us", "s_us", "e_us", bucket=US_2H // 4)
    return (j.groupBy("w_user")
             .agg(F.count("*").alias("n_events"),
                  F.min("event_id").alias("first_event")))


def _pii_scrub_sql() -> str:
    from ..operators.text import PII_PATTERNS
    expr = "text"
    for n, p in PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{p}', '[{n}]', 'g')"
    return f"""
    WITH t AS (SELECT doc_id,
                      substr(text, 1, 40) || ' contact user'
                        || CAST(doc_id AS VARCHAR) || '@example.com or 555 123 4567'
                        || ' ip 10.0.0.' || CAST(doc_id % 255 AS VARCHAR) AS text
               FROM documents)
    SELECT doc_id, {expr} AS text FROM t
    """


@_q("q58_pii_scrub",
    "PII redaction (email/phone/IP/SSN → typed placeholders) via chained "
    "regexp_replace — the pre-training scrub pass (operators.text.scrub_pii; "
    "map-only, portable character-class-only patterns)",
    None)  # oracle generated below from the same pattern table
def q58(spark, sf_dir):
    from ..operators.text import scrub_pii
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.concat(F.substring("text", 1, 40), F.lit(" contact user"),
                 F.col("doc_id").cast("string"),
                 F.lit("@example.com or 555 123 4567 ip 10.0.0."),
                 (F.col("doc_id") % 255).cast("string")).alias("text"))
    return scrub_pii(t)


from .corpus import CORPUS as _CORPUS_EXT  # noqa: E402
for _e in _CORPUS_EXT:
    if _e.name == "q58_pii_scrub":
        _e.sql = _pii_scrub_sql()


@_q("q59_approx_aggs",
    "sketch aggregates: HLL++ approx_count_distinct and approx_percentile "
    "per group — the fixed-memory substitutes for q44/q53 at 100 TB "
    "(rows-only: sketch values are engine-specific by nature; the library "
    "test bounds their error vs exact)",
    None)
def q59(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
              .agg(F.approx_count_distinct("l_partkey", 0.02)
                    .alias("n_part_approx"),
                   F.percentile_approx("l_extendedprice", 0.5, 10000)
                    .alias("p50_approx"),
                   F.count("*").alias("n"))
              .orderBy("l_returnflag"))


@_q("q60_sequence_pack",
    "sequence packing: per-language streams, running token sum, "
    "pack_id = start div 2048 — the GPT-style batch-assembly op "
    "(operators.packing; one window + one aggregate, no UDF)",
    """
    WITH t AS (SELECT lang, doc_id,
                      len(string_split(trim(text), ' ')) AS n_tok
               FROM documents),
    c AS (SELECT lang, doc_id, n_tok,
                 CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum
          FROM t)
    SELECT lang, (cum - n_tok) // 2048 AS pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM c GROUP BY lang, (cum - n_tok) // 2048
    """)
def q60(spark, sf_dir):
    from ..operators.packing import pack_stats
    d = load_table(spark, sf_dir, "documents")
    t = d.select("lang", "doc_id",
                 F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok"))
    return pack_stats(t, "n_tok", 2048, by=["lang"], order=["doc_id"])


@_q("q61_quantize_embeddings",
    "int8 embedding quantization round-trip: per-vector symmetric scale, "
    "reconstruction error bound (similarity.quantize_embeddings — 4x "
    "smaller storage for 100 TB vector tables; map-only)",
    """
    WITH q AS (
      SELECT vec_id,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    z AS (
      SELECT vec_id, scale,
             list_transform(v, x -> CAST(round(x / scale) AS TINYINT)) AS qv,
             v
      FROM q WHERE scale > 0)
    SELECT vec_id,
           round(scale, 6) AS q_scale,
           CAST(list_sum(list_transform(qv, x -> CAST(x AS BIGINT)))
                AS BIGINT) AS q_sum,
           round(list_max(list_transform(list_zip(v, qv),
             p -> abs(p[1] - CAST(p[2] AS DOUBLE) * scale))), 6) AS max_err
    FROM z
    """)
def q61(spark, sf_dir):
    # qvec comes from the library op; the scale used for the error report is
    # recomputed at full double precision (the stored q_scale is FLOAT by
    # design — 4-byte storage — and would shift the 6th decimal vs the
    # oracle's double arithmetic)
    from ..operators.similarity import quantize_embeddings
    emb = load_table(spark, sf_dir, "embeddings")
    z = quantize_embeddings(emb).where(F.col("q_scale") > 0)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dscale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    err = F.array_max(F.zip_with(
        v, "qvec", lambda x, q: F.abs(x - q.cast("double") * dscale)))
    return z.select(
        "vec_id",
        F.round(dscale, 6).alias("q_scale"),
        F.aggregate("qvec", F.lit(0).cast("bigint"),
                    lambda a, x: a + x.cast("bigint")).alias("q_sum"),
        F.round(err, 6).alias("max_err"))


@_q("q75_rolling_median",
    "rolling exact median over a bounded ROWS frame (5-row window per "
    "event_type): Spark lacks a median window aggregate, so the engine "
    "composes collect_list over the frame with the exact array-median "
    "expression (functions.array_median) — frame state stays O(frame), "
    "and the sort is per partition key, never global",
    """
    SELECT event_id, event_type, epoch_us(ts) AS ts_us,
           round(median(value) OVER (
             PARTITION BY event_type
             ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS roll_med
    FROM events
    """)
def q75(spark, sf_dir):
    from pyspark.sql import Window
    from .. import functions as FN
    ev = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("event_type").orderBy("ts_us", "event_id")
               .rowsBetween(-4, 0))
    return ev.select(
        "event_id", "event_type", "ts_us",
        F.round(FN.array_median(F.collect_list("value").over(w)), 6)
         .alias("roll_med"))


@_q("q76_embedding_drift",
    "array-valued window navigation: per-label L2 drift between "
    "consecutive embeddings (lag of an ARRAY column + zip_with fold — "
    "the embedding-space monitoring shape; per-row math, one window "
    "shuffle on the label key)",
    """
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
             lag(list_transform(embedding, x -> CAST(x AS DOUBLE)))
               OVER (PARTITION BY label ORDER BY vec_id) AS prev
      FROM embeddings)
    SELECT vec_id, label,
           round(sqrt(list_sum(list_transform(list_zip(e, prev),
                 p -> (p[1] - p[2]) * (p[1] - p[2])))), 6) AS l2_drift
    FROM v WHERE prev IS NOT NULL
    """)
def q76(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy("vec_id")
    ed = F.expr("transform(embedding, x -> cast(x as double))")
    v = e.select("vec_id", "label", ed.alias("e"),
                 F.lag(ed).over(w).alias("prev"))
    diff2 = F.zip_with("e", "prev", lambda a, b: (a - b) * (a - b))
    l2 = F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x))
    return (v.where(F.col("prev").isNotNull())
             .select("vec_id", "label", F.round(l2, 6).alias("l2_drift")))


@_q("q77_ntile_nth",
    "remaining ranking/navigation surface: ntile quartiles + nth_value "
    "over a full-partition frame (completes the §2.5 window family with "
    "q43/q49/q51/q75/q76)",
    """
    SELECT event_id, user_id,
           ntile(4) OVER (PARTITION BY user_id
                          ORDER BY value, event_id) AS quartile,
           nth_value(event_id, 2) OVER
             (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_event
    FROM events
    """)
def q77(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    r = Window.partitionBy("user_id").orderBy("value", "event_id")
    wfull = (Window.partitionBy("user_id").orderBy("ts_us", "event_id")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    return ev.select(
        "event_id", "user_id",
        F.ntile(4).over(r).alias("quartile"),
        F.nth_value("event_id", 2).over(wfull).alias("second_event"))


@_q("q82_stratified_sample",
    "per-stratum deterministic sampling (operators.sampling."
    "stratified_sample — sampleBy without its seed/partitioning "
    "instability): per-language keep rates with a default for unlisted "
    "strata; map-only, membership a pure function of the data",
    f"""
    WITH b AS (SELECT doc_id, lang, source,
                      {_DUCK_HB.format(salt=" || 'strat'")} AS hb
               FROM documents)
    SELECT doc_id, lang, source FROM b
    WHERE hb < CASE lang WHEN 'en' THEN 5000
                         WHEN 'fr' THEN 2500
                         WHEN 'es' THEN 1250 ELSE 1000 END
    """)
def q82(spark, sf_dir):
    from ..operators import sampling
    d = load_table(spark, sf_dir, "documents")
    out = sampling.stratified_sample(
        d, {"en": 0.5, "fr": 0.25, "es": 0.125}, "lang", "doc_id",
        salt="strat", default=0.1)
    return out.select("doc_id", "lang", "source")


@_q("q83_seeded_shuffle",
    "deterministic global training order (operators.sampling."
    "seeded_shuffle): md5(seed|key) total order + scale-safe global "
    "position (range-partitioned rank + tiny offset frame — no "
    "single-task Window, unlike orderBy(rand(seed)) which isn't even "
    "reproducible across partitionings)",
    """
    SELECT doc_id, position FROM (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY md5('42|' || cast(doc_id AS VARCHAR))) - 1
               AS position
      FROM documents)
    """)
def q83(spark, sf_dir):
    from ..operators import sampling
    d = load_table(spark, sf_dir, "documents")
    return (sampling.seeded_shuffle(d, "doc_id", seed="42")
            .select("doc_id", "position"))


# ---------------------------------------------------------------------------
# Z-order layout, grouped regression, semantic dedup (q89, q90, q92)
# ---------------------------------------------------------------------------

def _duck_interleave(x: str, y: str, bits: int = 8) -> str:
    """DuckDB Morton interleave: bit i of x → 2i, of y → 2i+1."""
    terms = [f"((({c} >> {i}) & 1) << {i * 2 + j})"
             for i in range(bits) for j, c in enumerate((x, y))]
    return " + ".join(terms)


@_q("q89_zorder_cells",
    "Z-order layout clustering (functions.zorder_key / sources.bucketed."
    "zorder_write — the OPTIMIZE ZORDER primitive): range-scale both keys "
    "to a 256-cell grid, Morton-interleave, then show that every "
    "1024-wide z-cell bounds a small RECTANGLE of (x, y) — the property "
    "that makes parquet min/max stats prune on either dimension",
    f"""
    WITH s AS (SELECT min(l_orderkey) AS mn1, max(l_orderkey) AS mx1,
                      min(l_partkey) AS mn2, max(l_partkey) AS mx2
               FROM lineitem),
    c AS (SELECT (l_orderkey - mn1) * 256 // (mx1 - mn1 + 1) AS x,
                 (l_partkey - mn2) * 256 // (mx2 - mn2 + 1) AS y
          FROM lineitem, s),
    z AS (SELECT x, y, {_duck_interleave('x', 'y')} AS zval FROM c)
    SELECT zval // 1024 AS zcell, count(*) AS n,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max
    FROM z GROUP BY zval // 1024
    """)
def q89(spark, sf_dir):
    from ..functions import zorder_key
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(F.min("l_orderkey").alias("mn1"),
                   F.max("l_orderkey").alias("mx1"),
                   F.min("l_partkey").alias("mn2"),
                   F.max("l_partkey").alias("mx2"))
    c = (li.crossJoin(F.broadcast(stats))
           .select(F.expr("(l_orderkey - mn1) * 256 div (mx1 - mn1 + 1)")
                    .alias("x"),
                   F.expr("(l_partkey - mn2) * 256 div (mx2 - mn2 + 1)")
                    .alias("y")))
    z = c.withColumn("zval", zorder_key(["x", "y"], bits=8))
    return (z.groupBy(F.expr("zval div 1024").alias("zcell"))
             .agg(F.count("*").alias("n"),
                  F.min("x").alias("x_min"), F.max("x").alias("x_max"),
                  F.min("y").alias("y_min"), F.max("y").alias("y_max")))


@_q("q90_grouped_regression",
    "per-group OLS trend of extendedprice ~ quantity (slope / intercept / "
    "r²) from EXACT decimal moments cast to double — the one-pass "
    "map-side-combine shape of F.regr_slope/regr_r2, with summation made "
    "engine-exact so the oracle hash is stable (regr_* built-ins "
    "accumulate in streaming double order, which differs per engine)",
    """
    WITH m AS (SELECT l_returnflag, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 6) AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM m
    """)
def q90(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(d2("l_quantity")).cast("double").alias("sx"),
        F.sum(d2("l_extendedprice")).cast("double").alias("sy"),
        F.sum(d2("l_quantity") * d2("l_quantity")).cast("double")
         .alias("sxx"),
        F.sum(d2("l_quantity") * d2("l_extendedprice")).cast("double")
         .alias("sxy"),
        F.sum(d2("l_extendedprice") * d2("l_extendedprice")).cast("double")
         .alias("syy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "l_returnflag", "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         .alias("r2"))


@_q("q92_semantic_dedup",
    "SemDeDup (Abbas et al. 2023) drop list over label clusters: any "
    "vector with a smaller-id same-cluster neighbor at cosine >= 0.35 is "
    "dropped, reporting its dominating neighbor — operators.similarity."
    "semantic_dedup (cosine_pairs BLAS blocks inside, keep-lowest-id "
    "rule; 0.35 is the demo threshold for this synthetic space)",
    """
    WITH p AS (SELECT a.vec_id AS d1, c.vec_id AS d2,
                 list_sum(list_transform(generate_series(1, 64),
                   i -> CAST(a.embedding[i] AS DOUBLE)
                      * CAST(c.embedding[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(a.embedding,
                        x -> CAST(x AS DOUBLE) * x)))
                  * sqrt(list_sum(list_transform(c.embedding,
                        x -> CAST(x AS DOUBLE) * x)))) AS cos
               FROM embeddings a JOIN embeddings c
                 ON a.label = c.label AND a.vec_id < c.vec_id)
    SELECT d2 AS vec_id, min(d1) AS dup_of, count(*) AS n_dups,
           max(round(cos, 5)) AS max_cos
    FROM p WHERE cos >= 0.35 GROUP BY d2
    """)
def q92(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, ["label"], threshold=0.35)


@_q("q93_salted_skew_agg",
    "skew-safe two-phase aggregation (functions.salted_agg): event_type "
    "has ~5 hot keys, so a plain groupBy funnels 20% of the table into "
    "one reducer — the salt splits each hot key across 16 partial "
    "reducers, then a cheap final combine; decimal sums make the result "
    "bit-equal to the plain GROUP BY the oracle runs",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(14,6))) AS DOUBLE) AS value_sum,
           min(value) AS value_min, max(value) AS value_max
    FROM events GROUP BY event_type
    """)
def q93(spark, sf_dir):
    from ..functions import salted_agg
    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev, ["event_type"],
        {"n": ("count", "value"),
         # exact decimal partials: the salted re-combine must not depend
         # on float summation order
         "value_sum": ("sum", F.col("value").cast("decimal(14,6)")),
         "value_min": ("min", F.col("value")),
         "value_max": ("max", F.col("value"))})
    return out.select("event_type", "n",
                      F.col("value_sum").cast("double").alias("value_sum"),
                      "value_min", "value_max")


@_q("q94_exact_median_large",
    "exact per-group median at any-cardinality scale (functions."
    "exact_median_large): value-compressed two-pass — per-(group, value) "
    "counts, cumulative-rank window over the COMPRESSED rows, middle "
    "ranks interpolated; the oracle ranks raw rows with a window",
    """
    WITH r AS (SELECT event_type, value,
                      row_number() OVER (PARTITION BY event_type
                                         ORDER BY value) AS rn,
                      count(*) OVER (PARTITION BY event_type) AS n
               FROM events WHERE value IS NOT NULL)
    SELECT event_type,
           CAST(sum(CASE WHEN rn = (n + 1) // 2 OR rn = n // 2 + 1
                         THEN value END) AS DOUBLE)
             / count(CASE WHEN rn = (n + 1) // 2 OR rn = n // 2 + 1
                          THEN 1 END) AS median,
           max(n) AS n
    FROM r GROUP BY event_type
    """)
def q94(spark, sf_dir):
    from ..functions import exact_median_large
    ev = load_table(spark, sf_dir, "events")
    return (exact_median_large(ev.select("event_type", "value"),
                               ["event_type"], "value")
            .select("event_type", "median", "n"))


# ---------------------------------------------------------------------------
# warehouse maintenance + profiling (round 3): last-wins upsert,
# equal-width histogram, winsorized robust mean
# ---------------------------------------------------------------------------

@_q("q102_merge_upsert",
    "last-wins MERGE/upsert (functions.merge_upsert): late 'update' events "
    "replace the per-user snapshot row from the base slice — unionByName + "
    "one key-window, the MERGE-less upsert of a plain-parquet warehouse",
    f"""
    WITH u AS (
      SELECT * FROM events WHERE epoch_us(ts) <  {us('2024-03-01')}
      UNION ALL
      SELECT * FROM events WHERE epoch_us(ts) >= {us('2024-03-01')}),
    r AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
      FROM u)
    SELECT user_id, event_id, ts_us, event_type, value
    FROM r WHERE rn = 1
    """)
def q102(spark, sf_dir):
    from ..functions import merge_upsert
    ev = load_table(spark, sf_dir, "events") \
        .select("user_id", "event_id", "ts_us", "event_type", "value")
    cut = us("2024-03-01")
    base = ev.where(F.col("ts_us") < cut)
    upd = ev.where(F.col("ts_us") >= cut)
    return merge_upsert(base, upd, keys=["user_id"],
                        order_by=["ts_us", "event_id"])


@_q("q103_histogram",
    "two-pass equal-width histogram (data profiling): global min/max "
    "broadcast back into a portable floor-division bucketizer — "
    "bucket arithmetic is plain IEEE ops, identical on both engines",
    """
    WITH s AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
               FROM lineitem)
    SELECT CASE WHEN hi = lo THEN 0
                ELSE least(CAST(floor((l_extendedprice - lo)
                                      / ((hi - lo) / 20.0)) AS INT), 19)
           END AS bin,
           count(*) AS n
    FROM lineitem, s
    GROUP BY bin
    """)
def q103(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s = li.agg(F.min("l_extendedprice").alias("lo"),
               F.max("l_extendedprice").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / 20.0
    # degenerate range (hi == lo) puts everything in bin 0 explicitly —
    # without the guard Spark's double /0.0 and DuckDB's diverge, and the
    # single-value case is unrepresentable
    bin_ = F.when(F.col("hi") == F.col("lo"), F.lit(0)) \
            .otherwise(F.least(
                F.floor((F.col("l_extendedprice") - F.col("lo"))
                        / width).cast("int"), F.lit(19)))
    return (li.crossJoin(F.broadcast(s))
              .groupBy(bin_.alias("bin"))
              .agg(F.count("*").alias("n")))


@_q("q104_winsorized_mean",
    "winsorized robust mean per group: clamp to the interpolated "
    "[p05, p95] band (q53's percentile_cont), then average — the clamped "
    "values are quantized to fixed-point BIGINT before the sum so the "
    "aggregate is order-independent on both engines",
    """
    WITH b AS (
      SELECT lang, quantile_cont(n_chars, 0.05) AS p05,
                   quantile_cont(n_chars, 0.95) AS p95
      FROM documents GROUP BY lang)
    SELECT d.lang, count(*) AS n,
           round(CAST(sum(CAST(round(least(greatest(
                     CAST(n_chars AS DOUBLE), p05), p95) * 1000000)
                   AS BIGINT)) AS DOUBLE) / 1e6 / count(*), 6) AS wmean
    FROM documents d JOIN b USING (lang)
    GROUP BY d.lang
    """)
def q104(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    b = d.groupBy("lang").agg(F.percentile("n_chars", 0.05).alias("p05"),
                              F.percentile("n_chars", 0.95).alias("p95"))
    clamped = F.least(F.greatest(F.col("n_chars").cast("double"),
                                 F.col("p05")), F.col("p95"))
    q = F.round(clamped * 1000000).cast("bigint")
    return (d.join(F.broadcast(b), "lang")
             .groupBy("lang")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum(q).cast("double") / 1e6 / F.count("*"), 6)
                   .alias("wmean")))


@_q("q107_mad_outliers",
    "robust per-group outlier detection: modified z-score from the "
    "median and MAD (two exact-percentile aggregates broadcast back; "
    "the robust-stats complement of q104's winsorize)",
    """
    WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
               FROM events GROUP BY event_type),
    d AS (SELECT e.event_type, e.event_id, e.value, m.med,
                 abs(e.value - m.med) AS adev
          FROM events e JOIN m USING (event_type)),
    mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM d GROUP BY event_type)
    SELECT d.event_type, d.event_id,
           round((d.value - d.med) / (1.4826 * mad.mad), 6) AS rz
    FROM d JOIN mad USING (event_type)
    WHERE abs(d.value - d.med) > 3.5 * (1.4826 * mad.mad)
    """)
def q107(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events") \
        .select("event_type", "event_id", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med"))
    d = (ev.join(F.broadcast(med), "event_type")
           .withColumn("adev", F.abs(F.col("value") - F.col("med"))))
    mad = d.groupBy("event_type").agg(
        F.percentile("adev", 0.5).alias("mad"))
    scale = 1.4826 * F.col("mad")
    return (d.join(F.broadcast(mad), "event_type")
             .where(F.col("adev") > 3.5 * scale)
             .select("event_type", "event_id",
                     F.round((F.col("value") - F.col("med")) / scale, 6)
                      .alias("rz")))


@_q("q108_cohort_retention",
    "cohort retention: users grouped by first-activity day, retained if "
    "active on day+1 / week 2 — min-agg cohort assignment + conditional "
    "distinct counts (the canonical product-analytics rollup)",
    f"""
    WITH f AS (SELECT user_id,
                      min(epoch_us(ts) // {US_DAY}) AS cohort_day
               FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, epoch_us(ts) // {US_DAY} AS day
          FROM events)
    SELECT f.cohort_day, count(DISTINCT f.user_id) AS cohort_size,
           count(DISTINCT CASE WHEN a.day = f.cohort_day + 1
                               THEN a.user_id END) AS retained_d1,
           count(DISTINCT CASE WHEN a.day >= f.cohort_day + 7
                                AND a.day < f.cohort_day + 14
                               THEN a.user_id END) AS retained_w2
    FROM f JOIN a USING (user_id)
    GROUP BY f.cohort_day
    """)
def q108(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events") \
        .select("user_id", F.expr(f"ts_us div {US_DAY}").alias("day"))
    # ONE explicit user_id exchange feeds everything downstream: a
    # HashPartitioning(user_id) satisfies ClusteredDistribution for the
    # (user_id, day) distinct (subset rule), the per-user min-agg, and
    # the equi-join — without it, `ev.distinct()` plans its own
    # (user_id, day) exchange and the data full-shuffles twice
    # (plan contract pins the single full-data exchange + reuse)
    ev = ev.repartition("user_id")
    f = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    a = ev.distinct()
    j = f.join(a, "user_id")
    # two-level aggregate instead of three countDistincts: per
    # (cohort_day, user_id) boolean retention flags, then plain sums.
    # Equivalent (a user appears once per cohort by construction), and
    # strictly better at scale AND for the drift alarm: the
    # countDistinct form compiles through RewriteDistinctAggregates
    # into a 3x row-multiplying Expand whose gid-to-expression
    # assignment is NONDETERMINISTIC run to run (same session, same
    # tree — the round-5/6 q108 digest flips), while this is one
    # deterministic Expand-free two-phase agg riding the user_id
    # exchange
    per_user = (j.groupBy("cohort_day", "user_id")
                .agg(F.max(F.when(F.col("day") == F.col("cohort_day") + 1,
                                  1).otherwise(0)).alias("d1"),
                     F.max(F.when(
                         (F.col("day") >= F.col("cohort_day") + 7)
                         & (F.col("day") < F.col("cohort_day") + 14),
                         1).otherwise(0)).alias("w2")))
    return (per_user.groupBy("cohort_day")
            .agg(F.count("*").alias("cohort_size"),
                 F.sum("d1").alias("retained_d1"),
                 F.sum("w2").alias("retained_w2")))


@_q("q110_ohlc_bars",
    "time-bar downsampling (OHLC): open/high/low/close + decimal volume "
    "per (event_type, hour) — first/last via rank-1 window picks "
    "(portable and tie-deterministic on both engines; min_by/arg_min "
    "struct-ordering corners differ across dialects)",
    f"""
    WITH w AS (SELECT event_type, epoch_us(ts) // {US_HOUR} AS hour_no,
                      value, epoch_us(ts) AS t_us, event_id
               FROM events),
    r AS (SELECT *,
                 row_number() OVER (PARTITION BY event_type, hour_no
                                    ORDER BY t_us, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, hour_no
                                    ORDER BY t_us DESC, event_id DESC)
                   AS rn_d
          FROM w)
    SELECT event_type, hour_no,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high, min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(sum(CAST(value AS DECIMAL(14,6))) AS DOUBLE) AS volume,
           count(*) AS n
    FROM r GROUP BY event_type, hour_no
    """)
def q110(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"ts_us div {US_HOUR}").alias("hour_no"),
        "value", "ts_us", "event_id")
    # one shuffle on (event_type, hour_no) serves both rank windows AND
    # the final aggregate (co-partitioned; the second window only re-sorts
    # within partitions)
    wa = Window.partitionBy("event_type", "hour_no") \
               .orderBy(F.asc("ts_us"), F.asc("event_id"))
    wd = Window.partitionBy("event_type", "hour_no") \
               .orderBy(F.desc("ts_us"), F.desc("event_id"))
    r = ev.select(
        "event_type", "hour_no", "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"))
    return (r.groupBy("event_type", "hour_no")
             .agg(F.max(F.when(F.col("rn_a") == 1, F.col("value")))
                   .alias("open"),
                  F.max("value").alias("high"), F.min("value").alias("low"),
                  F.max(F.when(F.col("rn_d") == 1, F.col("value")))
                   .alias("close"),
                  F.sum(F.col("value").cast("decimal(14,6)"))
                   .cast("double").alias("volume"),
                  F.count("*").alias("n")))


@_q("q111_forward_fill",
    "regular-grid resampling with forward fill: per-user hourly grid "
    "(sequence explode) left-joined with the hour's last observation, "
    "gaps filled by last_value IGNORE NULLS over an explicit ROWS frame "
    "(the timeseries densification every monitoring warehouse runs)",
    f"""
    WITH span AS (
      SELECT user_id, min(epoch_us(ts) // {US_HOUR}) AS lo,
             max(epoch_us(ts) // {US_HOUR}) AS hi
      FROM events GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi)) AS hour_no
      FROM span),
    obs AS (
      SELECT user_id, hour_no, value FROM (
        SELECT user_id, epoch_us(ts) // {US_HOUR} AS hour_no, value,
               row_number() OVER (
                 PARTITION BY user_id, epoch_us(ts) // {US_HOUR}
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1)
    SELECT g.user_id, g.hour_no, o.value AS observed,
           last_value(o.value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hour_no
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM grid g LEFT JOIN obs o
      ON g.user_id = o.user_id AND g.hour_no = o.hour_no
    """)
def q111(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"ts_us div {US_HOUR}").alias("hour_no"),
        "value", "ts_us", "event_id")
    # one user_id-keyed shuffle family: span agg, last-per-hour window,
    # grid join, and the fill window are all co-partitioned on user_id
    span = ev.groupBy("user_id").agg(F.min("hour_no").alias("lo"),
                                     F.max("hour_no").alias("hi"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("lo", "hi")).alias("hour_no"))
    w_last = Window.partitionBy("user_id", "hour_no") \
                   .orderBy(F.desc("ts_us"), F.desc("event_id"))
    obs = (ev.withColumn("rn", F.row_number().over(w_last))
             .where(F.col("rn") == 1)
             .select("user_id", "hour_no", "value"))
    w_fill = Window.partitionBy("user_id").orderBy("hour_no") \
                   .rowsBetween(Window.unboundedPreceding, 0)
    return (grid.join(obs, ["user_id", "hour_no"], "left")
                .select("user_id", "hour_no",
                        F.col("value").alias("observed"),
                        F.last("value", ignorenulls=True).over(w_fill)
                         .alias("filled")))


@_q("q112_constraint_audit",
    "data-quality constraint audit (dbt-tests/Deequ shape): not-null, "
    "uniqueness, accepted values, range, and referential rules compile "
    "to ONE aggregate per table + one anti-join per FK — the report is "
    "O(rules), never O(rows) (operators/quality.audit)",
    """
    SELECT 'orders.o_orderkey.unique' AS rule,
           count(*) - count(DISTINCT o_orderkey) AS violations FROM orders
    UNION ALL
    SELECT 'orders.o_orderpriority.accepted_values',
           count(CASE WHEN o_orderpriority NOT IN
                  ('1-URGENT', '2-HIGH', '3-MEDIUM',
                   '4-NOT SPECIFIED', '5-LOW')
                  AND o_orderpriority IS NOT NULL THEN 1 END) FROM orders
    UNION ALL
    SELECT 'lineitem.l_quantity.range',
           count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.l_discount.range',
           count(CASE WHEN l_discount < 0.00 OR l_discount > 0.10 THEN 1
                 END)
    FROM lineitem
    UNION ALL
    SELECT 'customer.c_name.not_null',
           count(CASE WHEN c_name IS NULL THEN 1 END) FROM customer
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders.o_orderkey',
           (SELECT count(*) FROM lineitem l
            WHERE l.l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders.o_custkey->customer.c_custkey',
           (SELECT count(*) FROM orders o2
            WHERE o2.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o2.o_custkey))
    """)
def q112(spark, sf_dir):
    from ..operators import quality as Q
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    return Q.audit(
        {"orders": (o, [Q.unique(["o_orderkey"]),
                        Q.accepted_values("o_orderpriority",
                                          ["1-URGENT", "2-HIGH", "3-MEDIUM",
                                           "4-NOT SPECIFIED", "5-LOW"])]),
         "lineitem": (li, [Q.in_range("l_quantity", 1, 50),
                           Q.in_range("l_discount", 0.00, 0.10)]),
         "customer": (c, [Q.not_null("c_name")])},
        referential_rules=[
            ("lineitem.l_orderkey->orders.o_orderkey",
             li, "l_orderkey", o, "o_orderkey"),
            ("orders.o_custkey->customer.c_custkey",
             o, "o_custkey", c, "c_custkey")])


@_q("q114_snapshot_diff",
    "CDC snapshot diff (functions.snapshot_diff): insert/delete/update "
    "classification of two keyed snapshots via ONE full-outer join — "
    "base and current derived deterministically from orders",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_totalprice AS v FROM orders
      WHERE o_orderkey % 7 <> 0),
    cur AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS v
      FROM orders WHERE o_orderkey % 3 <> 0)
    SELECT coalesce(b.k, c.k) AS k,
           CASE WHEN b.k IS NULL THEN 'insert'
                WHEN c.k IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           b.v AS old_v, c.v AS new_v
    FROM base b FULL OUTER JOIN cur c ON b.k = c.k
    WHERE b.k IS NULL OR c.k IS NULL OR b.v <> c.v
    """)
def q114(spark, sf_dir):
    from ..functions import snapshot_diff
    o = load_table(spark, sf_dir, "orders")
    base = (o.where(F.col("o_orderkey") % 7 != 0)
             .select(F.col("o_orderkey").alias("k"),
                     F.col("o_totalprice").alias("v")))
    cur = (o.where(F.col("o_orderkey") % 3 != 0)
            .select(F.col("o_orderkey").alias("k"),
                    F.when(F.col("o_orderkey") % 5 == 0,
                           F.col("o_totalprice") + 1.0)
                     .otherwise(F.col("o_totalprice")).alias("v")))
    d = snapshot_diff(base, cur, keys=["k"], compare=["v"])
    return d.select("k", "op", F.col("old.v").alias("old_v"),
                    F.col("new.v").alias("new_v"))


@_q("q115_pagerank",
    "PageRank over the supplier->customer trade graph (operators/"
    "graph.pagerank: one join + one agg per power-iteration round, "
    "edges repartitioned once, localCheckpoint-bounded lineage; "
    "rows-only: iterative fixed point is not single-statement SQL — "
    "the library test pins exact numpy power-iteration parity)",
    None)
def q115(spark, sf_dir):
    from ..operators.graph import pagerank
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    edges = (li.join(o, li.l_orderkey == o.o_orderkey)
               .select(F.col("l_suppkey").alias("src"),
                       F.col("o_custkey").alias("dst")))
    r = pagerank(edges, max_iter=10, tol=None)
    return r.select("node",
                    F.round(F.col("rank") * 1e9).cast("bigint")
                     .alias("rank_e9"))
