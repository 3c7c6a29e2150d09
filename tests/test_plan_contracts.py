"""Physical-plan contracts: the properties that make these queries survive a
100× scale-up, asserted on the executed plan string so regressions that
silently drop pushdown / broadcast / pruning fail loudly.
"""

import re

import pytest

from nasctn_sea_ingest_spark.plans import CORPUS


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _q(name):
    # retired queries keep their plan contracts (tests/test_corpus keeps
    # their oracle) — search both lists
    from nasctn_sea_ingest_spark.plans import RETIRED
    return next(q for q in CORPUS + RETIRED if q.name == name)


def _final(df) -> str:
    """Executed plan, final-plan section only (after collect(), AQE's
    toString appends the Initial Plan too — counting nodes across both
    double-counts every exchange)."""
    return _plan(df).split("== Initial Plan ==")[0]


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def test_time_filters_are_pushed(spark, sf):
    """Epoch-microsecond predicates must reach the parquet scan as
    PushedFilters on the raw column (row-group min/max pruning)."""
    p = _plan(_q("q03_time_range").spark(spark, sf))
    assert "GreaterThanOrEqual(ts," in p and "LessThan(ts," in p
    p = _plan(_q("q01_pricing_summary").spark(spark, sf))
    assert "LessThanOrEqual(l_shipdate," in p
    p = _plan(_q("q04_conjunctive_slice").spark(spark, sf))
    # plan-string truncation can hide the tail of PushedFilters; the raw
    # (non-derived) comparison in the Filter node proves pushability
    assert ">= 1996-01-01" in p and "div 1000" not in p
    assert "PushedFilters: [IsNotNull" in p


def test_column_pruning(spark, sf):
    """A 4-column projection must not scan all 16 lineitem columns."""
    p = _plan(_q("q02_filter_project").spark(spark, sf))
    scan = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    read_cols = scan.split("ReadSchema:")[1]
    assert "l_orderkey" in read_cols
    assert "l_comment" not in read_cols and "l_shipmode" not in read_cols


def test_small_dims_broadcast(spark, sf):
    """nation/region joins must be broadcast, never shuffled sort-merge."""
    p = _plan(_q("q08_join_agg").spark(spark, sf))
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_semi_anti_stay_joins(spark, sf):
    for name, kind in (("q09_semi_join", "LeftSemi"),
                       ("q10_anti_join", "LeftAnti")):
        p = _plan(_q(name).spark(spark, sf))
        assert kind in p, name


def test_limiter_broadcasts_min_count(spark, sf):
    """The scalar min-group-size must broadcast, not shuffle the fact side
    against a 1-row frame."""
    p = _plan(_q("q06_group_limiter").spark(spark, sf))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "SortMergeJoin" not in p


def test_topk_is_partial(spark, sf):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-partition
    top-k + tiny driver merge), not a global sort."""
    p = _plan(_q("q07_topk").spark(spark, sf))
    assert "TakeOrderedAndProject" in p


def test_cosine_query_vector_broadcast(spark, sf):
    """Brute-force cosine top-k broadcasts the 1-row query side."""
    p = _plan(_q("q22_cosine_topk").spark(spark, sf))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_array_stats_no_shuffle(spark, sf):
    """Per-trace statistics (q21) are row-local: no Exchange in the plan."""
    p = _plan(_q("q21_trace_stats").spark(spark, sf))
    assert "Exchange" not in p


def test_asof_join_single_shuffle_per_side(spark, sf):
    """The as-of join is the sorted-union window trick: windows only, no
    range-explosion join."""
    p = _plan(_q("q11_asof_nearest").spark(spark, sf))
    assert "RunningWindowFunction" in p or "Window" in p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p


def test_unkeyed_asof_no_global_sort(spark, sf):
    """The unkeyed as-of (q11/q35) must NOT run its running windows in one
    global task: the bulk windows are partitioned by the percentile slice id
    __pid, and the only SinglePartition exchange allowed is the tiny
    per-slice boundary summary (≤ slice-count rows)."""
    for name in ("q11_asof_nearest", "q35_asof_backward"):
        p = _plan(_q(name).spark(spark, sf))
        assert "hashpartitioning(__pid" in p, name
        # every bulk running window (the ones ordering by __is_r) must be
        # partitioned by the slice id, never a global (unpartitioned) window
        for ln in p.splitlines():
            if "windowspecdefinition(" in ln and "__is_r" in ln:
                assert "__pid" in ln.split("windowspecdefinition(")[1], (name, ln)


def test_minhash_no_global_sort(spark, sf):
    """q25's shingle ids are scalar md5 expressions: the plan must contain
    no single-partition global sort (the row_number-over-vocabulary shape
    that serializes at scale) and no vocabulary join beyond the one
    band-bucket self-join."""
    p = _plan(_q("q25_minhash_lsh").spark(spark, sf))
    assert "Exchange SinglePartition" not in p
    assert "row_number" not in p.lower()


def test_simhash_banded_not_allpairs(spark, sf):
    """q26 candidates come from the band-equality join — an equi-join, never
    a cartesian/broadcast-nested-loop all-pairs scan."""
    p = _plan(_q("q26_simhash_hamming").spark(spark, sf))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_rollup_cube_single_pass(spark, sf):
    """ROLLUP/CUBE run as one Expand + one aggregate exchange — no
    per-grouping-set rescan of the input."""
    for name in ("q41_rollup", "q42_cube"):
        p = _plan(_q(name).spark(spark, sf))
        assert "Expand" in p, name
        scans = [ln for ln in p.splitlines() if "Scan parquet" in ln]
        assert len(scans) == 1, name


def test_range_window_sorts_within_partitions(spark, sf):
    """The RANGE-frame window shuffles once on user_id; the sort is within
    partitions (no global ordering)."""
    p = _plan(_q("q43_range_frame").spark(spark, sf))
    assert "Window" in p
    assert "Exchange SinglePartition" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_ann_prunes_before_rerank(spark, sf):
    """LSH/IVF ANN queries re-rank only the pruned candidate set: the
    bucket/cell predicate must appear as a Filter, and top-k must stay
    partial (TakeOrderedAndProject)."""
    for name in ("q46_ann_lsh", "q47_ann_ivf"):
        p = _plan(_q(name).spark(spark, sf))
        assert "TakeOrderedAndProject" in p, name
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p, name


def test_whole_stage_codegen_everywhere(spark, sf):
    """Relational corpus queries stay inside whole-stage codegen (no
    row-at-a-time Python in the hot path)."""
    for name in ("q01_pricing_summary", "q02_filter_project", "q08_join_agg",
                 "q13_distinct", "q16_exact_quantiles", "q18_db_aggregates"):
        df = _q(name).spark(spark, sf)
        df.collect()  # AQE: codegen markers appear on the final plan
        p = _plan(df)
        assert "*(" in p or "WholeStageCodegen" in p, name
        assert "BatchEvalPython" not in p and "PythonUDF" not in p, name


def test_sampling_is_map_only(spark, sf):
    """Deterministic sampling/splitting is a scalar predicate in the scan:
    no Exchange anywhere — membership never needs a shuffle."""
    for name in ("q55_hash_split", "q56_weighted_mixture"):
        p = _plan(_q(name).spark(spark, sf))
        assert "Exchange" not in p, name
        assert "*(1)" in p, name  # single codegen stage, scan included


def test_interval_join_is_equi(spark, sf):
    """The bucketed range-join rewrite must plan as a hash/merge EQUI-join —
    never the nested-loop/cartesian a naive BETWEEN condition produces."""
    p = _plan(_q("q57_interval_join").spark(spark, sf))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Join" in p


def test_subquery_shapes(spark, sf):
    """Subquery corpus must compile to the decorrelated physical shapes:
    scalar → broadcast (never a shuffled join against a 1-row frame),
    IN-HAVING → left-semi, Q3 top-k → TakeOrderedAndProject with the
    segment filter pushed to the customer scan."""
    p = _plan(_q("q62_scalar_subquery").spark(spark, sf))
    assert "SortMergeJoin" not in p
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p

    p = _plan(_q("q64_in_having").spark(spark, sf))
    assert "LeftSemi" in p

    p = _plan(_q("q65_shipping_priority").spark(spark, sf))
    assert "TakeOrderedAndProject" in p
    assert "LeftSemi" in p
    assert "c_mktsegment" in p and "= BUILDING" in p.replace(",", " ")
    assert "CartesianProduct" not in p


def test_sixway_join_broadcasts_dims(spark, sf):
    """TPC-H Q5 shape: supplier + nation⋈region stay broadcast; the
    non-key cross-condition (c_nationkey = s_nationkey) must not force a
    cartesian/nested-loop plan."""
    p = _plan(_q("q66_local_supplier_volume").spark(spark, sf))
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # orders date window reaches the scan
    assert "o_orderdate" in "".join(
        ln for ln in p.splitlines() if "PushedFilters" in ln or "DataFilters" in ln)


def test_corpus_text_embedding_shapes(spark, sf):
    """Vocab top-k must be a partial top-k (TakeOrderedAndProject), never a
    global sort; TF-IDF's scalar N must broadcast; centroid agg must
    partial-aggregate map-side (no raw-row exchange)."""
    p = _plan(_q("q67_vocab_topk").spark(spark, sf))
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p.split("TakeOrderedAndProject")[0]

    p = _plan(_q("q69_tfidf_top_terms").spark(spark, sf))
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p

    p = _plan(_q("q68_label_centroids").spark(spark, sf))
    assert "partial" in p.lower()  # map-side combine before the exchange


def test_double_correlation_stays_hash(spark, sf):
    """Q21-shape semi+anti: the anti's inequality must ride as a residual
    on the l_orderkey hash join — never a nested-loop/cartesian plan."""
    p = _plan(_q("q72_sole_late_supplier").spark(spark, sf))
    assert "LeftSemi" in p and "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_new_tpch_shapes_broadcast_dims(spark, sf):
    """Q10/Q7/Q8 shapes: every dimension side rides a broadcast join, the
    fact-fact joins stay equi, and the returned-item top-20 is a partial
    top-k."""
    p = _plan(_q("q78_returned_item_report").spark(spark, sf))
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    assert "l_returnflag" in "".join(
        ln for ln in p.splitlines()
        if "PushedFilters" in ln or "DataFilters" in ln)

    for name in ("q79_nation_volume_shipping", "q80_market_share"):
        p = _plan(_q(name).spark(spark, sf))
        assert p.count("BroadcastHashJoin") >= 2, name
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_stratified_sample_map_only(spark, sf):
    """q82: per-stratum membership is one scalar predicate in the scan —
    no Exchange, single codegen stage."""
    p = _plan(_q("q82_stratified_sample").spark(spark, sf))
    assert "Exchange" not in p
    assert "*(1)" in p


def test_seeded_shuffle_no_global_window(spark, sf):
    """q83: the global position must come from data-bucketed local ranks
    (hash-prefix _pid) + a broadcast offset frame. Every window ordering
    by the md5 draw over the ROW STREAM must be partitioned by _pid; the
    lone SinglePartition shape allowed is the tiny offset frame's
    cumulative window (input ≤4096 rows)."""
    p = _plan(_q("q83_seeded_shuffle").spark(spark, sf))
    assert "hashpartitioning(_pid" in p
    assert "BroadcastExchange" in p
    for ln in p.splitlines():
        if "windowspecdefinition(" in ln and "_shuffle_key" in ln:
            # row-stream windows: partition spec (first arg) must be _pid
            assert ln.split("windowspecdefinition(")[1].startswith("_pid"), ln


def test_bucketed_join_no_shuffle(spark, sf):
    """Two tables bucketed on the join key with equal bucket counts must
    join with ZERO Exchange (the write-time shuffle replaces the read-time
    one) — the storage-layout scale path SCALE.md §4 claims for fact-fact
    joins. With sortBy, the join also needs no per-task Sort."""
    import pyspark.sql.functions as F
    from nasctn_sea_ingest_spark.plans.tables import load_table
    from nasctn_sea_ingest_spark.sources.bucketed import (
        read_bucketed, write_bucketed)
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf, "customer")
    write_bucketed(o, "t_orders_b", "o_custkey", n_buckets=8,
                   sort_by=["o_custkey"])
    write_bucketed(c.withColumnRenamed("c_custkey", "o_custkey"),
                   "t_customer_b", "o_custkey", n_buckets=8,
                   sort_by=["o_custkey"])
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (read_bucketed(spark, "t_orders_b")
             .join(read_bucketed(spark, "t_customer_b"), "o_custkey")
             .groupBy("c_nationkey")
             .agg(F.count("*").alias("n")))
        p = j._jdf.queryExecution().executedPlan().toString()
        join_part = p.split("HashAggregate")[-1]  # below the final agg
        assert "SortMergeJoin" in p
        # the join subtree reads both bucketed scans with no exchange
        for ln in join_part.splitlines():
            assert "Exchange hashpartitioning(o_custkey" not in ln, ln
        assert p.count("Exchange") <= 1  # only the groupBy agg exchange
        # and the within-bucket sortBy means no Sort above the scans
        assert "Bucketed: true" in p
        n = j.count()
        assert n > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_keyed_asof_partitions_by_key(spark, sf):
    """q85: the by-keyed as-of runs its running windows partitioned by the
    by-key — one shuffle, no SinglePartition exchange anywhere."""
    p = _plan(_q("q85_asof_by_key").spark(spark, sf))
    assert "hashpartitioning(user_id" in p
    assert "Exchange SinglePartition" not in p


def test_ivfpq_prunes_cells_before_adc(spark, sf):
    """q86: the IVF cell filter must reach the scan side (a pruned
    equality, storage-partition-prunable at scale), ADC runs as one
    Arrow-batched projection (never row-at-a-time Python), and the top-k
    compiles to TakeOrderedAndProject — no cartesian anywhere."""
    p = _plan(_q("q86_pq_ann").spark(spark, sf))
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p           # Arrow path only
    assert "ArrowEvalPython" in p
    assert "Filter " in p                       # cell predicate prunes rows


def test_repetition_stats_map_only(spark, sf):
    """q91's Gopher gates are pure column math: no KEYED Exchange, no
    Python — the sorted run-length aggregate runs inside a codegen map
    stage.  The one allowed Exchange is the round-robin
    fan_out_small_scan (a test-harness fix for the single-row-group
    testdata file, a no-op on real multi-split tables); any
    hashpartitioning exchange would mean the gates started shuffling on
    a key, which they must never need."""
    p = _plan(_q("q91_repetition_filter").spark(spark, sf))
    assert "Exchange hashpartitioning" not in p
    assert "Exchange rangepartitioning" not in p
    assert p.count("Exchange") <= 1          # the fan-out only
    assert "roundrobin" in p.lower() or "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_chunk_dedup_shuffle_inventory(spark, sf):
    """q88 needs exactly two exchanges — the chunk-key window (first-
    occurrence pick) and the doc reassembly agg — and no more.  The
    slice-based chunk build emits (doc_id, chunk_idx, chunk) straight out
    of the scan's generate, so there is no third (doc, chunk_idx) build
    shuffle; a third exchange would mean the window repartitioned what
    the scan already produced."""
    df = _q("q88_chunk_dedup").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("Exchange hashpartitioning") == 2, p


def test_zorder_cells_single_shuffle_broadcast_stats(spark, sf):
    """q89: the min/max stats row joins by BROADCAST (never a shuffled
    join for a 1-row frame) and the cell rollup is the only hash
    exchange; the Morton key itself is codegen'd bit math, no Python."""
    df = _q("q89_zorder_cells").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert p.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_grouped_regression_one_pass(spark, sf):
    """q90: all five moments come from ONE partial/final hash aggregate
    (map-side combine) — one exchange, no join back, no Python."""
    df = _q("q90_grouped_regression").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p
    assert "BatchEvalPython" not in p


def test_semantic_dedup_clusters_then_blas(spark, sf):
    """q92: one shuffle on the cluster key feeds the Arrow-batched
    pairwise stage (FlatMapGroupsInPandas), then the per-victim agg —
    no cartesian/broadcast-nested-loop anywhere."""
    df = _q("q92_semantic_dedup").spark(spark, sf)
    df.collect()
    p = _plan(df)
    assert "FlatMapGroupsInPandas" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# ---------------------------------------------------------------------------
# round 3: TPC-H completion + maintenance/profiling queries
# ---------------------------------------------------------------------------

def test_q95_semi_join_with_pushed_window(spark, sf):
    """Q4 shape: the correlated EXISTS compiles to ONE left-semi join (no
    per-row subquery re-execution) and the order-date window reaches the
    orders scan as a data filter."""
    df = _q("q95_order_priority_check").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "LeftSemi" in p
    assert p.count("Exchange hashpartitioning") <= 1
    assert "o_orderdate" in p.split("DataFilters")[1][:200]


def test_q96_full_pushdown_no_shuffle(spark, sf):
    """Q6 shape: every predicate lands in the scan's DataFilters and the
    only exchange is the scalar-agg gather (never a hash shuffle)."""
    df = _q("q96_forecast_revenue").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("Exchange hashpartitioning") == 0
    scan = p.split("DataFilters")[1]
    assert "l_discount" in scan[:400] and "l_quantity" in scan[:400]


def test_q97_broadcast_max_row(spark, sf):
    """Q15 shape: the MAX scalar subquery joins by broadcast (1 row), the
    supplier dim joins by broadcast; the revenue agg shuffles at most
    twice (once per branch — Catalyst may also reuse the exchange)."""
    df = _q("q97_top_revenue_supplier").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("BroadcastHashJoin") >= 2
    assert p.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in p


def test_q98_disjunction_prefilters_broadcast_side(spark, sf):
    """Q19 shape: the brand IN-list derived from the disjunction reaches
    the part scan (broadcast side stays minimal) and the join is
    broadcast, not shuffled."""
    df = _q("q98_disjunctive_predicate").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    assert "IN (Brand#3,Brand#7,Brand#11)" in p


def test_q99_anti_join_no_cartesian(spark, sf):
    """Q22 shape: NOT EXISTS compiles to a left-anti join; the one-row
    average side must NOT produce a cartesian product."""
    df = _q("q99_global_sales_opportunity").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_q100_dims_broadcast_single_rollup_shuffle(spark, sf):
    """Q9 shape: part/supplier/nation all ride broadcast joins into the
    lineitem scan; the only hash exchange is the final rollup, and the
    name filter is pushed as Contains."""
    df = _q("q100_product_type_profit").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("BroadcastHashJoin") >= 3
    assert p.count("Exchange hashpartitioning") == 1
    assert "Contains(p_name" in p


def test_q101_wordcount_broadcast_vocab(spark, sf):
    """Unigram LM: exactly two REAL hash exchanges (token wordcount,
    per-doc rollup); the corpus total derives from the wordcount via a
    ReusedExchange — never a third corpus scan; the vocabulary and the
    one-row total join back by broadcast."""
    df = _q("q101_unigram_logprob").spark(spark, sf)
    df.collect()
    p = _final(df)
    real = p.count("Exchange hashpartitioning") - p.count("ReusedExchange")
    assert real == 2, p
    assert "ReusedExchange" in p  # total = sum(vocab counts), not a rescan
    assert p.count("Scan parquet") <= 2
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_q102_upsert_single_shuffle(spark, sf):
    """merge_upsert: union + key window = ONE hash exchange total; the
    window must not re-shuffle what the union already routed."""
    df = _q("q102_merge_upsert").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("Exchange hashpartitioning") == 1
    assert "Union" in p


def test_q103_histogram_two_pass(spark, sf):
    """Histogram: stats row broadcast (nested-loop on 1 row is fine and
    stays 1 row at any scale), one hash exchange for the bin rollup."""
    df = _q("q103_histogram").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in p


def test_q104_winsorize_broadcast_bounds(spark, sf):
    """Winsorized mean: per-group percentile bounds join back by
    broadcast; two hash exchanges (bounds agg + final rollup)."""
    df = _q("q104_winsorized_mean").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "BroadcastHashJoin" in p
    assert p.count("Exchange hashpartitioning") == 2


def test_q105_chunking_map_only(spark, sf):
    """Overlapping chunking is array slicing in the scan: no Exchange, no
    Python — one generate stage wrapped in codegen."""
    df = _q("q105_chunk_overlap").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Generate explode" in p


def test_q106_balanced_sample_rank_limit_pushdown(spark, sf):
    """Balanced sampling gets Spark's rank-limit pushdown: a PARTIAL
    WindowGroupLimit before the stratum exchange bounds the shuffle at
    O(tasks x n) rows."""
    df = _q("q106_balanced_sample").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("WindowGroupLimit") == 2  # Partial + Final
    assert "Partial" in p.split("WindowGroupLimit")[2]
    assert p.count("Exchange hashpartitioning") == 1


def test_q107_percentiles_broadcast_back(spark, sf):
    """MAD outliers: both percentile aggregates join back by broadcast
    (event_type has a handful of values); the event stream is never
    shuffled for the joins."""
    df = _q("q107_mad_outliers").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_q108_single_user_shuffle(spark, sf):
    """Cohort retention: ONE full-data exchange — the explicit user_id
    repartition — feeds the min-agg, the (user_id, day) distinct
    (HashPartitioning(user_id) satisfies the ClusteredDistribution
    subset rule) and the join via a ReusedExchange; every other exchange
    keys on cohort_day (the tiny post-rollup stream)."""
    df = _q("q108_cohort_retention").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "CartesianProduct" not in p
    assert "Exchange SinglePartition" not in p
    user_exchanges = [ln for ln in p.splitlines()
                      if "Exchange hashpartitioning(user_id" in ln
                      and "ReusedExchange" not in ln]
    assert len(user_exchanges) == 1, user_exchanges
    assert "ReusedExchange" in p  # distinct rides the same exchange


def test_q109_hashing_single_agg(spark, sf):
    """Feature hashing is vocabulary-free: one hash exchange (the two-key
    agg), no join, no Python."""
    df = _q("q109_feature_hashing").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_q110_ohlc_shares_partitioning(spark, sf):
    """OHLC bars: the (event_type, hour) exchange is shared — the second
    rank window and the final aggregate re-sort/aggregate within the
    same partitioning instead of re-shuffling."""
    df = _q("q110_ohlc_bars").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("Exchange hashpartitioning") <= 2
    assert "Exchange SinglePartition" not in p


def test_q111_forward_fill_copartitioned(spark, sf):
    """Forward fill: span agg, per-hour pick, grid join and fill window
    all key on user_id — no single-partition exchange, no cartesian."""
    df = _q("q111_forward_fill").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Exchange SinglePartition" not in p
    assert "CartesianProduct" not in p


def test_q112_audit_one_scan_per_table(spark, sf):
    """The audit's scalar rules fold into ONE aggregate per table: at
    most one scan per audited table beyond the two FK anti-joins, and
    every anti-join stays a join (no correlated re-execution)."""
    df = _q("q112_constraint_audit").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("LeftAnti") == 2
    # scans: orders(rules) + lineitem(rules) + customer(rules)
    #      + 2 FK pairs (child+parent each) = at most 7
    scans = [ln for ln in p.splitlines() if "Scan parquet" in ln]
    assert len(scans) <= 7, len(scans)


# ---------------------------------------------------------------------------
# round-3 families (q116-q122)
# ---------------------------------------------------------------------------

def test_q116_basket_pairs_no_join(spark, sf):
    """Co-purchase pairs must run as groupBy + map-side array expansion —
    2 exchanges (orderkey, pair), ZERO joins — not the oracle's
    distinct + self-join (4 shuffles)."""
    df = _q("q116_copurchase_pairs").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 2, p


def test_q117_weighted_median_compressed_windows(spark, sf):
    """Histogram-refinement weighted median: every Window must consume a
    COMPRESSED stream (a HashAggregate sits between the deepest Window
    and the base scan — the few-key cumulative window over raw rows
    would serialize each group into one task), and the boundary-bucket
    restriction must come back as a broadcast join."""
    df = _q("q117_weighted_median").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Exchange SinglePartition" not in p
    assert "Window" in p
    # below (after, in top-down print) the deepest Window there is still
    # an aggregate before any scan — windows never see raw rows
    assert "HashAggregate" in p[p.rindex("Window"):], p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_q118_blocking_is_equi_join(spark, sf):
    """ER blocking must join on the block key (bounded groups), never
    degrade to a cartesian/nested-loop compare."""
    df = _q("q118_blocked_match").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q119_autocorr_preaggregates(spark, sf):
    """The daily rollup must partially aggregate map-side BEFORE its
    exchange (the lag window sees ~days rows, not the base table), and
    the lag window must be keyed (no global sort)."""
    df = _q("q119_autocorr_daily").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Exchange SinglePartition" not in p
    first_exchange = p.index("Exchange hashpartitioning")
    assert "HashAggregate" in p[first_exchange:], \
        "no partial aggregate below the first exchange"
    # partial + final pairs for the day rollup and the moments rollup
    assert p.count("HashAggregate") >= 4


def test_q120_bigrams_two_exchanges(spark, sf):
    """Per-user lag window + global transition count: one exchange per
    re-keying, nothing else."""
    df = _q("q120_event_bigrams").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("Exchange hashpartitioning") == 2, p
    assert "Exchange SinglePartition" not in p


def test_q121_skyline_windows_aggregated_side(spark, sf):
    """The sort-based skyline's sequential sweep must run over the
    per-price PRE-AGGREGATE (distinct prices), not the base table, and
    the join back must stay an equi-join."""
    df = _q("q121_pareto_frontier").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "CartesianProduct" not in p and \
        "BroadcastNestedLoopJoin" not in p
    # the single-partition exchange (inherent to the 1-D sweep) must sit
    # above a HashAggregate, i.e. consume the collapsed price sequence
    sp = p.index("Exchange SinglePartition")
    assert "HashAggregate" in p[sp:], \
        "skyline sweep runs on un-aggregated rows"


def test_q122_merge_pushes_both_slices(spark, sf):
    """IVM merge: each partial scan must push its orderdate slice to
    parquet (at 100 TB the state side is a stored rollup; the contract
    here is that the delta slice prunes)."""
    df = _q("q122_partial_agg_merge").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "PushedFilters: [IsNotNull(o_orderdate)" in p or \
        "GreaterThanOrEqual(o_orderdate" in p
    assert "LessThan(o_orderdate" in p


def test_q123_scoring_map_only(spark, sf):
    """Batch inference must stay map-only: literal weights fold into the
    projection, and the top-k is a partial TakeOrdered — zero exchanges
    beyond the driver merge."""
    df = _q("q123_model_scoring").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "TakeOrderedAndProject" in p
    assert "Exchange hashpartitioning" not in p


def test_q125_drawdown_windows_collapsed_series(spark, sf):
    """Max drawdown: all three windows and the final agg key on
    l_returnflag over the DAILY pre-aggregate — a HashAggregate sits
    below the deepest Window, and no single-partition exchange exists."""
    df = _q("q125_max_drawdown").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Exchange SinglePartition" not in p
    assert "HashAggregate" in p[p.rindex("Window"):], p


def test_q126_ab_test_single_pipeline(spark, sf):
    """A/B rollup: conditional aggregation pivots the arms in ONE
    pipeline — one scan, one per-user exchange, zero joins (the oracle's
    arm self-join spec would duplicate the whole per-user pipeline)."""
    df = _q("q126_ab_test").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Join" not in p
    scans = [ln for ln in p.splitlines() if "Scan parquet" in ln]
    assert len(scans) == 1, scans
    user_ex = [ln for ln in p.splitlines()
               if "Exchange hashpartitioning(user_id" in ln
               and "ReusedExchange" not in ln]
    assert len(user_ex) == 1, user_ex


def test_q127_equidepth_shares_partitioning(spark, sf):
    """ntile window and the per-bucket aggregate both key on event_type:
    one full-data exchange, no single-partition window."""
    df = _q("q127_equidepth_histogram").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Exchange SinglePartition" not in p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_q128_triangles_equi_joins_only(spark, sf):
    """Triangle closing must be equi-joins on edge endpoints; the only
    non-equi product allowed is the final 1-row × 1-row stats join.
    The closure must also be DEGREE-ORIENTED: a projection flips each
    edge to point low-(degree, id) → high (the `CASE WHEN du < dv`
    expressions below), bounding the wedge join's per-vertex fan-out by
    O(sqrt(m)) instead of skewing on hub degrees."""
    df = _q("q128_triangle_count").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p \
        or "BroadcastHashJoin" in p
    # orientation step present: the CASE WHEN that compares endpoint
    # degrees (du/dv) to pick the edge direction
    import re as _re
    assert _re.search(r"CASE WHEN \(\(du#\d+L? < dv#\d+L?\)", p), p
    # the only tolerable product is the final stats join: its inputs are
    # 1-row aggregates, so any nested-loop/cartesian node must sit ABOVE
    # (before, in top-down print) every HashAggregate-consuming join
    nl = [i for i, ln in enumerate(p.splitlines())
          if "CartesianProduct" in ln or "BroadcastNestedLoopJoin" in ln]
    eq = [i for i, ln in enumerate(p.splitlines())
          if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
          or "BroadcastHashJoin" in ln]
    assert all(i < min(eq) for i in nl), (nl, eq)
    assert p.count("Scan parquet") <= 2


def test_q124_sketch_partial_agg(spark, sf):
    """Sketch rollup: the per-day HLL build must partially aggregate
    map-side before its exchange (sketches merge in the combiner), and
    the day→total union must not reshuffle by anything wider than
    event_type."""
    df = _q("q124_sketch_rollup").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "hll_sketch_agg" in p and "hll_union_agg" in p
    first_ex = p.index("Exchange hashpartitioning")
    assert "HashAggregate" in p[first_ex:] or \
        "ObjectHashAggregate" in p[first_ex:]
    assert "Exchange SinglePartition" not in p


def test_q130_attribution_range_window(spark, sf):
    """First-touch attribution must be ONE trailing range-frame window
    per user (streaming frame, bounded state) + a tiny rollup — no
    per-purchase interval join, no single-partition exchange."""
    df = _q("q130_first_touch_attribution").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Window" in p and "Join" not in p
    assert "Exchange SinglePartition" not in p
    assert p.count("Exchange hashpartitioning") == 2, p


def test_q135_setsim_prefix_equi_joins(spark, sf):
    """PPJoin: candidate generation must be an EQUI-join on prefix
    tokens (never an all-pairs product), and verification must read
    token ARRAYS (array_intersect), not re-explode per pair."""
    df = _q("q135_setsim_prefix_join").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "CartesianProduct" not in p and \
        "BroadcastNestedLoopJoin" not in p
    assert "array_intersect" in p
    # prefix filter present: the rank-vs-length bound compiled in
    assert "div 5" in p or "DIV 5" in p, p


def test_q136_twap_slice_parallel_lead(spark, sf):
    """TWAP via keyed_lead: the full-data lead() window partitions on
    (event_type, __pid) — slice-parallel, never key-count-bounded — and
    every event_type-only exchange carries map-side-combined aggregate
    partials, not raw rows.  The one SinglePartition exchange is the
    sampled 1-row bounds sketch (approx_percentile), nothing else."""
    df = _q("q136_twap").spark(spark, sf)
    df.collect()
    p = _final(df)
    # the lead over the raw series runs per (key, slice)
    assert "windowspecdefinition(event_type" in p
    full_lead = [ln for ln in p.splitlines()
                 if "windowspecdefinition(event_type" in ln
                 and "__pid" in ln and "lead(_w0" in ln]
    assert full_lead, p
    lines = p.splitlines()
    for i, ln in enumerate(lines):
        if ("Exchange hashpartitioning(event_type" in ln
                and "__pid" not in ln and "ReusedExchange" not in ln):
            # fed by an aggregate: only combined partials cross the wire
            assert "Aggregate" in lines[i + 1], ln
    assert p.count("Exchange SinglePartition") <= 1
    if "Exchange SinglePartition" in p:
        assert "approx_percentile" in p


def test_q137_kl_partial_aggregation(spark, sf):
    """Corpus KL: token counts must partially aggregate map-side before
    the token exchange; the corpus totals ride a 1-row broadcast (the
    allowlisted BNLJ), never a re-scan per term."""
    df = _q("q137_corpus_kl").spark(spark, sf)
    df.collect()
    p = _final(df)
    first_ex = p.index("Exchange hashpartitioning")
    assert "HashAggregate" in p[first_ex:]
    # the whole corpus is scanned exactly once (totals derive from the
    # same token-count aggregate, not a second pass over documents)
    assert p.count("Scan parquet") <= 2, p


def test_q138_recursive_cte_executes_iteratively(spark, sf):
    """Recursive rollup: the plan must contain the recursive union loop
    (declarative iteration), anchored equi-joins against the part dim,
    and no cartesian growth."""
    df = _q("q138_recursive_rollup").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "UnionLoop" in p or "CTERelation" in p or "Recursion" in p, p
    assert "CartesianProduct" not in p


def test_q135_single_shingle_materialization(spark, sf):
    """q135's shingle relation must materialize ONCE: a lazy
    localCheckpoint shared by the document-frequency, prefix-window, and
    verification-set branches, so every leaf of the final plan is the
    checkpointed RDD — no parquet re-scan of documents in any branch
    (round 4 shipped with the explode re-executing per branch)."""
    df = _q("q135_setsim_prefix_join").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Scan ExistingRDD" in p, p
    assert "Scan parquet" not in p, p


def test_q139_ewma_offset_equijoin(spark, sf):
    """EWMA must be an equi-join on the day-offset key — no range/theta
    join (BNLJ/cartesian), and the daily aggregate materializes once
    (checkpointed leaves, no double events scan)."""
    df = _q("q139_ewma_daily").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "BroadcastNestedLoopJoin" not in p and \
        "CartesianProduct" not in p, p
    assert "Scan ExistingRDD" in p, p
    assert "Scan parquet" not in p, p


def test_q140_fingerprint_scan_is_narrow(spark, sf):
    """The fingerprint reads exactly the six key columns (column
    pruning reaches the scan) and aggregates with map-side partials —
    one exchange on the 3-key group."""
    df = _q("q140_table_fingerprint").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "l_extendedprice" not in p and "l_shipdate" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_q141_dim_profile_single_aggregate(spark, sf):
    """posexplode fans out map-side; ONE hash exchange on the dim key
    (64 groups), partial aggregation below it."""
    df = _q("q141_embedding_dim_profile").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Generate posexplode" in p or "Generate" in p, p


def test_q142_mi_take_ordered_no_global_sort(spark, sf):
    """Top-20 by MI must be TakeOrderedAndProject (partial top-k per
    partition), never a global sort of the vocabulary."""
    df = _q("q142_token_label_mi").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "TakeOrderedAndProject" in p, p


def test_q143_interpolation_single_series_exchange(spark, sf):
    """Both window walks key on event_type: they must share ONE
    full-data hash exchange (plus the checkpointed daily leaves — no
    parquet re-scan, no self-join)."""
    df = _q("q143_gap_interpolation").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Scan parquet" not in p, p
    assert "BroadcastNestedLoopJoin" not in p and \
        "CartesianProduct" not in p, p


def test_q145_reachability_is_union_loop(spark, sf):
    """The traversal must be the declarative UnionLoop (one equi-join
    per hop) over the checkpointed edge list, with per-hop frontier
    dedup (a distinct aggregate inside the loop)."""
    df = _q("q145_reachability").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "UnionLoop" in p, p
    assert "CartesianProduct" not in p, p


def test_q147_streaks_custkey_partitioned(spark, sf):
    """Gaps-and-islands: every window (island key, best-run rank, the
    per-customer totals) runs under o_custkey hash partitioning — no
    single-partition window, no extra exchange between the island
    window, the run aggregate, and the ranking windows."""
    df = _q("q147_order_streaks").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Exchange SinglePartition" not in p
    # all windows partition on o_custkey
    import re
    for m in re.finditer(r"windowspecdefinition\((\w+)", p):
        assert m.group(1) == "o_custkey", m.group(0)
    # the island window and the downstream run-agg + ranking windows
    # share one custkey exchange: at most 2 data exchanges before the
    # final rangepartitioning sort (distinct pre-agg + custkey window)
    hashex = [ln for ln in p.splitlines()
              if "Exchange hashpartitioning" in ln
              and "ReusedExchange" not in ln]
    assert len(hashex) <= 2, hashex


def test_q148_scd2_single_user_shuffle(spark, sf):
    """SCD2 compaction: lag, running version sum, run aggregate, and
    valid_to lead ALL reuse the user_id partitioning — exactly one
    full-data hash exchange in the plan."""
    df = _q("q148_scd2_compaction").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Exchange SinglePartition" not in p
    hashex = [ln for ln in p.splitlines()
              if "Exchange hashpartitioning" in ln
              and "ReusedExchange" not in ln]
    assert len(hashex) == 1, hashex
    assert "user_id" in hashex[0]


def test_q149_kmeans_broadcast_centroids(spark, sf):
    """Lloyd step: the N*D*k distance stage joins exploded points to
    centroids via BROADCAST hash join (the hinted k*D side) — never a
    shuffled or nested-loop join — and the top-1 assignment runs
    through WindowGroupLimit (rank pushdown), not a full per-vector
    sort of all k candidates."""
    df = _q("q149_kmeans_step").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "WindowGroupLimit" in p


def test_q150_cusum_reuses_type_partitioning(spark, sf):
    """CUSUM: the cumulative-sum and argmax windows both partition on
    event_type, and the per-type totals attach via broadcast — the
    daily aggregate's exchange is the only full-data shuffle."""
    df = _q("q150_cusum_changepoint").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Exchange SinglePartition" not in p
    assert "BroadcastHashJoin" in p
    import re
    for m in re.finditer(r"windowspecdefinition\((\w+)", p):
        assert m.group(1) == "event_type", m.group(0)


def test_q151_benford_broadcast_totals(spark, sf):
    """Benford audit: the per-flag totals join back by broadcast; the
    digit histogram is the only aggregate over full data and its
    map-side partial bounds every exchange at O(flags x 9) rows."""
    df = _q("q151_benford_audit").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "BroadcastHashJoin" in p
    assert "Exchange SinglePartition" not in p


def test_q152_gini_shared_type_partitioning(spark, sf):
    """Gini: the rank window and the final aggregate run on the
    event_type partitioning downstream of the (event_type, user_id)
    rollup — no single-partition stage anywhere."""
    df = _q("q152_gini_inequality").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Exchange SinglePartition" not in p
    import re
    for m in re.finditer(r"windowspecdefinition\((\w+)", p):
        assert m.group(1) == "event_type", m.group(0)


def test_q153_theil_sen_joins_aggregates_only(spark, sf):
    """Theil-Sen: the pairwise slope stage is an equi-join of the DAILY
    aggregate against itself (day-bounded sides — never raw events),
    so every join input comes from a HashAggregate; no cartesian."""
    df = _q("q153_theil_sen_slope").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Exchange SinglePartition" not in p


def test_q154_entropy_mapside_unpivot(spark, sf):
    """Column entropy: the 4-way unpivot is a map-side Generate (one
    events scan feeds all columns — never 4 scans or a union of
    shuffles), and no single-partition stage exists."""
    df = _q("q154_column_entropy").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Exchange SinglePartition" not in p
    assert p.count("Scan parquet") == 1, p.count("Scan parquet")
    assert "Generate" in p


def test_q145_recursion_limit_not_leaked(spark, sf):
    """q145 raises spark.sql.cteRecursionRowLimit for its own recursion,
    but on a CLONED session: the caller's session must keep its guardrail
    (round-5 advisor: the bare set leaked 200M to every later bench/driver
    query, q138's recursive rollup included)."""
    key = "spark.sql.cteRecursionRowLimit"
    before = spark.conf.get(key)
    assert _q("q145_reachability").spark(spark, sf).count() > 0
    assert spark.conf.get(key) == before
    assert before != str(200_000_000)


def test_q155_sweep_slice_partitioned(spark, sf):
    """Peak concurrency: the running-occupancy window must be partitioned
    by (event_type, __pid) — the keyed_cumsum slice — never by
    event_type alone (the few-key ceiling), and the endpoint deltas
    pre-aggregate before any window (map-side combinable)."""
    import re

    df = _q("q155_peak_concurrency").spark(spark, sf)
    df.collect()
    p = _final(df)
    # every sum(...) running window must carry the slice id in its spec
    for ln in p.splitlines():
        if "windowspecdefinition(" in ln and "sum(d#" in ln:
            assert "__pid" in ln.split("windowspecdefinition(")[1], ln
    assert re.search(r"hashpartitioning\(event_type#\d+, __pid#\d+", p)


def test_q156_baseline_broadcast(spark, sf):
    """Seasonal anomaly: the keys x 7 baseline joins via broadcast hash
    join — the daily aggregate must not shuffle against it."""
    df = _q("q156_seasonal_anomaly").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_q157_pit_equi_join_not_range(spark, sf):
    """Point-in-time features: the 7-day window must execute as hash
    EQUI-joins on (user_id, day) — a range/theta join would plan as
    broadcast nested-loop and explode at scale."""
    df = _q("q157_pit_features").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Generate explode" in p  # the day-offset explode is the plan


def test_q158_interval_merge_slice_partitioned(spark, sf):
    """Interval coverage: BOTH scans (prior-rows running max of ends,
    island-id running sum of flags) must window over the slice id
    (event_type, __pid) — never event_type alone (the few-key ceiling
    keyed_cummax/keyed_cumsum exist to avoid)."""
    import re

    df = _q("q158_interval_coverage").spark(spark, sf)
    df.collect()
    p = _final(df)
    for ln in p.splitlines():
        if "windowspecdefinition(" in ln and (
                "max(e#" in ln or "sum(flag#" in ln):
            assert "__pid" in ln.split("windowspecdefinition(")[1], ln
    assert re.search(r"hashpartitioning\(event_type#\d+, __pid#\d+", p)
    assert "CartesianProduct" not in p


def test_q159_chi_squared_broadcast_grid(spark, sf):
    """Chi-squared: one hash aggregate reduces the fact table; the
    marginal grid and totals must compose via broadcast joins — no
    sort-merge join, no cartesian product anywhere (the crossJoins are
    1-row / <=5-row broadcast frames)."""
    df = _q("q159_chi_squared").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p


def test_q160_funnel_equi_joins(spark, sf):
    """Funnel: the 7-day step bounds must ride as post-join filters on
    user_id EQUI-joins — a range/theta formulation would plan as
    broadcast nested-loop over the raw event stream and explode at
    scale."""
    df = _q("q160_funnel_conversion").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # POSITIVE contract (round-7 advisor): the two step joins must be
    # hash equi-joins keyed on user_id — absence-only asserts would still
    # pass if a regression dropped a join or re-keyed it.
    hash_joins = re.findall(
        r"(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"
        r"[^\n]*user_id#\d+", p)
    assert len(hash_joins) >= 2, (
        f"expected >=2 hash equi-joins on user_id, found "
        f"{len(hash_joins)}:\n{p}")


def test_q161_spatial_join_is_equi(spark, sf):
    """Grid spatial join: the radius predicate must ride as a post-join
    filter on a HASH EQUI-join keyed on the grid cell — a raw distance
    theta join would plan as broadcast nested-loop and explode at
    scale.  Positive contract: one hash join keyed on the cell columns;
    negative: no nested-loop / cartesian anywhere."""
    df = _q("q161_grid_distance_join").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert re.search(
        r"(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"
        r"[^\n]*__jx#\d+", p), p


def test_q162_fuzzy_join_is_equi(spark, sf):
    """SymSpell fuzzy match: candidates must come from a hash equi-join
    on the delete-variant key, with levenshtein as a post-join filter —
    never a levenshtein theta join (nested-loop).  The variant explode
    and the hot-variant guard are the only width amplifiers."""
    df = _q("q162_fuzzy_name_match").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert re.search(
        r"(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"
        r"[^\n]*__v#\d+", p), p
    assert "levenshtein" in p


def test_q163_dbscan_grid_equi(spark, sf):
    """DBSCAN: no nested-loop/cartesian anywhere in the composed plan,
    and the eps-neighbor stage (hidden from the final plan behind the
    multi-consumer localCheckpoint boundary) must be the grid HASH
    EQUI-join on the cell columns with the distance as a post-join
    filter — the oracle's N² theta join must never appear."""
    df = _q("q163_dbscan").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # the pairs stage, inspected pre-checkpoint: same points recipe as
    # the query (corpus_r9._EPS over the q161 coordinate plane)
    import pyspark.sql.functions as F

    from nasctn_sea_ingest_spark.operators.spatial import (
        grid_distance_join)
    from nasctn_sea_ingest_spark.plans import corpus_r9 as r9
    from nasctn_sea_ingest_spark.plans.corpus_r8 import _spark_coord
    from nasctn_sea_ingest_spark.plans.tables import load_table

    pts = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"),
        _spark_coord("").alias("x"), _spark_coord("y").alias("y"))
    pairs = grid_distance_join(pts, r9._EPS)
    pairs.collect()
    pp = _final(pairs)
    assert "BroadcastNestedLoopJoin" not in pp
    assert "CartesianProduct" not in pp
    assert re.search(
        r"(?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"
        r"[^\n]*__jx#\d+", pp), pp


def test_q164_fd_no_joins_no_windows(spark, sf):
    """FD discovery: pure aggregation — the plan must contain NO join
    of any kind and NO window (the per-candidate branches are
    independent aggregate chains unioned together), and every branch's
    first aggregate must be partial (map-side combine)."""
    df = _q("q164_fd_discovery").spark(spark, sf)
    df.collect()
    p = _final(df)
    assert "Join" not in p and "CartesianProduct" not in p
    assert "Window" not in p
    assert "partial_count" in p or "partial_sum" in p


def test_stage_digests_for_checkpoint_terminated_queries(spark, sf):
    """r12 verdict #1: q115/q163/q168/q171 end-to-end digests see only
    `Scan ExistingRDD` (their operators must localCheckpoint to bound
    lineage), so the drift alarm was blind to interior rewrites of the
    corpus's most complex iterative plans.  Each such operator now
    records per-stage PRE-checkpoint digests: all four queries must
    yield a non-trivial stage map under the collector, and outside a
    collector the instrumentation must be a no-op."""
    from nasctn_sea_ingest_spark.querylog import capture_stage_digests

    want = {
        "q115_pagerank": {"pagerank.edges", "pagerank.round"},
        "q163_dbscan": {"dbscan.labels", "dbscan.component_edges"},
        "q168_connected_components": {"star_components.nodes",
                                      "star_components.edges"},
        "q171_semdedup_exact": {"semdedup_exact.unit",
                                "semdedup_exact.grid_candidates",
                                "semdedup_exact.verified"},
        "q173_label_propagation": {"label_propagation.sym",
                                   "label_propagation.round"},
        "q174_bounded_hop_distances": {"q174.edges"},
    }
    for name, stages_expected in want.items():
        with capture_stage_digests() as stages:
            _q(name).spark(spark, sf).count()
        assert stages_expected <= set(stages), (name, set(stages))
        for s, (d, t) in stages.items():
            assert d and len(d) == 16, (name, s)
            assert "Scan ExistingRDD" not in t.split("\n")[0], (name, s)
    # no collector active -> no-op (production paths pay one None check)
    from nasctn_sea_ingest_spark import querylog
    assert querylog._STAGE_SINK is None


def test_stage_digest_trips_on_semdedup_grid_rewrite(spark):
    """The alarm the stage digests exist for: a DELIBERATE plan change
    in semdedup_exact's grid stage (k=2 -> k=3 changes the 3^k cell
    equi-join shape) must change the grid stage's digest even though
    the END-TO-END digest (checkpoint-terminated) cannot see it; an
    identical rebuild must reproduce identical stage digests."""
    import numpy as np

    from nasctn_sea_ingest_spark.operators.similarity import (
        semdedup_exact)
    from nasctn_sea_ingest_spark.querylog import capture_stage_digests

    rng = np.random.default_rng(7)
    rows = [(i, (rng.standard_normal(8)).tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding "
                                      "array<double>")

    def build(k):
        with capture_stage_digests() as st:
            semdedup_exact(emb, threshold=0.8, k=k).count()
        return {s: d for s, (d, _) in st.items()}

    a, b, c = build(2), build(2), build(3)
    assert a == b  # deterministic: identical build, identical digests
    assert a["semdedup_exact.grid_candidates"] != \
        c["semdedup_exact.grid_candidates"]
