#!/usr/bin/env python
"""Empirical scaling probe: run the shuffle-heavy document operators on
1x / 4x / 16x copies of the sf0.1 documents table and report warm-run
times (2nd execution — excludes per-plan codegen, measures data work).

A plan that "survives 100x" should scale ~linearly in rows here: the
replicas get fresh doc_ids, so dedup candidate sets / vocabulary sizes
grow with the corpus the way real data would (replicated text means every
chunk/shingle is a cross-copy duplicate — the worst case for dedup skew,
which is exactly what we want to stress).

Usage: python tools/scaling_probe.py [scales ...]  (default: 1 4 16)
Results land in SCALE.md §"Measured scaling" (updated by hand).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from nasctn_sea_ingest_spark import get_spark  # noqa: E402
from nasctn_sea_ingest_spark.plans import CORPUS  # noqa: E402

QUERIES = ["q23_dedup_exact", "q25_minhash_lsh", "q26_simhash_hamming",
           "q88_chunk_dedup", "q84_bm25_retrieval", "q101_unigram_logprob",
           "q105_chunk_overlap", "q106_balanced_sample",
           "q109_feature_hashing", "q113_bigram_condprob",
           "q135_setsim_prefix_join", "q137_corpus_kl",
           "q142_token_label_mi"]

# Relational round-3 families: replicate the named table with the id
# column(s) shifted per replica (disjoint keys, duplicated value
# distributions — group counts grow with scale the way real data would).
# Every other table the query reads is symlinked from the base sf dir.
REL_QUERIES = {
    "q116_copurchase_pairs": ("lineitem", ["l_orderkey"]),
    "q117_weighted_median": ("lineitem", ["l_orderkey"]),
    "q119_autocorr_daily": ("lineitem", ["l_orderkey"]),
    "q120_event_bigrams": ("events", ["event_id", "user_id"]),
    "q121_pareto_frontier": ("part", ["p_partkey"]),
    "q122_partial_agg_merge": ("orders", ["o_orderkey"]),
    "q123_model_scoring": ("embeddings", ["vec_id"]),
    "q124_sketch_rollup": ("events", ["event_id", "user_id"]),
    "q125_max_drawdown": ("lineitem", ["l_orderkey"]),
    "q126_ab_test": ("events", ["event_id", "user_id"]),
    "q127_equidepth_histogram": ("events", ["event_id", "user_id"]),
    "q128_triangle_count": ("lineitem", ["l_orderkey"]),
    "q129_sequence_pattern": ("events", ["event_id", "user_id"]),
    "q130_first_touch_attribution": ("events", ["event_id", "user_id"]),
    "q136_twap": ("events", ["event_id", "user_id"]),
    "q138_recursive_rollup": ("part", ["p_partkey"]),
    "q139_ewma_daily": ("events", ["event_id", "user_id"]),
    "q140_table_fingerprint": ("lineitem", ["l_orderkey"]),
    "q141_embedding_dim_profile": ("embeddings", ["vec_id"]),
    "q143_gap_interpolation": ("events", ["event_id", "user_id"]),
    "q144_rolling_corr": ("events", ["event_id", "user_id"]),
    "q145_reachability": ("lineitem", ["l_orderkey"]),
    # l_orderkey shifts only: replicas stack MORE orders over the SAME
    # parts, so the co-purchase graph DENSIFIES (support counts x s,
    # more qualifying edges over a fixed node set) — the harsher regime
    # for the iterative families (LPA round cost and relax fan-out grow
    # with edges, not nodes)
    "q173_label_propagation": ("lineitem", ["l_orderkey"]),
    "q174_bounded_hop_distances": ("lineitem", ["l_orderkey"]),
    # event_id shifts only (user_id kept): replicas DENSIFY each
    # (item, hour) cell — more co-action edges among the same users,
    # the harsh regime for the q175 grid join (per-cell pair growth)
    "q175_temporal_reachability": ("events", ["event_id"]),
    "q146_weighted_sample": ("documents", ["doc_id"]),
    # custkey shifts too: replicas bring NEW customers (streak groups grow
    # with scale) instead of stacking duplicate days on the same ones
    "q147_order_streaks": ("orders", ["o_orderkey", "o_custkey"]),
    "q148_scd2_compaction": ("events", ["event_id", "user_id"]),
    # vec_id shifts keep the k=8 seed centroids = the base copy's lowest
    # ids; the point side (and the N*k distance stage) grows linearly
    "q149_kmeans_step": ("embeddings", ["vec_id"]),
    "q150_cusum_changepoint": ("events", ["event_id", "user_id"]),
    "q151_benford_audit": ("lineitem", ["l_orderkey"]),
    "q152_gini_inequality": ("events", ["event_id", "user_id"]),
    "q153_theil_sen_slope": ("events", ["event_id", "user_id"]),
    "q154_column_entropy": ("events", ["event_id", "user_id"]),
    # event_id shifts keep replica intervals distinct; each replica's
    # deltas stack onto the same per-type timeline, so occupancy (and
    # the sweep's distinct-instant relation) grows with scale
    "q155_peak_concurrency": ("events", ["event_id", "user_id"]),
    "q156_seasonal_anomaly": ("events", ["event_id", "user_id"]),
    "q157_pit_features": ("events", ["event_id", "user_id"]),
    # replica intervals stack onto the same per-type timeline: islands
    # MERGE as density grows (output shrinks toward one island per type)
    # while the distinct-instant sweep relation grows ~linearly
    "q158_interval_coverage": ("events", ["event_id", "user_id"]),
    "q159_chi_squared": ("orders", ["o_orderkey"]),
    # user_id shifts bring NEW users per replica: every funnel stage
    # (per-user anchors, step joins, cohort counts) grows linearly
    "q160_funnel_conversion": ("events", ["event_id", "user_id"]),
    # c_custkey shifts give replicas fresh md5 coordinates on the SAME
    # 1000x1000 plane: density grows 16x, neighbors-per-point ~16x,
    # total pairs ~256x — OUTPUT-driven growth (the all-copies dedup
    # precedent, SCALE.md §9); candidate generation stays an equi-join
    "q161_grid_distance_join": ("customer", ["c_custkey"]),
    # fresh custkeys extend the padded-digit name space: distance-1
    # neighborhoods per name stay ~constant, pairs grow ~linearly
    "q162_fuzzy_name_match": ("customer", ["c_custkey"]),
}


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    base_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="scaling-probe", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    byname = {q.name: q for q in CORPUS}
    docs = spark.read.parquet(f"{base_sf}/documents.parquet")
    n0 = docs.count()
    # replica id offset must clear the real id RANGE, not the row count —
    # sparse doc_ids would otherwise collide replicas with base rows and
    # silently measure merged keys
    id_off = docs.agg(F.max("doc_id")).first()[0] + 1
    families = os.environ.get("SPARK_GRAFT_PROBE", "docs,rel").split(",")
    tmp = tempfile.mkdtemp(prefix="scaling_probe_")
    try:
        for s in (scales if "docs" in families else []):
            d = os.path.join(tmp, f"x{s}")
            os.makedirs(d, exist_ok=True)
            # k replicas with disjoint doc_id ranges (fresh keys, duplicate
            # text across replicas — dedup worst case)
            rep = docs
            for k in range(1, s):
                rep = rep.unionByName(
                    docs.withColumn("doc_id", F.col("doc_id") + k * id_off))
            rep.repartition(cpus).write.mode("overwrite") \
               .parquet(f"{d}/documents.parquet")
            rows = {}
            for name in QUERIES:
                q = byname[name]
                n = q.spark(spark, d).count()      # warm: codegen + JIT
                # timed run executes the FULL plan via the noop sink —
                # count() lets Catalyst prune final projections/sorts
                # and under-measures compute-heavy plans (bench.py has
                # the same contract since round 5)
                t0 = time.perf_counter()
                q.spark(spark, d).write.format("noop") \
                 .mode("overwrite").save()
                rows[name] = (time.perf_counter() - t0, n)
                spark.catalog.clearCache()
            print(f"scale x{s} ({n0 * s} docs):")
            for name, (dt, n) in rows.items():
                print(f"  {name:28s} {dt:7.2f}s  rows={n}")
        # relational round-3 families: one replicated driver table each
        only = os.environ.get("SPARK_GRAFT_PROBE_ONLY")
        rel_items = {n: v for n, v in REL_QUERIES.items()
                     if not only or n in only.split(",")}
        for s in (scales if "rel" in families else []):
            rows = {}
            for name, (table, id_cols) in rel_items.items():
                d = os.path.join(tmp, f"rel_{table}_x{s}")
                if not os.path.exists(d):
                    os.makedirs(d)
                    base = spark.read.parquet(f"{base_sf}/{table}.parquet")
                    offs = {c: base.agg(F.max(c)).first()[0] + 1
                            for c in id_cols}
                    rep = base
                    for k in range(1, s):
                        shifted = base
                        for c, off in offs.items():
                            shifted = shifted.withColumn(
                                c, F.col(c) + k * off)
                        rep = rep.unionByName(shifted)
                    rep.repartition(cpus).write.mode("overwrite") \
                       .parquet(f"{d}/{table}.parquet")
                    for other in ("region nation customer supplier part "
                                  "orders lineitem events documents "
                                  "embeddings").split():
                        if other != table:
                            os.symlink(f"{base_sf}/{other}.parquet",
                                       f"{d}/{other}.parquet")
                q = byname[name]
                n = q.spark(spark, d).count()      # warm
                t0 = time.perf_counter()
                q.spark(spark, d).write.format("noop") \
                 .mode("overwrite").save()
                rows[name] = (time.perf_counter() - t0, n)
                spark.catalog.clearCache()
            print(f"relational scale x{s}:")
            for name, (dt, n) in rows.items():
                print(f"  {name:28s} {dt:7.2f}s  rows={n}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
