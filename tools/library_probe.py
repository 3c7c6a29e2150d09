#!/usr/bin/env python
"""Reproducible 1x/Kx growth probe for the round-6 LIBRARY operators
(SCALE.md sections 14-16 were measured with this): replicate the sf
tables K times with shifted ids and time each op at 1x and Kx.

    python tools/library_probe.py [K]          # default K=16

Run ALONE on the host (the section-12 rule: concurrent Spark inflates
every number 2-10x).  Prints one line per (op, scale).
"""
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from nasctn_sea_ingest_spark import get_spark  # noqa: E402
from nasctn_sea_ingest_spark.operators.sampling import (  # noqa: E402
    dsir_log_ratio, dsir_weights)
from nasctn_sea_ingest_spark.operators.similarity import \
    knn_graph  # noqa: E402
from nasctn_sea_ingest_spark.operators.sketch import (  # noqa: E402
    cm_sketch, grouped_quantile_sketch)
from nasctn_sea_ingest_spark.operators.text import (  # noqa: E402
    cdc_chunk_dedup, lm_perplexity, train_bigram_lm)


def rep(df, k, idcol):
    if k == 1:
        return df
    return reduce(lambda a, b: a.unionByName(b),
                  [df.withColumn(idcol, F.col(idcol)
                                 + F.lit(10_000_000 * i))
                   for i in range(k)])


def main():
    k_hi = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    # comma-list filter so one suspect op can be probed alone
    only = os.environ.get("SPARK_GRAFT_LIB_OPS")
    only = set(only.split(",")) if only else None
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = spark.read.parquet(f"{sf}/documents.parquet") \
        .select("doc_id", "text")
    emb0 = spark.read.parquet(f"{sf}/embeddings.parquet")
    li0 = spark.read.parquet(f"{sf}/lineitem.parquet")
    cust0 = spark.read.parquet(f"{sf}/customer.parquet")

    def t(fn):
        t0 = time.perf_counter()
        n = fn()
        return time.perf_counter() - t0, n

    def want(name):
        return only is None or name in only

    for k in (1, k_hi):
        if want("grid_knn_join") or want("linkage_scores"):
            from nasctn_sea_ingest_spark.operators.er import (
                FieldRule, linkage_scores)
            from nasctn_sea_ingest_spark.operators.spatial import \
                grid_knn_join
            c = rep(cust0, k, "c_custkey").persist()
            c.count()
            if want("grid_knn_join"):
                # md5 coords on a FIXED plane: 16x density — the q161
                # probe's output-driven adversarial recipe, but kNN
                # output stays k rows per point (linear), so time
                # should track N, not pairs
                h = ("cast(conv(substring(md5(concat(cast(c_custkey as "
                     "string), '{s}')), 1, 15), 16, 10) as bigint) "
                     "% 100000")
                pts = c.selectExpr(
                    "c_custkey as id",
                    f"cast({h.format(s='')} as double)/100.0 as x",
                    f"cast({h.format(s='y')} as double)/100.0 as y")
                dt, n = t(lambda: grid_knn_join(
                    pts, k=5, cell=20.0).count())
                print(f"x{k} grid_knn_join        {dt:7.2f}s rows={n}")
            if want("linkage_scores"):
                # block keys from the padded-digit name structure: same
                # trailing-2-digit block + nationkey block
                fields = [FieldRule("c_name", m=0.9, u=0.01,
                                    kind="levenshtein1"),
                          FieldRule("c_nationkey", m=0.95, u=0.04),
                          FieldRule("c_mktsegment", m=0.9, u=0.2)]
                blocks = ["substring(c_name, length(c_name) - 2, 3)",
                          "cast(c_nationkey as string)"]
                # default max_block=1000: at 16x the 25-value
                # nationkey block saturates (9600 records/block would
                # be ~46M pairs each) and is GUARDED OUT -- candidates
                # then come only from the trailing-3-digit name blocks
                # (240 records/block at 16x, under the guard).  The
                # unguarded form is the quadratic blow-up this
                # stop-key contract exists to prevent.
                dt, n = t(lambda: linkage_scores(
                    c, "c_custkey", blocks, fields).count())
                print(f"x{k} linkage_scores       {dt:7.2f}s pairs={n}")
            c.unpersist()
        if want("dbscan"):
            from nasctn_sea_ingest_spark.operators.spatial import dbscan
            c = rep(cust0, k, "c_custkey").persist()
            c.count()
            # CONSTANT-density growth: the plane scales with the data
            # (width 1000*sqrt(k)), unlike the fixed-plane recipe used
            # for the pair-JOIN ops.  Fixed-plane 16x densification
            # collapses DBSCAN to one near-complete core graph
            # (~470 eps-neighbors/point, ~113M pair rows) — the regime
            # where a user retunes eps or arms max_cell, documented in
            # SCALE.md §21, not a throughput question.  Constant
            # density measures what 100 TB actually means for a
            # density clusterer: more AREA at similar local density.
            import math
            w = int(100000 * math.sqrt(k))
            h = ("cast(conv(substring(md5(concat(cast(c_custkey as "
                 "string), '{s}')), 1, 15), 16, 10) as bigint) "
                 f"% {w}")
            pts = c.selectExpr(
                "c_custkey as id",
                f"cast({h.format(s='')} as double)/100.0 as x",
                f"cast({h.format(s='y')} as double)/100.0 as y")
            dt, n = t(lambda: dbscan(pts, 25.0, 4).count())
            print(f"x{k} dbscan               {dt:7.2f}s rows={n}")
            c.unpersist()
        if want("dbscan_fixed"):
            # the FIXED-plane densification regime that OOMed the
            # point-granularity design at local[32] (round 9, SCALE.md
            # §21) — kept probe-able so the eps/sqrt(2) dense-cell
            # shortcut's fix stays a measured claim: at 16x every cell
            # is dense, sparse-pair enumeration is ZERO, and the
            # component graph is ~1k cell nodes instead of ~226M pair
            # rows.  (Still an eps-mistuned regime for the DATA — one
            # cluster out — but no longer a memory question.)
            from nasctn_sea_ingest_spark.operators.spatial import dbscan
            c = rep(cust0, k, "c_custkey").persist()
            c.count()
            h = ("cast(conv(substring(md5(concat(cast(c_custkey as "
                 "string), '{s}')), 1, 15), 16, 10) as bigint) "
                 "% 100000")
            pts = c.selectExpr(
                "c_custkey as id",
                f"cast({h.format(s='')} as double)/100.0 as x",
                f"cast({h.format(s='y')} as double)/100.0 as y")
            dt, n = t(lambda: dbscan(pts, 25.0, 4).count())
            print(f"x{k} dbscan_fixed         {dt:7.2f}s rows={n}")
            c.unpersist()
        if want("fd_error"):
            from nasctn_sea_ingest_spark.functions import fd_error
            li = rep(li0, k, "l_orderkey").persist()
            li.count()
            dt, n = t(lambda: fd_error(
                li, "l_orderkey", "l_returnflag").count())
            print(f"x{k} fd_error             {dt:7.2f}s rows={n}")
            li.unpersist()
        if want("shortest_paths"):
            from nasctn_sea_ingest_spark.operators.graph import (
                cooccur_pairs, shortest_paths)
            li = rep(li0, k, "l_orderkey").persist()
            li.count()
            # weighted co-purchase graph: weight = 21 - min(support,
            # 20) (popular pairs are "close"); replication multiplies
            # ORDERS, so edges/supports grow with k — a denser graph,
            # same 200k-part node universe
            ed = (cooccur_pairs(li, "l_orderkey", "l_partkey")
                  .selectExpr("i1 as s", "i2 as d",
                              "cast(21 - least(support, 20) as double)"
                              " as w"))
            ed = ed.unionByName(ed.selectExpr("d as s", "s as d", "w"))
            src = [r.s for r in ed.select("s").limit(1).collect()]
            dt, n = t(lambda: shortest_paths(
                ed, src, src="s", dst="d", weight="w").count())
            print(f"x{k} shortest_paths       {dt:7.2f}s rows={n}")
            li.unpersist()
        if want("k_core"):
            # same co-purchase graph as shortest_paths: replication
            # densifies it (more orders per part pair), so higher k
            # survives more of the graph at 16x — peel depth, not
            # graph size, drives the round count
            from nasctn_sea_ingest_spark.operators.graph import (
                cooccur_pairs, k_core)
            li = rep(li0, k, "l_orderkey").persist()
            li.count()
            ed = cooccur_pairs(li, "l_orderkey", "l_partkey")
            dt, n = t(lambda: k_core(ed, 3, d1="i1", d2="i2").count())
            print(f"x{k} k_core               {dt:7.2f}s rows={n}")
            li.unpersist()
        if want("label_propagation") or want("personalized_pagerank"):
            from nasctn_sea_ingest_spark.operators.graph import (
                cooccur_pairs, label_propagation, personalized_pagerank)
            li = rep(li0, k, "l_orderkey").persist()
            li.count()
            ed = cooccur_pairs(li, "l_orderkey", "l_partkey") \
                .persist()
            ed.count()
            if want("label_propagation"):
                dt, n = t(lambda: label_propagation(
                    ed, d1="i1", d2="i2", max_iter=10).count())
                print(f"x{k} label_propagation    {dt:7.2f}s rows={n}")
            if want("personalized_pagerank"):
                src = [r.i1 for r in ed.select("i1").limit(3)
                       .collect()]
                dt, n = t(lambda: personalized_pagerank(
                    ed.selectExpr("i1 as src", "i2 as dst"), src,
                    max_iter=10, tol=None).count())
                print(f"x{k} personalized_pr      {dt:7.2f}s rows={n}")
            ed.unpersist()
            li.unpersist()
        if want("core_numbers") or want("ppr_exact"):
            # r14: the two new driver families' operators on the same
            # densifying co-purchase graph (q176/q177's witness graphs
            # are fixed-size by design, so the scaling story lives
            # here); core_numbers' h rounds track value-change depth,
            # not graph size — densification SHRINKS depth
            from nasctn_sea_ingest_spark.operators.graph import (
                cooccur_pairs, core_numbers,
                personalized_pagerank_exact)
            li = rep(li0, k, "l_orderkey").persist()
            li.count()
            ed = cooccur_pairs(li, "l_orderkey", "l_partkey") \
                .persist()
            ed.count()
            if want("core_numbers"):
                dt, n = t(lambda: core_numbers(
                    ed, d1="i1", d2="i2").count())
                print(f"x{k} core_numbers         {dt:7.2f}s rows={n}")
            if want("ppr_exact"):
                src = [r.i1 for r in ed.select("i1").limit(3)
                       .collect()]
                dt, n = t(lambda: personalized_pagerank_exact(
                    ed.selectExpr("i1 as src", "i2 as dst"), src,
                    n_iter=10).count())
                print(f"x{k} ppr_exact            {dt:7.2f}s rows={n}")
            ed.unpersist()
            li.unpersist()
        if want("dup_spans"):
            # r14 q178 family: shuffle volume = tokens x (hash, doc,
            # pos); replication multiplies every window's global count
            # x k, so the flagged set (and the span-merge stage) grows
            # too — both effects measured together
            from nasctn_sea_ingest_spark.operators.text import \
                duplicate_spans
            d = rep(docs0, k, "doc_id").persist()
            d.count()
            dt, n = t(lambda: duplicate_spans(d, window=12).count())
            print(f"x{k} dup_spans            {dt:7.2f}s rows={n}")
            d.unpersist()
        if want("dbscan_nd"):
            # constant-density d=3 recipe (volume scales with the
            # data: width 1000 * k^(1/3) per axis) — the honest
            # scaling claim for the reduced-embedding-space workload
            from nasctn_sea_ingest_spark.operators.spatial import \
                dbscan_nd
            c = rep(cust0, k, "c_custkey").persist()
            c.count()
            w = int(100000 * (k ** (1.0 / 3.0)))
            h = ("cast(conv(substring(md5(concat(cast(c_custkey as "
                 "string), '{s}')), 1, 15), 16, 10) as bigint) "
                 f"% {w}")
            pts = c.selectExpr(
                "c_custkey as id",
                f"cast({h.format(s='')} as double)/100.0 as x",
                f"cast({h.format(s='y')} as double)/100.0 as y",
                f"cast({h.format(s='z')} as double)/100.0 as z")
            dt, n = t(lambda: dbscan_nd(
                pts, 40.0, 4, coord_cols=("x", "y", "z")).count())
            print(f"x{k} dbscan_nd            {dt:7.2f}s rows={n}")
            c.unpersist()
        if want("semdedup"):
            # semdedup_exact cost model (r11 verdict #3): work beyond
            # the one grid equi-join is proportional to CANDIDATES, and
            # k trades the 3^k cell explode against candidate density.
            # Replication IS the planted structure: each vector gains
            # k-1 exact twins (groups of k, 240k twin pairs at 16x)
            # while the raw table is isotropic noise (max cross cosine
            # 0.60 << t) — so verified pairs are exactly the twins and
            # every extra candidate is projection-induced density, the
            # quantity k exists to control.  Candidates are counted
            # with the operator's own public pieces (same normalize →
            # pca → padded grid join), then the full composition is
            # timed end-to-end.
            import numpy as _np

            from nasctn_sea_ingest_spark.operators.similarity import (
                pca_fit, pca_project, semdedup_exact)
            from nasctn_sea_ingest_spark.operators.spatial import \
                grid_distance_join_nd
            e = rep(emb0, k, "vec_id").persist()
            e.count()
            t_thr = 0.98
            eps = float(_np.sqrt(2.0 - 2.0 * t_thr))
            for kk in (2, 3):
                nrm = F.sqrt(F.aggregate(
                    F.col("embedding"), F.lit(0.0),
                    lambda a, x: a + x.cast("double") * x.cast("double")))
                unit = (e.select(F.col("vec_id").alias("__id"),
                                 F.col("embedding").alias("__v"),
                                 nrm.alias("__n"))
                        .where(F.col("__n") > 0)
                        .select("__id", F.transform(
                            "__v", lambda x: x.cast("double")
                            / F.col("__n")).alias("__u")))
                mean, comps = pca_fit(unit, kk, col="__u")
                pr = pca_project(unit, mean, comps, col="__u",
                                 out="__p", out_dtype="double")
                pts = pr.select("__id", *[
                    F.col("__p")[i].alias(f"q{i}") for i in range(kk)])
                dtc, ncand = t(lambda: grid_distance_join_nd(
                    pts, eps * (1.0 + 1e-6) + 1e-9, id_col="__id",
                    coord_cols=tuple(f"q{i}" for i in range(kk)))
                    .count())
                dt, n = t(lambda: semdedup_exact(
                    e, threshold=t_thr, k=kk).count())
                print(f"x{k} semdedup_k{kk}          {dt:7.2f}s "
                      f"rows={n} cand={ncand} (cand scan {dtc:.2f}s)")
            e.unpersist()
        if want("skew"):
            # skew_survey's one-pass claim, measured honestly in the
            # two regimes SCALE.md §26 documents: (a) over a BASE
            # parquet table, where column pruning makes the naive J
            # single-column scans nearly free (expect ~tie — Expand's
            # J x row duplication offsets the saved scans); (b) over a
            # COMPUTED INTERMEDIATE (lineitem ⋈ orders), where the
            # naive form re-derives the join J times while GROUPING
            # SETS profiles it in one derivation — the regime the
            # operator exists for (profiling the relation you're about
            # to shuffle, without persisting it).
            from nasctn_sea_ingest_spark.operators.quality import \
                skew_survey
            li = rep(li0, k, "l_orderkey")
            oo = rep(spark.read.parquet(f"{sf}/orders.parquet"),
                     k, "o_orderkey")
            keys = ["l_suppkey", "l_partkey", "l_returnflag"]

            def naive(rel):
                rows = 0
                for kc in keys:
                    cnt = rel.groupBy(kc).agg(
                        F.count(F.lit(1)).alias("c"))
                    rows += cnt.agg(
                        F.count(F.lit(1)), F.sum("c"), F.max("c"),
                        F.expr("percentile(c, array(0.5D, 0.99D))")
                    ).count()
                return rows
            dt1, n1 = t(lambda: skew_survey(li, keys).count())
            dtj, _ = t(lambda: naive(li))
            print(f"x{k} skew_survey_base    {dt1:7.2f}s rows={n1} "
                  f"(naive {len(keys)}-scan {dtj:.2f}s)")
            j = li.join(oo, li.l_orderkey == oo.o_orderkey)
            dt1, n1 = t(lambda: skew_survey(j, keys).count())
            dtj, _ = t(lambda: naive(j))
            print(f"x{k} skew_survey_joined  {dt1:7.2f}s rows={n1} "
                  f"(naive {len(keys)}-derive {dtj:.2f}s)")
        if want("link_scores") or want("hits_exact"):
            from nasctn_sea_ingest_spark.operators.graph import (
                hits_exact, link_scores, temporal_edges)
            from nasctn_sea_ingest_spark.plans.corpus_r13 import \
                _copurchase_edges

            def rep_edges(base, k, c1, c2):
                # disjoint id-shifted copies: BOTH endpoints shift, so
                # graph structure (and output) scales exactly k-fold
                if k == 1:
                    return base
                return reduce(
                    lambda a, b: a.unionByName(b),
                    [base.select(
                        (F.col(c1) + F.lit(10_000_000 * i)).alias(c1),
                        (F.col(c2) + F.lit(10_000_000 * i)).alias(c2))
                     for i in range(k)])
            if want("link_scores"):
                cp = _copurchase_edges(spark, sf).select("u", "v") \
                    .persist()
                cp.count()
                e = rep_edges(cp, k, "u", "v").persist()
                e.count()
                dt, n = t(lambda: link_scores(e, "u", "v").count())
                print(f"x{k} link_scores          {dt:7.2f}s pairs={n}")
                e.unpersist()
                cp.unpersist()
            if want("hits_exact"):
                from nasctn_sea_ingest_spark.plans.tables import \
                    load_table
                ev = (load_table(spark, sf, "events")
                      .where(F.col("user_id").isNotNull()
                             & F.col("props").isNotNull())
                      .select(F.col("user_id").alias("u"),
                              F.get_json_object("props", "$.k")
                              .cast("int").alias("k"),
                              F.col("ts_us").alias("t")))
                te = temporal_edges(ev, 3_600_000_000, key="k",
                                    id_col="u", ts="t") \
                    .select("src", "dst").persist()
                te.count()
                e = rep_edges(te, k, "src", "dst").persist()
                e.count()
                dt, n = t(lambda: hits_exact(e, n_iter=3).count())
                print(f"x{k} hits_exact           {dt:7.2f}s nodes={n}")
                e.unpersist()
                te.unpersist()
        if want("betweenness"):
            from nasctn_sea_ingest_spark.operators.graph import \
                betweenness
            # the q184 forest witness scaled k-fold: block count grows
            # with k, DIAMETER stays 9 — level count constant, state
            # linear, the regime the level-synchronous design targets
            base = (cust0.select(
                (F.col("c_custkey") - F.col("c_custkey") % 16)
                .alias("b"))
                .groupBy("b").agg(F.count("*").alias("n"))
                .where(F.col("n") == 16).select("b"))
            blocks = rep(base, k, "b")
            pe = spark.createDataFrame(
                [(i, i + 1) for i in range(8)]
                + [(8, i) for i in range(9, 16)], "p1 int, p2 int")
            edges = (blocks.crossJoin(F.broadcast(pe))
                     .select((F.col("b") + F.col("p1")).alias("d1"),
                             (F.col("b") + F.col("p2")).alias("d2"))
                     .persist())
            edges.count()
            dt, n = t(lambda: betweenness(edges).count())
            print(f"x{k} betweenness          {dt:7.2f}s nodes={n}")
            edges.unpersist()
        if only is not None and not (only - {"grid_knn_join",
                                             "linkage_scores",
                                             "dbscan", "dbscan_fixed",
                                             "fd_error", "k_core",
                                             "dbscan_nd",
                                             "label_propagation",
                                             "personalized_pagerank",
                                             "semdedup", "skew",
                                             "link_scores",
                                             "hits_exact",
                                             "betweenness",
                                             "shortest_paths"}):
            continue
        d = rep(docs0, k, "doc_id").persist()
        d.count()
        dt, n = t(lambda: cdc_chunk_dedup(d).count())
        print(f"x{k} cdc_chunk_dedup      {dt:7.2f}s rows={n}")
        from nasctn_sea_ingest_spark.operators.text import \
            strip_boilerplate
        # replicated docs make EVERY line cross-doc boilerplate at 16x
        # (the adversarial all-copies recipe): the freq aggregate and
        # anti-join see maximal hot lines
        dt, n = t(lambda: strip_boilerplate(
            d, max_doc_frac=0.01).count())
        print(f"x{k} strip_boilerplate    {dt:7.2f}s rows={n}")
        uni, bi, tot, v = train_bigram_lm(d)
        dt, n = t(lambda: lm_perplexity(d, uni, bi, tot, v).count())
        print(f"x{k} lm_perplexity        {dt:7.2f}s rows={n}")
        dt, n = t(lambda: dsir_weights(
            d, *dsir_log_ratio(docs0.limit(500), d, n_buckets=4096),
            n_buckets=4096).count())
        print(f"x{k} dsir_weights         {dt:7.2f}s rows={n}")
        d.unpersist()
        li = rep(li0, k, "l_orderkey").persist()
        li.count()
        dt, n = t(lambda: cm_sketch(li, "l_partkey").count())
        print(f"x{k} cm_sketch            {dt:7.2f}s cells={n}")
        dt, n = t(lambda: grouped_quantile_sketch(
            li, ["l_returnflag"], "l_extendedprice").count())
        print(f"x{k} grouped_qsketch      {dt:7.2f}s groups={n}")
        li.unpersist()
        e = rep(emb0, k, "vec_id").persist()
        e.count()
        dt, n = t(lambda: knn_graph(e, k=5, n_tables=4,
                                    n_planes=8).count())
        print(f"x{k} knn_graph            {dt:7.2f}s edges={n}")
        e.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
