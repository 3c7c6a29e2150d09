"""Spatial distance joins via grid bucketing — the geometric face of the
candidate-bound join family (text: ``dedup.minhash_pairs``; vectors:
``similarity.lsh_pairs``; media: ``multimodal.image_neardup_pairs``).

No referent in the reference repo (reference `src/` has no spatial
operators); this is beyond-reference surface for large-scale pipelines:
point-of-interest dedup, sensor co-location, trajectory stitching.

Scale shape: an all-pairs distance join is O(N²) and plans as a
broadcast nested-loop at any size Spark can't broadcast.  Grid
bucketing makes it an EQUI-join: with cell size = radius, every pair
within the radius lies in the same or one of the 8 adjacent cells, so
exploding ONE side over its 3×3 cell neighborhood and hash-joining on
the cell id enumerates each candidate pair exactly once (the offset
relating two home cells is unique).  Cost: 9× one side's rows + one
hash shuffle + per-cell-pair products — candidate-bound by the grid
density, never all-pairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..querylog import stage_digest


def grid_distance_join(points: DataFrame, radius: float,
                       id_col: str = "id", x_col: str = "x",
                       y_col: str = "y",
                       max_cell: int | None = None) -> DataFrame:
    """All pairs of ``points`` within Euclidean ``radius``, as
    ``(id1, id2, dist)`` with ``id1 < id2`` — one candidate row per
    pair (no distinct pass needed: the cell offset linking two home
    cells is unique), exact distance verified after the equi-join.

    The grid is the candidate generator: cell size = ``radius``, side A
    exploded over its 9-cell neighborhood, side B kept at its home cell,
    hash equi-join on the cell id.  LOSSLESS — unlike the LSH/banding
    generators, the 3×3 neighborhood provably contains every pair
    within the radius (each coordinate differs by < radius, so cell
    indices differ by at most 1).

    ``max_cell`` (default OFF — dropping a cell here loses CORRECTNESS,
    not just mega-cluster recall, so it is not defaulted on like the
    near-dup guards): drops cells holding more than that many points
    before the join, bounding the per-cell O(|cell|²) blowup under
    extreme spatial skew (all points at one landmark).  Prefer a
    smaller radius or pre-aggregation to co-located centroids when the
    data is that skewed.
    """
    cell = float(radius)
    if cell <= 0:
        raise ValueError("radius must be positive")
    # Under-partitioned-input defense (see dedup.edit_distance_pairs): a
    # single-file point table would run the whole neighborhood join in
    # one task; a real multi-file table skips the shuffle.
    par = points.sparkSession.sparkContext.defaultParallelism
    if points.rdd.getNumPartitions() < par:
        points = points.repartition(par)
    pts = points.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
        F.floor(F.col(x_col).cast("double") / cell).alias("__cx"),
        F.floor(F.col(y_col).cast("double") / cell).alias("__cy"))
    if max_cell is not None:
        hot = (pts.groupBy("__cx", "__cy").agg(F.count("*").alias("bn"))
               .where(F.col("bn") > max_cell).select("__cx", "__cy"))
        pts = pts.join(F.broadcast(hot), ["__cx", "__cy"], "left_anti")
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    a = (pts.withColumn("__o", F.explode(offsets))
            .select(F.col("__id").alias("__ida"),
                    F.col("__x").alias("__xa"),
                    F.col("__y").alias("__ya"),
                    (F.col("__cx") + F.col("__o.dx")).alias("__jx"),
                    (F.col("__cy") + F.col("__o.dy")).alias("__jy")))
    b = pts.select(F.col("__id").alias("__idb"),
                   F.col("__x").alias("__xb"),
                   F.col("__y").alias("__yb"), "__cx", "__cy")
    dx = F.col("__xa") - F.col("__xb")
    dy = F.col("__ya") - F.col("__yb")
    d2 = dx * dx + dy * dy
    return (a.join(b, (F.col("__jx") == F.col("__cx"))
                   & (F.col("__jy") == F.col("__cy"))
                   & (F.col("__ida") < F.col("__idb")))
             .where(d2 <= F.lit(cell * cell))
             .select(F.col("__ida").alias("id1"),
                     F.col("__idb").alias("id2"),
                     F.sqrt(d2).alias("dist")))


def grid_knn_join(points: DataFrame, k: int, cell: float,
                  max_rings: int = 8, id_col: str = "id",
                  x_col: str = "x", y_col: str = "y") -> DataFrame:
    """EXACT k-nearest-neighbors per point via expanding grid rings —
    the spatial-exact sibling of ``similarity.knn_graph`` (sign-LSH,
    approximate).  Returns ``(id, nbr_id, dist, rank, exact)`` with
    ``rank`` 1..k by ascending distance (id tie-break) and ``exact``
    true when the k-th distance is provably final.

    Ring-R termination bound: after searching Chebyshev rings 0..R
    around a point's home cell, every point within Euclidean distance
    R*cell has been seen (distance < R*cell implies cell-index
    Chebyshev distance <= R), so a point whose current k-th best
    distance is <= R*cell is DONE — exact kNN without ever comparing
    against the full corpus.  Each iteration explodes only the still-
    unsatisfied points over ring-R cells (8R cells, the ring shell
    only) and hash-joins on the cell id; satisfied points leave the
    loop, so later (wider) rings touch ever-fewer rows — the
    density-adaptive cost profile IVF multiprobe has, with an exactness
    guarantee instead of a recall curve.

    ``cell`` tunes the ring granularity: ~the expected k-NN radius is
    ideal (ring 1 satisfies most points, outliers escalate).  Points
    not satisfied after ``max_rings`` (sparse regions, or k larger than
    the in-range population) return their best-so-far with
    ``exact = false``.  Iterations localCheckpoint the pending set:
    bounded lineage, like the PageRank loop."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cell = float(cell)
    if cell <= 0:
        raise ValueError("cell must be positive")
    par = points.sparkSession.sparkContext.defaultParallelism
    if points.rdd.getNumPartitions() < par:
        points = points.repartition(par)
    base = points.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
        F.floor(F.col(x_col).cast("double") / cell).alias("__cx"),
        F.floor(F.col(y_col).cast("double") / cell).alias("__cy"))
    base = base.localCheckpoint(eager=False)
    b = base.select(F.col("__id").alias("__nbr"),
                    F.col("__x").alias("__xb"),
                    F.col("__y").alias("__yb"), "__cx", "__cy")

    from pyspark.sql import Window
    w = Window.partitionBy("__id").orderBy("dist", "__nbr")

    pending = base            # points still hunting their kNN
    cand = None               # accumulated (id, nbr, dist) candidates
    done = None               # finished top-k rows
    # geometric ring schedule (1, 2, 4, 8, ... max_rings): a sparse
    # outlier needing ring R costs O(log R) driver iterations, not O(R);
    # each iteration searches every shell between the previous target
    # and this one (the first covers rings 0..1 -- a ring-0-only pass
    # almost never settles anything and would cost a full driver round
    # trip), and the termination bound uses the ring REACHED
    targets = [1]
    while targets[-1] < max_rings:
        targets.append(min(targets[-1] * 2, max_rings))
    prev_ring = -1
    for ring in targets:
        shell = [(dx, dy) for dx in range(-ring, ring + 1)
                 for dy in range(-ring, ring + 1)
                 if prev_ring < max(abs(dx), abs(dy)) <= ring]
        prev_ring = ring
        offsets = F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in shell])
        a = (pending.withColumn("__o", F.explode(offsets))
             .select("__id", "__x", "__y",
                     (F.col("__cx") + F.col("__o.dx")).alias("__jx"),
                     (F.col("__cy") + F.col("__o.dy")).alias("__jy")))
        dxc = F.col("__x") - F.col("__xb")
        dyc = F.col("__y") - F.col("__yb")
        new = (a.join(b, (F.col("__jx") == F.col("__cx"))
                      & (F.col("__jy") == F.col("__cy"))
                      & (F.col("__id") != F.col("__nbr")))
               .select("__id", "__nbr",
                       F.sqrt(dxc * dxc + dyc * dyc).alias("dist")))
        cand = new if cand is None else cand.unionByName(new)
        # top-k so far; a point is settled when its k-th distance is
        # inside the ring guarantee radius.  The eager checkpoint HERE
        # is the iteration's one expensive job: everything downstream
        # (kth, settled, the pending anti-join, next round's cand)
        # derives from the materialized top-k instead of re-executing
        # the candidate join + window — the round-8 1x floor was this
        # lineage running ~3x per round (pending checkpoint, cand
        # checkpoint, and the empty-check each re-planned it).
        top = (cand.withColumn("rank", F.row_number().over(w))
               .where(F.col("rank") <= k)
               .localCheckpoint(eager=True))
        kth = (top.groupBy("__id")
               .agg(F.max("dist").alias("__kd"),
                    F.count("*").alias("__kn")))
        settled_ids = kth.where(
            (F.col("__kn") == k) & (F.col("__kd") <= ring * cell))
        settled = top.join(settled_ids.select("__id"), "__id")
        done = settled if done is None else done.unionByName(settled)
        pending = pending.join(settled_ids.select("__id"), "__id",
                               "left_anti")
        pending = pending.localCheckpoint(eager=True)
        # carry forward only the top-k survivors of still-pending ids:
        # a candidate outside the current top-k is dominated by k
        # closer neighbors that all remain, so it can never re-enter —
        # the accumulated set stays <= k rows per pending point instead
        # of growing with every ring, and it reads from the checkpoint
        # (no second materialization job needed).
        cand = top.drop("rank").join(settled_ids.select("__id"), "__id",
                                     "left_anti")
        if not pending.limit(1).count():
            break
    out = done.withColumn("exact", F.lit(True)) if done is not None \
        else None
    if pending.limit(1).count():      # max_rings exhausted: best-effort
        rest = (cand.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
                .withColumn("exact", F.lit(False)))
        out = rest if out is None else out.unionByName(rest)
    return out.select(F.col("__id").alias("id"),
                      F.col("__nbr").alias("nbr_id"),
                      "dist", "rank", "exact")


# Strictly below 1/sqrt(2) by ~1.7e-9 relative: with cell size
# eps * _CELL_K, the same-cell diagonal cell*sqrt(2) stays provably
# under eps even through floating-point slop in floor(x/cell) — the
# all-core shortcut depends on that strict inequality, and sitting a
# hair below eps/sqrt(2) only widens the 5x5 neighborhood's slack
# (eps/cell ~ 1.4142136 < 2) while moving four corner cells of the 5x5
# from provably-excludable to almost-always-empty-after-filter.
_CELL_K = 0.70710678


def dbscan(points: DataFrame, eps: float, min_pts: int,
           id_col: str = "id", x_col: str = "x", y_col: str = "y",
           max_cell: int | None = None,
           pair_cache_limit: int = 50_000_000) -> DataFrame:
    """Exact DBSCAN (Ester et al., KDD'96) with the eps/sqrt(2) DENSE-
    CELL shortcut (the grid trick behind Gunawan's exact grid DBSCAN,
    MSc thesis 2013, and de Berg et al.'s O(n log n) variant) — density
    clustering whose pair enumeration VANISHES exactly where the data
    is densest:

    1. grid the plane at cell = eps/sqrt(2) (a hair under — see
       ``_CELL_K``): any two points sharing a cell are provably within
       eps (diagonal = cell*sqrt(2) < eps), so a cell holding
       >= ``min_pts`` points is ALL-CORE with ZERO pair enumeration,
       and the whole cell collapses to ONE node (its min point id) in
       the component graph;
    2. SPARSE-cell points (cell population < min_pts) get exact
       neighbor counts from one 5x5-neighborhood hash equi-join against
       all points (lossless: eps < 2*cell, so eps-neighbors differ by
       <= 2 cell indices) — core iff count (self included) >= min_pts;
    3. dense-cell CONNECTIVITY runs at CELL granularity: adjacent
       dense-cell pairs first try a 4x4 representative check (each
       cell's x/y-extreme points — any rep pair within eps PROVES the
       edge); only unproven pairs fall back to a point-level equi-join
       that streams into an early distance filter + distinct (never
       materialized).  Sparse cores link to dense cells / other sparse
       cores through their step-2 neighbor rows;
    4. core clusters = ``graph.star_components`` over the cell-
       granularity graph (nodes = dense cells + sparse cores — in the
       dense regime ORDERS OF MAGNITUDE fewer than points; O(log n)
       rounds on any topology); isolated nodes self-seed via the
       self-loop contract;
    5. BORDER points (non-core within eps of a core; always in sparse
       cells, since dense-cell points are core) attach to their NEAREST
       core's cluster, ties by (dist, cluster) — one map-side-
       combinable min(struct) aggregate, no window;
    6. everything else is NOISE.

    Returns one row per input point: ``(id, role, cluster)`` with role
    in {'core','border','noise'} and cluster = the component's min core
    id (NULL for noise) — a dense cell's min point id IS a core id, so
    the cell-granularity component min equals the point-granularity
    one.  Deterministic for any input (the tie-break is total), and
    bit-identical to the point-granularity formulation: the shortcut
    changes which pairs are ENUMERATED, never which points are core or
    connected.

    ``max_cell`` (default OFF, correctness-trading like the grid-join
    guard): cells of the eps/sqrt(2) grid holding more than that many
    points are dropped entirely (their points report noise).  Rarely
    needed now — the dense regime that motivated it costs O(cells)
    here, not O(pairs): the fixed-plane 16x probe that OOMed the
    point-granularity design at local[32] (SCALE.md §21, ~226M pair
    rows) runs in seconds with zero sparse pairs.  ``pair_cache_limit``
    sizes the sparse-pair caching decision; the estimate now comes from
    ONE hash aggregate over the cell histogram (sum over sparse cells
    of |cell| x 5x5-neighborhood population — an upper bound on the
    join's output) instead of executing the join once to count it."""
    from .graph import star_components

    eps = float(eps)
    if eps <= 0:
        raise ValueError("eps must be positive")
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    cell = eps * _CELL_K
    eps2 = eps * eps
    par = points.sparkSession.sparkContext.defaultParallelism
    if points.rdd.getNumPartitions() < par:
        points = points.repartition(par)
    pts = points.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
        F.floor(F.col(x_col).cast("double") / cell).alias("__cx"),
        F.floor(F.col(y_col).cast("double") / cell).alias("__cy"))
    # NULL-coordinate rows are NOISE by construction (distance to them
    # is undefined): the join-based pair paths exclude them for free
    # (NULL never equi-joins), but the dense-cell shortcut counts via
    # groupBy, where NULL cells DO group — filter them out of every
    # computation here; they re-enter through `ids` at assembly
    pts = pts.where(F.col("__x").isNotNull() & F.col("__y").isNotNull())

    xy = F.struct(F.col("__x").alias("x"), F.col("__y").alias("y"))
    hist_all = pts.groupBy("__cx", "__cy").agg(
        F.count("*").alias("__n"),
        F.min("__id").alias("__minid"),
        # x/y-extreme representative points: the cheap existence
        # witnesses for dense-cell adjacency (step 3).  Ties pick an
        # arbitrary extreme point — any point of the cell is a valid
        # witness, so min_by's tie nondeterminism cannot change results
        F.min_by(xy, F.col("__x")).alias("__r0"),
        F.max_by(xy, F.col("__x")).alias("__r1"),
        F.min_by(xy, F.col("__y")).alias("__r2"),
        F.max_by(xy, F.col("__y")).alias("__r3"))
    off25 = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-2, 3) for dy in range(-2, 3)])
    # canonical half of the 24 non-zero offsets: each unordered
    # adjacent cell pair enumerates exactly once
    off12 = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-2, 3) for dy in range(-2, 3)
        if dx > 0 or (dx == 0 and dy > 0)])

    persisted = []
    try:
        # persist the UNFILTERED histogram: under max_cell both the hot
        # set and the kept cells derive from it, so caching here pays
        # the cell aggregate once instead of once per derivation
        hist_all = hist_all.persist()
        persisted.append(hist_all)
        if max_cell is not None:
            hot = (hist_all.where(F.col("__n") > max_cell)
                   .select("__cx", "__cy"))
            pts_act = pts.join(F.broadcast(hot), ["__cx", "__cy"],
                               "left_anti")
            hist = hist_all.where(F.col("__n") <= max_cell)
        else:
            pts_act, hist = pts, hist_all
        dense = hist.where(F.col("__n") >= min_pts)

        # ---- sparse-point neighbor pairs (the ONLY per-point pair
        # enumeration left; empty in the all-dense regime) ----
        sp = pts_act.join(dense.select("__cx", "__cy"),
                          ["__cx", "__cy"], "left_anti")
        nbr = pts_act.select(F.col("__id").alias("__nid"),
                             F.col("__x").alias("__nx"),
                             F.col("__y").alias("__ny"),
                             F.col("__cx").alias("__ncx"),
                             F.col("__cy").alias("__ncy"))
        dxs = F.col("__sx") - F.col("__nx")
        dys = F.col("__sy") - F.col("__ny")
        d2s = dxs * dxs + dys * dys
        spairs = (sp.withColumn("__o", F.explode(off25))
                  .select(F.col("__id").alias("__sid"),
                          F.col("__x").alias("__sx"),
                          F.col("__y").alias("__sy"),
                          (F.col("__cx") + F.col("__o.dx"))
                          .alias("__jx"),
                          (F.col("__cy") + F.col("__o.dy"))
                          .alias("__jy"))
                  .join(nbr, (F.col("__jx") == F.col("__ncx"))
                        & (F.col("__jy") == F.col("__ncy"))
                        & (F.col("__sid") != F.col("__nid")))
                  .where(d2s <= F.lit(eps2))
                  .select("__sid", "__nid", F.sqrt(d2s).alias("__dist")))
        bounded = False
        if pair_cache_limit:
            # histogram-only upper bound on the sparse join's output:
            # no point-level work is spent pricing the decision
            h3 = hist.select("__cx", "__cy", "__n")
            est_row = (h3.where(F.col("__n") < min_pts)
                       .withColumn("__o", F.explode(off25))
                       .select(F.col("__n").alias("__ns"),
                               (F.col("__cx") + F.col("__o.dx"))
                               .alias("__jx"),
                               (F.col("__cy") + F.col("__o.dy"))
                               .alias("__jy"))
                       .join(h3.select(F.col("__cx").alias("__jx"),
                                       F.col("__cy").alias("__jy"),
                                       F.col("__n").alias("__nt")),
                             ["__jx", "__jy"])
                       .agg(F.coalesce(
                           F.sum(F.col("__ns") * F.col("__nt")),
                           F.lit(0)).alias("est")).first())
            if int(est_row["est"]) <= pair_cache_limit:
                spairs = spairs.persist()
                persisted.append(spairs)
                bounded = True

        # ---- sparse coreness (dense-cell points are core for free) --
        score = (spairs.groupBy("__sid")
                 .agg((F.count("*") + 1).alias("__nn"))
                 .where(F.col("__nn") >= min_pts)
                 .select(F.col("__sid").alias("__id"))
                 .persist())
        persisted.append(score)

        # ---- dense-cell adjacency: proven tier (reps), then the
        # unproven remainder at point level (filter-then-distinct —
        # streams, never materialized) ----
        da = (dense.withColumn("__o", F.explode(off12))
              .select(F.col("__minid").alias("__ma"),
                      *[F.col(f"__r{i}").alias(f"__a{i}")
                        for i in range(4)],
                      F.col("__cx").alias("__acx"),
                      F.col("__cy").alias("__acy"),
                      (F.col("__cx") + F.col("__o.dx")).alias("__jx"),
                      (F.col("__cy") + F.col("__o.dy")).alias("__jy")))
        db_ = dense.select(F.col("__minid").alias("__mb"),
                           *[F.col(f"__r{i}").alias(f"__b{i}")
                             for i in range(4)],
                           F.col("__cx").alias("__bcx"),
                           F.col("__cy").alias("__bcy"))
        cand = da.join(db_, (F.col("__jx") == F.col("__bcx"))
                       & (F.col("__jy") == F.col("__bcy")))
        rep_d2 = []
        for i in range(4):
            for j in range(4):
                rdx = F.col(f"__a{i}.x") - F.col(f"__b{j}.x")
                rdy = F.col(f"__a{i}.y") - F.col(f"__b{j}.y")
                rep_d2.append(rdx * rdx + rdy * rdy)
        proven = F.least(*rep_d2) <= F.lit(eps2)
        # r16 (guide §3 — shrink the join's candidate set): a cell pair
        # can also be EXCLUDED exactly.  The x/y-extreme representatives
        # define each cell's point bounding box (r0.x..r1.x, r2.y..r3.y);
        # the axis gaps between the two boxes lower-bound every
        # point-pair distance, so gap² > eps² proves NO qualifying pair
        # exists — no false exclusion, same edges (subtract-verified +
        # brute-force parity).  Measured at sf0.1: ambiguous pairs
        # 8356 -> 2729 (-67 %); the point-level fallback's per-pair
        # |A|x|B| distance work shrinks by the same factor at any scale.
        gx = F.greatest(F.lit(0.0),
                        F.col("__b0.x") - F.col("__a1.x"),
                        F.col("__a0.x") - F.col("__b1.x"))
        gy = F.greatest(F.lit(0.0),
                        F.col("__b2.y") - F.col("__a3.y"),
                        F.col("__a2.y") - F.col("__b3.y"))
        excluded = gx * gx + gy * gy > F.lit(eps2)
        e_dd = cand.where(proven).select(F.col("__ma").alias("a"),
                                         F.col("__mb").alias("b"))
        amb = cand.where(~proven & ~excluded) \
                  .select("__acx", "__acy", "__bcx",
                          "__bcy", "__ma", "__mb")
        pa_t = pts_act.select(F.col("__cx").alias("__acx"),
                              F.col("__cy").alias("__acy"),
                              F.col("__x").alias("__pax"),
                              F.col("__y").alias("__pay"))
        pb_t = pts_act.select(F.col("__cx").alias("__bcx"),
                              F.col("__cy").alias("__bcy"),
                              F.col("__x").alias("__pbx"),
                              F.col("__y").alias("__pby"))
        dxp = F.col("__pax") - F.col("__pbx")
        dyp = F.col("__pay") - F.col("__pby")
        e_amb = (amb.join(pa_t, ["__acx", "__acy"])
                 .join(pb_t, ["__bcx", "__bcy"])
                 .where(dxp * dxp + dyp * dyp <= F.lit(eps2))
                 .select(F.col("__ma").alias("a"),
                         F.col("__mb").alias("b"))
                 .distinct())

        # ---- sparse-core links: every neighbor row whose target is
        # core contributes an edge to that core's component NODE
        # (dense cell -> its min id; sparse core -> itself) ----
        dense_pt = (pts_act.join(dense.select("__cx", "__cy",
                                              "__minid"),
                                 ["__cx", "__cy"])
                    .select("__id", F.col("__minid").alias("__node")))
        core_node = dense_pt.unionByName(
            score.select("__id", F.col("__id").alias("__node")))
        e_sc = (spairs.join(score.withColumnRenamed("__id", "__sid"),
                            "__sid")
                .join(core_node.withColumnRenamed("__id", "__nid"),
                      "__nid")
                .select(F.col("__sid").alias("a"),
                        F.col("__node").alias("b")))
        loops = (dense.select(F.col("__minid").alias("a"),
                              F.col("__minid").alias("b"))
                 .unionByName(score.select(F.col("__id").alias("a"),
                                           F.col("__id").alias("b"))))
        alledges = (e_dd.unionByName(e_amb).unionByName(e_sc)
                    .unionByName(loops))
        # pre-checkpoint stage digest (r12 verdict #1): the three edge
        # joins vanish behind the bounded-regime checkpoint below AND
        # behind the final labels checkpoint — this is the plan the
        # drift alarm must see
        stage_digest("dbscan.component_edges", alledges)
        if bounded:
            # ONE eager materialization of the component edge set (its
            # size is est-bounded: e_sc <= the sparse estimate, the
            # dense tiers <= 13 edges/cell): star_components' node and
            # edge passes then read blocks instead of re-executing the
            # three edge joins — measured ~5 s of the q163 bench floor.
            # The unbounded regime keeps the pipelined/spillable path.
            # coalesce first: the 4-branch union concatenates every
            # branch's partitions (~100+ tiny ones at bench scale);
            # par partitions bound the per-partition rows at <= ~2M
            # even at the 50M-row cache limit
            alledges = (alledges.coalesce(par)
                        .localCheckpoint(eager=True))
        comps = star_components(alledges, "a", "b")

        # ---- per-point labels ----
        core_lab = (core_node.join(
            comps.withColumnRenamed("node", "__node"), "__node")
            .select("__id", F.col("cluster").alias("__cl"))
            .persist())
        persisted.append(core_lab)
        # border attach: min(struct) is the (dist, cluster) total-order
        # tie-break as one combinable aggregate — no window sort
        bor = (spairs.join(score.withColumnRenamed("__id", "__sid"),
                           "__sid", "left_anti")
               .join(core_lab.withColumnRenamed("__id", "__nid"),
                     "__nid")
               .groupBy("__sid")
               .agg(F.min(F.struct(F.col("__dist").alias("d"),
                                   F.col("__cl").alias("c")))
                    .alias("__m"))
               .select(F.col("__sid").alias("__id"),
                       F.col("__m.c").alias("__bcl")))
        ids = points.select(F.col(id_col).alias("__id"))
        out = (ids.join(core_lab, "__id", "left")
               .join(bor, "__id", "left")
               .select(F.col("__id").alias("id"),
                       F.when(F.col("__cl").isNotNull(), F.lit("core"))
                       .when(F.col("__bcl").isNotNull(),
                             F.lit("border"))
                       .otherwise(F.lit("noise")).alias("role"),
                       F.coalesce("__cl", "__bcl").alias("cluster"))
               # one row per input point — materializing here lets
               # every big intermediate be released before the caller
               # composes on the result
               )
        stage_digest("dbscan.labels", out)  # pre-checkpoint plan
        out = out.localCheckpoint(eager=True)
    finally:
        for frame in persisted:
            frame.unpersist()
    return out


def grid_distance_join_nd(points: DataFrame, radius: float,
                          id_col: str = "id",
                          coord_cols: "tuple[str, ...]" = ("x", "y"),
                          max_cell: int | None = None) -> DataFrame:
    """:func:`grid_distance_join` in d DIMENSIONS: all pairs within
    Euclidean ``radius`` over ``coord_cols``, as ``(id1, id2, dist)``
    with ``id1 < id2`` — the density-pair generator for REDUCED
    embedding spaces (compose with ``similarity.pca_project`` to 2-4
    dims, then feed the pairs to ``graph.star_components`` /
    ``dedup.dup_clusters`` for SemDeDup-style density grouping).

    Same lossless construction per dimension (cell = radius, pairs
    within the radius differ by <= 1 cell index in EVERY coordinate),
    but the exploded neighborhood is 3^d cells: 9 at d=2, 27 at d=3,
    81 at d=4 — the explode factor, and with it shuffle volume, is
    EXPONENTIAL in d, which is why this is a reduced-space operator
    (d <= 6 enforced; at full embedding width use the LSH/IVF
    generators instead — their candidate sets are probabilistic, not
    exhaustive, precisely because exhaustive grids stop scaling).
    Cost beyond the explode is unchanged: one hash equi-join on the
    d-part cell key, per-cell-pair products bounded by grid density.

    ``max_cell``: same correctness-trading skew guard as 2-D (drops
    over-full cells entirely, default OFF).

    NOTE: :func:`grid_distance_join` is the same algorithm at d=2 and
    could delegate here, but deliberately does not — q161's plan
    contract and committed plan digest pin its ``__jx``/``__jy`` join
    keys, and renaming them to the generic ``__j0``/``__j1`` would
    churn a benched query's plan for a cosmetic dedup.  Keep the two
    bodies in sync when touching either (pytest asserts their d=2
    outputs are identical)."""
    cell = float(radius)
    if cell <= 0:
        raise ValueError("radius must be positive")
    dims = list(coord_cols)
    d = len(dims)
    if not 1 <= d <= 6:
        raise ValueError("grid_distance_join_nd supports 1-6 coord "
                         "columns (the 3^d neighborhood explode is "
                         f"exponential in d); got {d}")
    par = points.sparkSession.sparkContext.defaultParallelism
    if points.rdd.getNumPartitions() < par:
        points = points.repartition(par)
    pts = points.select(
        F.col(id_col).alias("__id"),
        *[F.col(c).cast("double").alias(f"__x{i}")
          for i, c in enumerate(dims)],
        *[F.floor(F.col(c).cast("double") / cell).alias(f"__c{i}")
          for i, c in enumerate(dims)])
    if max_cell is not None:
        ckeys = [f"__c{i}" for i in range(d)]
        hot = (pts.groupBy(*ckeys).agg(F.count("*").alias("bn"))
               .where(F.col("bn") > max_cell).select(*ckeys))
        pts = pts.join(F.broadcast(hot), ckeys, "left_anti")
    from itertools import product
    offsets = F.array(*[
        F.struct(*[F.lit(o[i]).alias(f"o{i}") for i in range(d)])
        for o in product((-1, 0, 1), repeat=d)])
    a = (pts.withColumn("__o", F.explode(offsets))
         .select(F.col("__id").alias("__ida"),
                 *[F.col(f"__x{i}").alias(f"__xa{i}") for i in range(d)],
                 *[(F.col(f"__c{i}") + F.col(f"__o.o{i}"))
                   .alias(f"__j{i}") for i in range(d)]))
    b = pts.select(F.col("__id").alias("__idb"),
                   *[F.col(f"__x{i}").alias(f"__xb{i}")
                     for i in range(d)],
                   *[F.col(f"__c{i}") for i in range(d)])
    cond = (F.col("__ida") < F.col("__idb"))
    for i in range(d):
        cond = cond & (F.col(f"__j{i}") == F.col(f"__c{i}"))
    d2 = None
    for i in range(d):
        dx = F.col(f"__xa{i}") - F.col(f"__xb{i}")
        d2 = dx * dx if d2 is None else d2 + dx * dx
    return (a.join(b, cond)
            .where(d2 <= F.lit(cell * cell))
            .select(F.col("__ida").alias("id1"),
                    F.col("__idb").alias("id2"),
                    F.sqrt(d2).alias("dist")))


def dbscan_nd(points: DataFrame, eps: float, min_pts: int,
              id_col: str = "id",
              coord_cols: "tuple[str, ...]" = ("x", "y"),
              max_cell: int | None = None,
              pair_cache_limit: int = 50_000_000) -> DataFrame:
    """Exact DBSCAN over d COORDINATES — density clustering for
    PCA-reduced embedding spaces (``similarity.pca_project`` to 2-4
    dims, then this): same ``(id, role, cluster)`` contract and
    deterministic (dist, cluster) border tie-break as :func:`dbscan`,
    built at POINT granularity over :func:`grid_distance_join_nd`
    pairs:

    1. eps-neighbor pairs from the d-dim grid equi-join (lossless);
    2. core = neighbor count (self included) >= min_pts — one hash
       aggregate over the symmetrized pairs;
    3. core clusters = ``graph.star_components`` over core-core edges
       (+ self-loops; the driver union-find kernel takes over when the
       core graph is small);
    4. borders attach to the nearest core by one min(struct(dist,
       cluster)) aggregate — total tie-break, no window sort;
    5. the rest is noise.

    The 2-D operator's eps/sqrt(2) dense-cell shortcut does NOT
    generalize cheaply: in d dims "same cell implies within eps" needs
    cell = eps/sqrt(d), which widens the lossless neighborhood to
    ceil(sqrt(d)) rings — 5^d cells at d >= 2, a 125x/625x explode at
    d = 3/4 against the 3^d = 27x/81x this composition pays.  So in
    higher dims the point-granularity pipeline with the pair-count
    cache decision is the better trade; use :func:`dbscan` for 2-D
    planes, where the shortcut erases the dense regime entirely.

    ``max_cell`` passes through to the grid join (correctness-trading
    skew guard, default OFF).  ``pair_cache_limit``: pair sets whose
    HISTOGRAM upper bound (below) sits at or under it persist for the
    three consumers; above it the pipelined/spillable recompute path
    stands (the SCALE.md §21 memory lesson).  The cache decision is
    priced by ONE hash aggregate over the d-dim cell histogram —
    sum over neighbor cell pairs of |a| x |b| across the 3^d
    neighborhood — never by executing the grid join (round-10 verdict:
    the old ``pairs.count()`` ran the full join once to decide, then
    ``persist()`` re-ran it to fill the cache).  The bound counts
    ordered pairs including the self cell, so it over-states the
    (id1 < id2, dist <= eps) output by >= 2x — the safe direction for
    a cache-admission knob."""
    from .graph import star_components

    pairs = grid_distance_join_nd(points, eps, id_col=id_col,
                                  coord_cols=coord_cols,
                                  max_cell=max_cell)
    persisted = []
    try:
        if pair_cache_limit:
            from itertools import product as _product
            d = len(coord_cols)
            hist = (points.groupBy(
                        *[F.floor(F.col(c).cast("double") / eps)
                          .alias(f"__c{i}")
                          for i, c in enumerate(coord_cols)])
                    .agg(F.count("*").alias("__n")))
            if max_cell is not None:
                # mirror the join's skew guard: dropped cells generate
                # no pairs, so they price at zero on both sides
                hist = hist.where(F.col("__n") <= max_cell)
            offs = F.array(*[
                F.struct(*[F.lit(o[i]).alias(f"o{i}")
                           for i in range(d)])
                for o in _product((-1, 0, 1), repeat=d)])
            est = (hist.withColumn("__o", F.explode(offs))
                   .select(F.col("__n").alias("__na"),
                           *[(F.col(f"__c{i}") + F.col(f"__o.o{i}"))
                             .alias(f"__j{i}") for i in range(d)])
                   .join(hist.select(
                       *[F.col(f"__c{i}").alias(f"__j{i}")
                         for i in range(d)],
                       F.col("__n").alias("__nb")),
                       [f"__j{i}" for i in range(d)])
                   .agg(F.coalesce(F.sum(F.col("__na")
                                         * F.col("__nb")),
                                   F.lit(0)).alias("est")).first())
            if int(est["est"]) <= pair_cache_limit:
                pairs = pairs.persist()
                persisted.append(pairs)
        sym = (pairs.select(F.col("id1").alias("a"),
                            F.col("id2").alias("b"), "dist")
               .unionByName(pairs.select(F.col("id2").alias("a"),
                                         F.col("id1").alias("b"),
                                         "dist")))
        ids = points.select(F.col(id_col).alias("id"))
        ncnt = sym.groupBy(F.col("a").alias("id")).agg(
            (F.count("*") + 1).alias("__n"))
        core = (ids.join(ncnt, "id", "left")
                .where(F.coalesce("__n", F.lit(1)) >= min_pts)
                .select("id").persist())
        persisted.append(core)
        core_edges = (sym.select("a", "b")
                      .join(core.withColumnRenamed("id", "a"), "a")
                      .join(core.withColumnRenamed("id", "b"), "b")
                      .unionByName(core.select(F.col("id").alias("a"),
                                               F.col("id").alias("b"))))
        clab = (star_components(core_edges, "a", "b")
                .withColumnRenamed("node", "id")
                .withColumnRenamed("cluster", "__cl"))
        border = (sym.join(core.withColumnRenamed("id", "b"), "b")
                  .join(core.withColumnRenamed("id", "a"), "a",
                        "left_anti")
                  .join(clab.withColumnRenamed("id", "b"), "b")
                  .groupBy(F.col("a").alias("id"))
                  .agg(F.min(F.struct(F.col("dist").alias("d"),
                                      F.col("__cl").alias("c")))
                       .alias("__m"))
                  .select("id", F.col("__m.c").alias("__bcl")))
        out = (ids.join(clab, "id", "left")
               .join(border, "id", "left")
               .select("id",
                       F.when(F.col("__cl").isNotNull(), F.lit("core"))
                       .when(F.col("__bcl").isNotNull(),
                             F.lit("border"))
                       .otherwise(F.lit("noise")).alias("role"),
                       F.coalesce("__cl", "__bcl").alias("cluster")))
        stage_digest("dbscan_nd.labels", out)  # pre-checkpoint plan
        out = out.localCheckpoint(eager=True)
    finally:
        for frame in persisted:
            frame.unpersist()
    return out
