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


def dbscan(points: DataFrame, eps: float, min_pts: int,
           id_col: str = "id", x_col: str = "x", y_col: str = "y",
           max_cell: int | None = None,
           pair_cache_limit: int = 50_000_000) -> DataFrame:
    """Exact DBSCAN (Ester et al., KDD'96) as a composition of the
    engine's bounded primitives — density clustering without an
    all-pairs scan or an iterative driver loop over points:

    1. eps-neighbor pairs from :func:`grid_distance_join` (cell = eps,
       lossless, candidate-bound by grid density);
    2. CORE points = neighbor count (self included) >= ``min_pts`` —
       one hash aggregate over the symmetrized pairs;
    3. core clusters = connected components of the core-core edge set
       via ``graph.star_components`` (O(log n) rounds on ANY topology —
       density ridges form exactly the chain shapes that break
       diameter-bounded label propagation); isolated cores self-seed
       through the self-loop contract;
    4. BORDER points (non-core within eps of a core) attach to their
       NEAREST core's cluster, ties by (dist, cluster) — one window
       rank over the border->core neighbor rows;
    5. everything else is NOISE.

    Returns one row per input point: ``(id, role, cluster)`` with role
    in {'core','border','noise'} and cluster = the component's min core
    id (NULL for noise).  Deterministic for any input (the tie-break
    is total).  ``max_cell`` passes through to the grid join (same
    correctness-trading contract, default OFF).  ``pair_cache_limit``
    sizes the caching decision to the graph (one count buys it): pair
    sets at or under it persist so the three consumers read blocks
    instead of recomputing the grid join; 0/None forces the no-cache
    pipelined path (see the in-body comment and SCALE.md §21 for the
    measured OOM regimes behind this shape)."""
    from .graph import star_components

    pairs = grid_distance_join(points, eps, id_col=id_col, x_col=x_col,
                               y_col=y_col, max_cell=max_cell)
    # Size the caching decision to the GRAPH (the dup_clusters rule):
    # `sym` is a union, so each downstream consumer (neighbor count,
    # core-edge derivation, border attach) would otherwise recompute
    # the grid join TWICE — ~6 computations total.  One count (the
    # 1st computation) buys the decision:
    #  - pairs under `pair_cache_limit` persist MEMORY_AND_DISK —
    #    every consumer then reads blocks, total 2 computations;
    #  - above the limit (eps mistuned for the density, SCALE.md §21:
    #    the fixed-plane 16x probe's ~113M rows) caching PINS unified
    #    memory against the downstream aggregates (measured OOM with
    #    localCheckpoint, MEMORY_AND_DISK and DISK_ONLY alike at
    #    local[32]'s per-task budget) — recompute-per-consumer keeps
    #    everything pipelined and spillable.
    cached = None
    if pair_cache_limit and pairs.count() <= pair_cache_limit:
        pairs = pairs.persist()
        cached = pairs
    sym = (pairs.select(F.col("id1").alias("a"), F.col("id2").alias("b"),
                        "dist")
           .unionByName(pairs.select(F.col("id2").alias("a"),
                                     F.col("id1").alias("b"), "dist")))
    ids = points.select(F.col(id_col).alias("id"))
    ncnt = sym.groupBy(F.col("a").alias("id")).agg(
        (F.count("*") + 1).alias("__n"))
    core = (ids.join(ncnt, "id", "left")
            .where(F.coalesce("__n", F.lit(1)) >= min_pts)
            .select("id").persist())
    core_edges = (sym.select("a", "b")
                  .join(core.withColumnRenamed("id", "a"), "a")
                  .join(core.withColumnRenamed("id", "b"), "b")
                  # self-loops seed isolated cores as their own cluster
                  .unionByName(core.select(F.col("id").alias("a"),
                                           F.col("id").alias("b"))))
    clab = star_components(core_edges, "a", "b") \
        .withColumnRenamed("node", "id") \
        .withColumnRenamed("cluster", "__cl")
    from pyspark.sql import Window
    bw = Window.partitionBy("id").orderBy("dist", "__cl")
    # no broadcast hints: core scales with the data (it is most of the
    # points on a dense corpus) — AQE decides at runtime size
    border = (sym.join(core.withColumnRenamed("id", "b"), "b")
              .join(core.withColumnRenamed("id", "a"), "a", "left_anti")
              .join(clab.withColumnRenamed("id", "b"), "b")
              .select(F.col("a").alias("id"), "dist", "__cl")
              .withColumn("__rn", F.row_number().over(bw))
              .where(F.col("__rn") == 1)
              .select("id", F.col("__cl").alias("__bcl")))
    out = (ids.join(clab, "id", "left")
           .join(border, "id", "left")
           .select("id",
                   F.when(F.col("__cl").isNotNull(), F.lit("core"))
                   .when(F.col("__bcl").isNotNull(), F.lit("border"))
                   .otherwise(F.lit("noise")).alias("role"),
                   F.coalesce("__cl", "__bcl").alias("cluster"))
           # one row per input point — materializing here lets every
           # big intermediate be released before the caller composes on
           .localCheckpoint(eager=True))
    core.unpersist()
    if cached is not None:
        cached.unpersist()
    return out
