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
