"""Similarity search over embedding columns (``ARRAY<FLOAT>``): brute-force
cosine top-k as the exact baseline, sign-LSH bucketing and IVF cell probing
as the 100 TB scale paths.

Scale shapes:

- brute force scans every vector once (no shuffle except the final top-k,
  which is a partial top-k per partition + tiny driver merge via
  ``orderBy().limit()`` under AQE);
- sign-LSH prunes the scan with a bucket equality filter computed from
  deterministic hyperplanes — at cluster scale the table is stored
  bucketed/partitioned by ``bucket`` so a probe touches one partition;
- IVF assigns vectors to their nearest coarse centroid once (broadcast
  join + per-row argmax, one narrow shuffle to write), then probes the
  ``n_probe`` nearest cells only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..querylog import stage_digest

__all__ = ["cosine_topk", "cosine_pairs", "lsh_bucket", "lsh_topk",
           "ivf_assign", "ivf_topk", "train_centroids", "sample_centroids",
           "cosine_topk_batch", "quantize_embeddings", "dequantize_embeddings",
           "pq_train", "pq_encode", "pq_topk", "ivfpq_topk",
           "semantic_dedup", "semdedup_exact",
           "pca_fit", "pca_project", "pca_moments", "merge_moments",
           "pca_from_moments"]


def _dot_with_lit(col: str, vec: np.ndarray):
    lit = F.array(*[F.lit(float(x)) for x in vec])
    return F.aggregate(
        F.zip_with(F.col(col), lit, lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda a, v: a + v)


def _norm(col: str):
    return F.sqrt(F.aggregate(
        F.col(col), F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double")))


def cosine_topk(emb: DataFrame, query: "list[float] | np.ndarray", k: int,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force cosine top-k: JVM-side dot product against the
    literal query vector, deterministic (score, id) ordering."""
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    cos = _dot_with_lit(vec_col, q) / (_norm(vec_col) * F.lit(qn))
    return (emb.select(id_col, cos.alias("cos_sim"))
               .orderBy(F.desc("cos_sim"), id_col)
               .limit(k))


def cosine_pairs(emb: DataFrame, bucket_cols: "list[str]", threshold: float,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 round_to: int = 5, chunk: int = 1024) -> DataFrame:
    """All intra-bucket cosine pairs with similarity ≥ ``threshold``
    (embedding near-dup detection). The caller provides the blocking
    columns (quantization cells, LSH buckets, IVF cells ...); within each
    bucket the pairwise scores come from one numpy matmul per ``chunk``
    rows — a BLAS block product instead of a per-pair interpreted
    ``aggregate(zip_with(...))`` expression (~6× faster at sf0.1).

    Scale shape: one shuffle on the bucket key, then embarrassingly
    parallel per-bucket blocks. Work and output are O(|bucket|²) — the
    blocking scheme, not this operator, bounds the cost; chunking bounds
    per-task memory at ``chunk × |bucket|`` floats, so a skewed bucket
    spills time, not memory. Pairs are emitted with ``d1 < d2``.
    """

    def pairs(key, g):
        import pandas as pd
        M = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        M, ids = M[order], ids[order]
        N = M / np.linalg.norm(M, axis=1, keepdims=True)
        n = len(ids)
        cols = np.arange(n)
        out = []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            C = N[s:e] @ N.T                       # (e-s, n) block
            keep = (C >= threshold) & (cols[None, :] > np.arange(s, e)[:, None])
            i, j = np.nonzero(keep)
            out.append(pd.DataFrame({
                "d1": ids[i + s], "d2": ids[j],
                "cos_sim": np.round(C[i, j], round_to)}))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {"d1": [], "d2": [], "cos_sim": []})

    id_type = dict(emb.dtypes)[id_col]
    return (emb.select(id_col, vec_col, *bucket_cols)
               .groupBy(*bucket_cols)
               .applyInPandas(pairs,
                              f"d1 {id_type}, d2 {id_type}, cos_sim double"))


def semantic_dedup(emb: DataFrame, cluster_cols: "list[str]",
                   threshold: float = 0.95, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): drop every vector
    that has a smaller-id neighbor with cosine ≥ ``threshold`` inside its
    semantic cluster. Returns the DROP LIST — one row per removed vector:
    ``(id, dup_of = smallest dominating neighbor, n_dups, max_cos)`` —
    so callers audit before they delete (left-anti join to apply).

    ``cluster_cols`` is any precomputed partition of the space: k-means
    cell ids from ``train_centroids``+``ivf_assign`` (the SemDeDup paper's
    choice), an LSH ``bucket``, or an existing label column. Keep-lowest-id
    is the deterministic stand-in for the paper's keep-one-per-group rule —
    no connected components needed, because domination by ANY smaller id
    removes a row (transitivity is irrelevant to membership of the drop
    set).

    Scale shape = ``cosine_pairs``: one shuffle on the cluster key, one
    BLAS block matmul per cluster chunk, O(|cluster|²) work bounded by the
    clustering granularity; then a hash-agg on the victim id.
    Oracle-checked as corpus q92 (label clusters).
    """
    pairs = cosine_pairs(emb, cluster_cols, threshold,
                         id_col=id_col, vec_col=vec_col)
    return (pairs.groupBy(F.col("d2").alias(id_col))
                 .agg(F.min("d1").alias("dup_of"),
                      F.count("*").alias("n_dups"),
                      F.max("cos_sim").alias("max_cos")))


def semdedup_exact(emb: DataFrame, threshold: float = 0.95, k: int = 2,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   max_cell: "int | None" = None) -> DataFrame:
    """Globally EXACT SemDeDup: group vectors whose cosine-similarity
    graph (edges at ``cos >= threshold``) connects them, keep the
    smallest id per group, and return the DROP LIST ``(id, dup_of)``
    with ``dup_of`` = the kept representative.  This is the end-to-end
    composition the round-10 nd operators exist for — and unlike
    :func:`semantic_dedup` (the paper's per-cluster heuristic, blind
    to pairs straddling a cluster boundary) it is exact over the WHOLE
    space, because the candidate generator is lossless:

    1. L2-normalize — for unit vectors ``cos(u,v) >= t``  iff
       ``||u - v|| <= eps = sqrt(2 - 2t)``;
    2. :func:`pca_fit` (driver holds d + d² moments only) +
       :func:`pca_project` to ``k`` dims — projection onto an
       ORTHONORMAL basis is non-expansive (centering is an isometry,
       so ``||P(u) - P(v)|| <= ||u - v||``), hence every qualifying
       pair ALSO sits within eps in the projected space;
    3. :func:`spatial.grid_distance_join_nd` with radius eps over the
       k projected coords — the 3^k cell equi-join enumerates a
       SUPERSET of the true pair set, never all pairs.  The projected
       coordinates stay DOUBLE precision end-to-end (r11 ADVICE: the
       default float32 output of :func:`pca_project` rounds
       coordinates by up to ~|coord|*6e-8, which at thresholds >=
       ~0.94 exceeds a relative-only pad and could round a true
       boundary pair OUT of the candidate set); the radius is padded
       by 1e-6 relative + 1e-9 absolute, four orders above the ~1e-13
       worst-case double-precision projection rounding, so the
       lossless-superset guarantee holds at every threshold;
    4. exact full-width double-precision cosine verifies each
       candidate — two hash joins fetch the unit vectors back onto the
       candidate pairs, so the verify stage shuffles CANDIDATES (plus
       the vector fetch), never all pairs;
    5. :func:`graph.star_components` over the verified pairs (the
       size-gated driver kernel takes over for small dup graphs).

    Zero-norm vectors have no cosine to anything: they are excluded
    from candidates and never appear in the drop list.  ``threshold``
    must be < 1 (eps would be 0).  Cost is data-dependent in the right
    way: the projected-space candidate density is governed by spectrum
    decay (the SemDeDup regime — embeddings concentrate in few
    directions), ``k`` trades the 3^k explode against candidate
    density, and ``max_cell`` passes through as the same
    correctness-trading skew guard the grid join documents.  Work
    beyond the one k-dim equi-join is proportional to CANDIDATES, not
    pairs — at 100 TB the all-pairs matrix never exists anywhere."""
    from .graph import star_components
    from .spatial import grid_distance_join_nd

    if not threshold < 1:
        raise ValueError("semdedup_exact needs threshold < 1 (at 1.0 "
                         "the radius collapses to 0; use exact dedup)")
    eps = float(np.sqrt(max(0.0, 2.0 - 2.0 * threshold)))
    nrm = F.sqrt(F.aggregate(
        F.col(vec_col), F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double")))
    unit = (emb.select(F.col(id_col).alias("__id"),
                       F.col(vec_col).alias("__v"), nrm.alias("__n"))
            .where(F.col("__n") > 0)
            .select("__id", F.transform(
                "__v",
                lambda x: x.cast("double") / F.col("__n")).alias("__u")))
    stage_digest("semdedup_exact.unit", unit)  # pre-checkpoint plan
    unit = unit.localCheckpoint(eager=False)
    # r16 (guide §3.2 — reduce the join's big side before moving it):
    # fit MORE components than the grid needs.  The top-k eigenvectors
    # of the k'-dim fit are BIT-IDENTICAL to a k-dim fit's (same
    # moments, same eigh, same sign rule), so the grid's cells and
    # candidate set are unchanged; the extra coordinates give a TIGHTER
    # exact lower bound on the true distance (projection onto an
    # orthonormal basis is non-expansive at ANY width, the same
    # argument as step 2), so grid candidates are pruned by the k'-dim
    # projected distance BEFORE the full-width vector fetch and cosine
    # fold.  k'=16 measured at sf0.1: 1 368 592 grid candidates ->
    # 2 115 surviving the 12-dim bound -> 2 000 at 16 dims (= the true
    # pair count); the 64-dim fold now runs on ~2k pairs, not 1.4M.
    kp = max(k, 16)
    mean, comps = pca_fit(unit, kp, col="__u")
    kp = comps.shape[0]
    if comps.shape[0] < k:
        # silent truncation would leave F.col("__p")[i] NULL for the
        # missing coordinates; NULL cell keys never equi-join, so the
        # operator would return an EMPTY drop list instead of failing
        # loudly on the misconfiguration (r11 ADVICE)
        raise ValueError(
            f"semdedup_exact: k={k} exceeds the {comps.shape[0]} "
            "principal components the embedding dimensionality "
            "supports — lower k to at most the embedding dim")
    proj = pca_project(unit, mean, comps, col="__u", out="__p",
                       out_dtype="double")
    pts = proj.select(
        "__id", "__u",
        *[F.col("__p")[i].alias(f"__q{i}") for i in range(k)])
    r_pad = eps * (1.0 + 1e-6) + 1e-9
    cand = grid_distance_join_nd(
        pts.select("__id", *[f"__q{i}" for i in range(k)]),
        r_pad, id_col="__id",
        coord_cols=tuple(f"__q{i}" for i in range(k)),
        max_cell=max_cell)
    if kp > k:
        # candidate prune on the tail coordinates (k..kp-1): keep a
        # pair only if dist(grid)^2 + tail-coordinate distance^2 fits
        # the SAME padded radius — the k'-dim projected distance is a
        # lower bound on the true unit-sphere distance (non-expansive
        # projection), so no qualifying pair can be dropped, and the
        # ~1e-13 double-rounding of the extra terms sits four orders
        # under the radius pad, exactly the step-3 argument.  The
        # prune joins move (id, 13 doubles) per side instead of the
        # full-width unit vectors; the fold is over the 13-element
        # tail, not 64 dims, and runs once per GRID candidate while
        # the cosine below runs once per SURVIVOR.
        tail = proj.select(
            "__id", F.slice("__p", k + 1, kp - k).alias("__pt"))
        t1 = tail.select(F.col("__id").alias("id1"),
                         F.col("__pt").alias("__pt1"))
        t2 = tail.select(F.col("__id").alias("id2"),
                         F.col("__pt").alias("__pt2"))
        tail_d2 = F.aggregate(
            F.zip_with("__pt1", "__pt2", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda a, x: a + x)
        cand = (cand.join(t1, "id1").join(t2, "id2")
                .where(F.col("dist") * F.col("dist") + tail_d2
                       <= F.lit(r_pad * r_pad))
                .select("id1", "id2", "dist"))
    u1 = pts.select(F.col("__id").alias("id1"), F.col("__u").alias("__u1"))
    u2 = pts.select(F.col("__id").alias("id2"), F.col("__u").alias("__u2"))
    cos = F.aggregate(F.zip_with("__u1", "__u2", lambda a, b: a * b),
                      F.lit(0.0), lambda a, x: a + x)
    verified = (cand.join(u1, "id1").join(u2, "id2")
                .where(cos >= F.lit(float(threshold)))
                .select("id1", "id2"))
    # stage digests (r12 verdict #1): the grid equi-join and the
    # verify joins live UPSTREAM of star_components' checkpoints, so
    # the end-to-end digest never sees them — record them here, where
    # an interior rewrite of the candidate generator would show
    stage_digest("semdedup_exact.grid_candidates", cand)
    stage_digest("semdedup_exact.verified", verified)
    # r16: star_components now materializes its input pair list once
    # (its ``base`` checkpoint), so the candidate+verify pipeline above
    # executes exactly once — the previous shape re-executed it for
    # the node and edge frames separately (two ~37 exec-s copies of
    # the same verify stage in the r16 profile).
    comp = star_components(verified, "id1", "id2")
    return (comp.where(F.col("node") != F.col("cluster"))
            .select(F.col("node").alias(id_col),
                    F.col("cluster").alias("dup_of")))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_bucket(emb: DataFrame, n_planes: int = 8, dim: int = 64,
               seed: int = 42, vec_col: str = "embedding") -> DataFrame:
    """Add a sign-LSH ``bucket`` column: bit j = sign(v · h_j) for fixed
    random hyperplanes. Write-time: ``partitionBy('bucket')`` or bucketed
    tables co-locate each bucket for probe-time pruning."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for j, h in enumerate(planes):
        bucket = bucket + F.when(_dot_with_lit(vec_col, h) >= 0,
                                 F.lit(1 << j)).otherwise(F.lit(0))
    return emb.withColumn("bucket", bucket)


def lsh_topk(emb: DataFrame, query, k: int, n_planes: int = 8,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding",
             multiprobe_bits: int = 1) -> DataFrame:
    """Approximate top-k: restrict the exact scan to the query's LSH bucket
    plus all buckets within ``multiprobe_bits`` bit flips (multi-probe
    recovers neighbors lost across a hyperplane)."""
    q = np.asarray(query, dtype=np.float64)
    planes = _hyperplanes(len(q), n_planes, seed)
    qb = sum((1 << j) for j, h in enumerate(planes) if float(q @ h) >= 0)
    probes = {qb}
    if multiprobe_bits >= 1:
        probes |= {qb ^ (1 << j) for j in range(n_planes)}
    if multiprobe_bits >= 2:
        probes |= {qb ^ (1 << i) ^ (1 << j)
                   for i in range(n_planes) for j in range(i + 1, n_planes)}
    bucketed = lsh_bucket(emb, n_planes, len(q), seed, vec_col)
    cand = bucketed.where(F.col("bucket").isin(*[int(b) for b in probes]))
    return cosine_topk(cand, q, k, id_col, vec_col)


def knn_graph(emb: DataFrame, k: int = 5, n_tables: int = 4,
              n_planes: int = 6, dim: int = 64, seed: int = 42,
              id_col: str = "vec_id", vec_col: str = "embedding",
              max_bucket: int | None = None) -> DataFrame:
    """Approximate k-NN graph ``(src, dst, cos_sim)`` — top-``k``
    cosine neighbors per vector, the backbone structure of clustering /
    SemDeDup / label propagation over embeddings.

    Candidates come from ``n_tables`` INDEPENDENT sign-LSH tables
    (different hyperplane seeds): a true neighbor pair is missed only if
    it splits in EVERY table, so recall compounds as
    ``1 - (1 - p)^n_tables`` per pair — never an all-pairs scan.  Each
    table contributes its within-bucket pairs via an equi-join on the
    bucket id; pairs dedupe across tables on ids; the exact cosine runs
    JVM-side on the pair rows; symmetrize then one window per node keeps
    the top-k.  Cost is candidate-bound (≈ Σ bucket²) like
    ``cosine_pairs``; ``max_bucket`` applies the standard hot-bucket
    guard per table (the ``simhash_pairs`` recall/bound trade).  The
    cos values reported are EXACT for the pairs reported — only recall
    is approximate."""
    from pyspark.sql import Window

    cand = None
    for t in range(n_tables):
        bt = lsh_bucket(emb, n_planes, dim, seed + 7919 * t, vec_col) \
            .select(F.col(id_col).alias("id"),
                    F.col(vec_col).alias("vec"), "bucket")
        if max_bucket is not None:
            big = (bt.groupBy("bucket").agg(F.count("*").alias("bn"))
                     .where(F.col("bn") > max_bucket).select("bucket"))
            bt = bt.join(F.broadcast(big), "bucket", "left_anti")
        a, b = bt.alias("a"), bt.alias("b")
        p = (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"),
                     F.col("a.vec").alias("va"),
                     F.col("b.vec").alias("vb")))
        cand = p if cand is None else cand.unionByName(p)
    pairs = cand.groupBy("id_a", "id_b").agg(
        F.first("va").alias("va"), F.first("vb").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb",
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    cos = (dot / (_norm("va") * _norm("vb"))).alias("cos_sim")
    scored = pairs.select("id_a", "id_b", cos)
    sym = scored.select(F.col("id_a").alias("src"),
                        F.col("id_b").alias("dst"), "cos_sim") \
        .unionByName(scored.select(F.col("id_b").alias("src"),
                                   F.col("id_a").alias("dst"),
                                   "cos_sim"))
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), F.asc("dst"))
    return (sym.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k).drop("rn"))


def ivf_assign(emb: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its max-dot-product coarse centroid (IVF list).
    Centroids are a driver-side array-of-arrays literal (n_centroids × dim,
    small) — no shuffle, evaluated inside the scan. One ``transform`` over
    the centroid array keeps the expression tree linear in n_centroids (a
    chained ``when(d > best, ...)`` fold would re-embed the running-best
    subtree twice per step — exponential plan size). Ties break to the
    lowest cell id (``array_position`` returns the first max)."""
    cents = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                      for c in centroids])
    dots = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(c, F.col(vec_col), lambda x, y: x * y.cast("double")),
            F.lit(0.0), lambda a, v: a + v))
    cell = (F.array_position(dots, F.array_max(dots)) - 1).cast("int")
    return emb.withColumn("ivf_cell", cell)


def sample_centroids(emb: DataFrame, n_centroids: int,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> np.ndarray:
    """Deterministic coarse centroids: the ``n_centroids`` lowest-id vectors
    (a k-means refinement would slot in here; sampling keeps it exact and
    reproducible for tests)."""
    rows = (emb.orderBy(id_col).limit(n_centroids)
               .select(vec_col).collect())
    return np.array([r[0] for r in rows], dtype=np.float64)


def cosine_topk_batch(emb: DataFrame, queries, k: int,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      round_to: int | None = None) -> DataFrame:
    """Exact cosine top-k for a BATCH of query vectors in one scan —
    the production shape of similarity search (per-query scans would read
    the table once per query).

    ``queries`` is a small driver-side mapping ``{query_id: vector}`` (or
    list of (id, vector)); it ships to executors inside the task closure
    like a broadcast. Each Arrow batch computes all scores as one
    ``(batch × dim) @ (dim × n_q)`` BLAS product and keeps only its LOCAL
    top-k per query, so the shuffle carries ≤ partitions × n_q × k rows —
    the distributed TakeOrdered shape — and a final per-query window picks
    the global top-k. Ties break on the lower id, matching
    ``cosine_topk``.
    """
    import pandas as pd

    items = queries.items() if isinstance(queries, dict) else queries
    qids, qvecs = zip(*items)
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in qvecs])
    Qn = (Q / np.linalg.norm(Q, axis=1, keepdims=True)).T  # dim × n_q
    qid_arr = np.asarray(qids)

    def score(batches):
        for b in batches:
            if not len(b):
                continue
            M = np.stack([np.asarray(v, dtype=np.float64)
                          for v in b[vec_col]])
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            C = M @ Qn                                   # batch × n_q
            ids = b[id_col].to_numpy()
            n_local = min(k, len(ids))
            # per-query local top-k with (score desc, id asc) tie-break
            order = np.lexsort((np.broadcast_to(ids[:, None], C.shape),
                                -C), axis=0)[:n_local]
            rows = order.ravel(order="F")
            qcol = np.repeat(qid_arr, n_local)
            yield pd.DataFrame({
                "query_id": qcol, id_col: ids[rows],
                "cos_sim": C[rows, np.repeat(np.arange(len(qid_arr)),
                                             n_local)]})

    qid_type = "string" if isinstance(qid_arr[0], str) else "bigint"
    id_type = dict(emb.dtypes)[id_col]
    local = emb.select(id_col, vec_col).mapInPandas(
        score, f"query_id {qid_type}, {id_col} {id_type}, cos_sim double")
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), id_col)
    out = (local.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= k).drop("rn"))
    if round_to is not None:
        out = out.withColumn("cos_sim", F.round("cos_sim", round_to))
    return out


def train_centroids(emb: DataFrame, n_centroids: int, max_iter: int = 5,
                    seed: int = 42,
                    vec_col: str = "embedding") -> np.ndarray:
    """Train the IVF coarse quantizer with Spark MLlib k-means —
    distributed Lloyd iterations with k-means|| init, the real scale path
    that ``sample_centroids`` stubs for tests. Each iteration is one map
    (assign to nearest center, all centers broadcast) + one tiny aggregate
    per center; no per-iteration growth in plan or state. Returns the
    ``n_centroids × dim`` array to feed ``ivf_assign``/``ivf_topk``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(array_to_vector(
        F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_centroids, maxIter=max_iter, seed=seed,
                   initMode="k-means||").fit(feats)
    return np.array(model.clusterCenters(), dtype=np.float64)


def ivf_topk(emb: DataFrame, query, k: int, centroids: np.ndarray,
             n_probe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF probe: rank cells by centroid·query on the driver, scan only the
    ``n_probe`` best cells, exact cosine inside."""
    q = np.asarray(query, dtype=np.float64)
    order = np.argsort(-(centroids @ q))[:n_probe]
    assigned = ivf_assign(emb, centroids, vec_col)
    cand = assigned.where(F.col("ivf_cell").isin(*[int(c) for c in order]))
    return cosine_topk(cand, q, k, id_col, vec_col)


def quantize_embeddings(emb: DataFrame, vec_col: str = "embedding",
                        ) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q = round(x / scale)`` — 4× smaller embedding storage (the difference
    between 25 TB and 100 TB of float32 vectors) at ~0.4% max error, with
    cosine ranking nearly unchanged. Adds ``q_scale`` FLOAT and ``qvec``
    ARRAY<TINYINT>; drop the float column at write time. Pure column
    expressions — quantization happens inside the scan, no shuffle."""
    from ..functions import _let

    # let-bind v and scale: an unbound ``scale`` reference inside the
    # per-element round() lambda re-runs the array_max reduction once per
    # ELEMENT (O(dim²) per row — see functions._let)
    def body(v):
        scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
        return _let(scale, lambda s: F.struct(
            s.cast("float").alias("q_scale"),
            F.when(s > 0,
                   F.transform(v, lambda x: F.round(x / s).cast("tinyint")))
             .otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
             .alias("qvec")))

    packed = _let(F.transform(F.col(vec_col), lambda x: x.cast("double")),
                  body)
    return emb.withColumn("__q", packed) \
              .withColumn("q_scale", F.col("__q.q_scale")) \
              .withColumn("qvec", F.col("__q.qvec")) \
              .drop("__q")


def dequantize_embeddings(df: DataFrame, out_col: str = "embedding_deq",
                          ) -> DataFrame:
    """Reconstruct float vectors from (q_scale, qvec)."""
    return df.withColumn(
        out_col,
        F.transform("qvec",
                    lambda x: (x.cast("double")
                               * F.col("q_scale").cast("double"))
                    .cast("float")))


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the IVF-PQ companion: 32× vector compression
# with asymmetric-distance search
# ---------------------------------------------------------------------------

def _vector_dim(df: DataFrame, vec_col: str) -> int:
    """Vector width of an ``array<float>`` column: from column metadata
    (``{"dim": N}``, set by the embedding sources / ``VectorUDT`` ml_attr)
    when available — no Spark action — else a documented one-row probe
    (the only caller-visible action in this module; pass ``dim=``
    explicitly to avoid it)."""
    md = df.schema[vec_col].metadata or {}
    for key in ("dim", "num_attrs"):
        if key in md:
            return int(md[key])
    if "ml_attr" in md and "num_attrs" in md["ml_attr"]:
        return int(md["ml_attr"]["num_attrs"])
    return len(df.select(vec_col).first()[0])

def pq_train(emb: DataFrame, m: int = 8, k: int = 256, max_iter: int = 5,
             seed: int = 42, vec_col: str = "embedding",
             dim: int | None = None) -> np.ndarray:
    """Train PQ codebooks: split the ``dim`` dimensions into ``m``
    contiguous subspaces and k-means each subspace independently with
    MLlib (distributed Lloyd, k-means|| init — ``m`` small driver-side
    jobs over the same scan). Returns codebooks ``(m, k, dim/m)``.

    ``dim`` defaults from the schema when ``vec_col`` has a known width
    (metadata set by the embedding sources); pass it explicitly otherwise
    so no Spark action runs before the first KMeans fit.

    At 100 TB the codebooks are tiny driver-side constants (m·k·dsub
    floats); training cost is m scans — in practice run on a
    ``deterministic_sample`` of the corpus, exactly like IVF centroid
    training."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if dim is None:
        dim = _vector_dim(emb, vec_col)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for j in range(m):
        sub = emb.select(array_to_vector(
            F.slice(F.col(vec_col).cast("array<double>"),
                    j * dsub + 1, dsub)).alias("features"))
        model = KMeans(k=k, maxIter=max_iter, seed=seed + j,
                       initMode="k-means||").fit(sub)
        books.append(np.array(model.clusterCenters(), dtype=np.float64))
    return np.stack(books)  # (m, k, dsub)


def pq_encode(emb: DataFrame, codebooks: np.ndarray,
              vec_col: str = "embedding",
              code_col: str = "pq_code") -> DataFrame:
    """Encode each vector to ``m`` small centroid ids (ARRAY<SMALLINT> —
    8-32× smaller than the float32 vector; drop ``vec_col`` at write
    time). Arrow-batched pandas UDF: per batch, one BLAS distance matrix
    per subspace (argmin over k centroids), no Python-per-row work. The
    codebooks ride to executors once per task via closure capture
    (driver-side constant, no join)."""
    m, k, dsub = codebooks.shape
    books = codebooks  # capture
    sqn = (books ** 2).sum(axis=2)  # (m, k) centroid squared norms

    @F.pandas_udf("array<smallint>")
    def encode(col: pd.Series) -> pd.Series:
        x = np.asarray(list(col), dtype=np.float64)  # (n, dim)
        n = x.shape[0]
        codes = np.empty((n, m), dtype=np.int16)
        for j in range(m):
            xs = x[:, j * dsub:(j + 1) * dsub]            # (n, dsub)
            # ||x - c||² = ||c||² - 2 x·c (+ ||x||², constant per row)
            d = sqn[j][None, :] - 2.0 * (xs @ books[j].T)  # (n, k)
            codes[:, j] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return emb.withColumn(code_col, encode(F.col(vec_col)))


def pq_topk(encoded: DataFrame, codebooks: np.ndarray, query, kk: int,
            id_col: str = "vec_id", code_col: str = "pq_code") -> DataFrame:
    """Approximate top-k by asymmetric distance (ADC): build the (m, k)
    lookup table of squared L2 from each query subvector to every
    centroid on the driver, then score each row as ``sum_j LUT[j,
    code[j]]`` — a vectorized gather over the code column, no float
    vectors touched. Output: (id, adc_dist) ascending, deterministic
    tie-break on id.

    Scale shape: the scan reads ONLY the code column (32× less IO than
    the float vectors), the LUT is a broadcast-sized constant, and the
    top-k compiles to TakeOrderedAndProject. The standard refinement —
    exact re-rank of the ADC top-R with the float vectors — is
    ``cosine_topk`` over a ``vec_id`` IN-filter."""
    m, k, dsub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    lut = np.empty((m, k), dtype=np.float64)
    for j in range(m):
        qs = q[j * dsub:(j + 1) * dsub]
        lut[j] = ((codebooks[j] - qs[None, :]) ** 2).sum(axis=1)

    @F.pandas_udf("double")
    def adc(col: pd.Series) -> pd.Series:
        codes = np.asarray(list(col), dtype=np.int64)   # (n, m)
        return pd.Series(lut[np.arange(m)[None, :], codes].sum(axis=1))

    return (encoded.select(id_col, adc(F.col(code_col)).alias("adc_dist"))
                   .orderBy(F.asc("adc_dist"), id_col)
                   .limit(kk))


def ivfpq_topk(encoded: DataFrame, centroids: np.ndarray,
               codebooks: np.ndarray, query, kk: int, n_probe: int = 2,
               id_col: str = "vec_id", code_col: str = "pq_code",
               cell_col: str = "ivf_cell") -> DataFrame:
    """IVF-PQ search — the standard billion-vector layout: the table is
    stored with (``ivf_cell``, ``pq_code``) from ``ivf_assign`` +
    ``pq_encode`` (float vectors dropped or kept cold). A probe ranks
    cells by centroid·query on the driver, the scan prunes to the
    ``n_probe`` best cells (a storage-partition-prunable equality), and
    ADC scores only the surviving codes. IO per query ≈
    |probed cells| × (2 + m) bytes/vector — ~30× below a float scan even
    before cell pruning."""
    q = np.asarray(query, dtype=np.float64)
    order = np.argsort(-(centroids @ q))[:n_probe]
    cand = encoded.where(F.col(cell_col).isin(*[int(c) for c in order]))
    return pq_topk(cand, codebooks, q, kk, id_col=id_col,
                   code_col=code_col)


def pca_moments(emb: DataFrame, col: str = "embedding"):
    """The d + d² sufficient statistics of :func:`pca_fit` as plain
    numpy ``(n, sum_x, gram)`` — MERGEABLE: moments of a union are the
    element-wise sums (:func:`merge_moments`), so a warehouse can keep
    per-partition moment rows and refresh its PCA in O(delta) after an
    ingest batch, never re-reading history (the ``merge_fingerprint``
    maintenance pattern applied to a model fit)."""
    import pandas as pd  # noqa: F811  (worker-side import)

    def partials(batches):
        for b in batches:
            if not len(b):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in b[col]])
            yield pd.DataFrame({
                "n": [len(X)],
                "s": [X.sum(axis=0).tolist()],
                "g": [(X.T @ X).ravel().tolist()]})

    rows = (emb.select(col)
            .mapInPandas(partials,
                         "n long, s array<double>, g array<double>")
            .collect())
    if not rows:
        raise ValueError("pca_moments: empty input")
    n = sum(r.n for r in rows)
    s = np.sum([np.array(r.s) for r in rows], axis=0)
    g = np.sum([np.array(r.g) for r in rows], axis=0)
    d = len(s)
    return n, s, g.reshape(d, d)


def merge_moments(a, b):
    """Combine two :func:`pca_moments` results as if their inputs had
    been scanned together — exact, associative, commutative."""
    return a[0] + b[0], a[1] + b[1], a[2] + b[2]


def pca_from_moments(n, s, gram, k: int):
    """Driver-side eigendecomposition of moment statistics → the same
    ``(mean, components)`` contract as :func:`pca_fit`."""
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    comp = vecs[:, ::-1][:, :k].T             # (k, d), top-k first
    for i in range(comp.shape[0]):
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    return mean, comp


def pca_fit(emb: DataFrame, k: int, col: str = "embedding"):
    """Exact PCA of an embedding column in ONE distributed pass: each
    Arrow batch reduces to a single partial-moment row (n, Σx, ΣxxT
    flattened — the d + d² sufficient statistics), the bounded set of
    partials (one per batch, ≤ a few hundred rows at any data size)
    collects to the driver, and the d×d covariance eigendecomposition
    runs there in microseconds (d ≤ a few hundred).  This is the
    treeAggregate shape expressed as mapInPandas → driver combine: the
    data-proportional work is embarrassingly parallel, the driver holds
    O(d²), never O(rows).

    Returns ``(mean, components)``: mean shape (d,), components shape
    (k, d) — orthonormal top-k eigenvectors of the covariance, each
    sign-fixed so its largest-|.| coordinate is positive (deterministic
    across runs/partitionings up to eigenvalue ties).
    """
    return pca_from_moments(*pca_moments(emb, col), k)


def pca_project(emb: DataFrame, mean: np.ndarray, components: np.ndarray,
                col: str = "embedding",
                out: str = "pca", out_dtype: str = "float") -> DataFrame:
    """Project each embedding onto the fitted components, JVM-side: the
    k×d component matrix and the mean become array literals, and each
    output coordinate is one ``zip_with``/``aggregate`` dot product —
    whole-stage-codegen row-local compute, no Python, no shuffle.  The
    standard dimensionality-reduction step before LSH/IVF indexing
    (``k``-dim vectors make every downstream ANN structure k/d cheaper
    at identical recall targets when the spectrum decays).

    ``out_dtype`` is the stored element type: ``float`` (default)
    halves the footprint of ANN index columns, where recall targets
    absorb the ~6e-8 relative rounding; exactness-critical callers
    (:func:`semdedup_exact`'s lossless-superset argument) pass
    ``double`` — the internal dot products are double either way."""
    mean = np.asarray(mean, dtype=np.float64)
    comps = np.asarray(components, dtype=np.float64)
    centered = F.zip_with(
        F.col(col), F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x.cast("double") - m)
    proj = F.array(*[
        F.aggregate(
            F.zip_with(centered,
                       F.array(*[F.lit(float(w)) for w in comps[i]]),
                       lambda x, w: x * w),
            F.lit(0.0), lambda a, v: a + v).cast(out_dtype)
        for i in range(comps.shape[0])])
    return emb.withColumn(out, proj)
