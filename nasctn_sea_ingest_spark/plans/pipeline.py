"""End-to-end LLM training-data pipeline: the composition a 100 TB corpus
job actually runs, built entirely from this engine's operators.

    raw documents
      → quality gate        (text.quality_score, filter before any shuffle)
      → repetition gate     (text.repetition_stats, Gopher A1 — same scan,
                             zero extra shuffle)
      → exact dedup         (dedup.drop_exact_duplicates)
      → near-dup candidates (dedup.minhash_dedup_candidates, LSH banding)
      → cluster + keep one  (dedup.dup_clusters → drop_near_duplicates)
      → chunk dedup         (text.chunk_dedup: cross-doc boilerplate
                             chunks removed, docs rewritten)
      → PII scrub           (text.scrub_pii, map-only)
      → train/val/test      (sampling.hash_split, leakage-proof)
      → decontaminate       (text.contamination: drop train docs sharing
                             n-grams with val/test — split-leakage guard)
      → sequence packing    (packing.assign_packs per split×lang stream)

Stage order is the cost order: the cheap map-only gates run first so every
shuffle downstream (minhash aggregate, band join, clustering) sees only
surviving rows. Returns the packed corpus and a per-stage row-count
manifest (the run log an operator actually monitors).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import dedup, sampling, text
from ..operators.packing import assign_packs
from .tables import load_table

__all__ = ["llm_corpus_pipeline", "media_pipeline"]


def llm_corpus_pipeline(spark: SparkSession, sf_dir: str,
                        seq_len: int = 2048,
                        min_quality: float = 0.5,
                        splits: "dict[str, float] | None" = None,
                        decontaminate: bool = True,
                        counts: bool = True,
                        repetition_gate: bool = True,
                        drop_boilerplate: bool = True,
                        cdc_boilerplate: bool = False,
                        exact_substr_window: "int | None" = None,
                        line_boilerplate: "float | None" = None,
                        strip_html: bool = False,
                        lm_gate_perplexity: "float | None" = None,
                        dsir_select: "tuple[DataFrame, int] | None" = None,
                        semdedup_threshold: "float | None" = None,
                        semdedup_k: int = 2,
                        ) -> "tuple[DataFrame, dict[str, int]]":
    """Run the full pipeline on the ``documents`` table; returns
    ``(packed_df, manifest)`` where manifest counts rows surviving each
    stage. The packed frame carries (doc_id, lang, split, n_tok, pack_id,
    pack_offset, text).

    ``counts=True`` (default) persists each fan-out boundary, materializes
    the manifest eagerly, and unpersists every intermediate before
    returning — no stage is ever scanned twice, and the only cache that
    outlives the call is the already-materialized returned frame (callers
    ``unpersist()`` it when done).
    ``counts=False`` skips the persists and every manifest action (empty
    manifest) for caller-managed materialization; the only jobs that still
    run at build time are the near-dup clustering's per-round convergence
    checks, inherent to the iterative algorithm.
    """
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    manifest: dict[str, int] = {}
    pinned: list[DataFrame] = []

    def _pin(df: DataFrame) -> DataFrame:
        if counts:
            df = df.persist()
            pinned.append(df)
        return df

    d = load_table(spark, sf_dir, "documents")
    # the map-heavy gates (quality/repetition column math) parallelize by
    # INPUT SPLIT; a small local corpus arrives as one parquet split and
    # would run the whole scan in a single task. Spread it once, keyed on
    # doc_id so the layout stays deterministic. At warehouse scale the
    # input has >= cores splits and this exchange never fires.
    par = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < par:
        d = d.repartition(par, "doc_id")
    if strip_html:
        # optional (OFF by default): regex-tier markup removal BEFORE
        # any gate — raw web crawl input; map-only, so it rides the
        # same scan as the quality flags
        d = text.strip_markup(d)
    # both gates in ONE Arrow map-only pass (value-identical to the
    # quality_score/repetition_stats expression forms, ~5× faster than
    # their interpreted higher-order lambdas — see gate_flags_fast)
    scored = text.gate_flags_fast(d.select("doc_id", "lang", "text"))
    keep = F.col("quality") >= min_quality
    if repetition_gate:
        keep_rep = keep & ~F.col("repetitive")
    if counts:
        # The gate flags are interpreted-eval array math (HOF lambdas
        # never codegen — ~0.5 ms/doc), so they must run exactly ONCE:
        # pin the flagged frame, then both the manifest aggregate and the
        # surviving-row selection read the cache instead of re-running
        # the expressions per action.
        flag_cols = ["doc_id", "lang", "text", keep.alias("__keep")]
        if repetition_gate:
            flag_cols.append(keep_rep.alias("__keep_rep"))
        scored = _pin(scored.select(*flag_cols))
        aggs = [F.count("*").alias("raw"),
                F.count(F.when(F.col("__keep"), 1)).alias("gated")]
        if repetition_gate:
            aggs.append(F.count(F.when(F.col("__keep_rep"), 1)).alias("rep"))
        row = scored.agg(*aggs).first()
        manifest["raw"], manifest["quality_gated"] = row["raw"], row["gated"]
        if repetition_gate:
            manifest["repetition_gated"] = row["rep"]
        gated = (scored.where(F.col("__keep_rep" if repetition_gate
                                    else "__keep"))
                 .select("doc_id", "lang", "text"))
    else:
        gated = (scored.where(keep_rep if repetition_gate else keep)
                 .select("doc_id", "lang", "text"))

    # persist at the fan-out boundaries: `exact` feeds both the minhash
    # candidate job and the survivor anti-join; `near` feeds every
    # downstream stage; the split frame feeds the contamination probe and
    # the anti-join. At cluster scale these are the natural checkpoint/
    # table-materialization points of the pipeline.
    exact = _pin(dedup.drop_exact_duplicates(gated))
    if counts:
        manifest["exact_deduped"] = exact.count()

    cand = dedup.minhash_dedup_candidates(exact)
    near = _pin(dedup.drop_near_duplicates(exact, cand))
    if counts:
        manifest["near_deduped"] = near.count()

    if line_boilerplate is not None:
        # optional (OFF by default — benched path byte-identical):
        # corpus-frequency LINE removal before the chunk pass — banners
        # and footers vanish surgically, keeping the documents; docs
        # that were pure boilerplate drop (NULL text, the chunk_dedup
        # convention).  Threshold = max doc fraction a line may appear
        # in before it counts as boilerplate.
        cleaned = text.strip_boilerplate(
            near, max_doc_frac=line_boilerplate)
        near = _pin(cleaned.where(F.col("text").isNotNull()))
        if counts:
            manifest["line_boilerplate"] = near.count()

    if drop_boilerplate:
        # doc-level dedup leaves cross-document boilerplate (shared
        # headers, templates) intact; the chunk pass deletes the repeated
        # chunks themselves and rewrites the documents (Lee et al. 2022).
        # Docs whose every chunk was boilerplate disappear with the
        # inner join (text_clean NULL).  ``cdc_boilerplate`` swaps in the
        # content-defined chunker (insertion-robust re-crawl dedup);
        # default stays the benched fixed-chunk path.
        chunker = text.cdc_chunk_dedup if cdc_boilerplate \
            else text.chunk_dedup
        ch = chunker(near)
        near = (near.drop("text")
                    .join(ch.where(F.col("text_clean").isNotNull())
                            .select("doc_id",
                                    F.col("text_clean").alias("text")),
                          "doc_id"))
        if counts:
            near = _pin(near)
            manifest["chunk_deduped"] = near.count()

    if exact_substr_window is not None:
        # optional (OFF by default): STRIDE-1 exact duplicate-span
        # removal (Lee et al. 2022 ExactSubstr proper) — the chunk
        # pass above is chunk-ALIGNED, so a verbatim span straddling
        # chunk boundaries survives it; this stage flags every
        # W-word window occurring twice anywhere in the surviving
        # corpus and removes ALL occurrences (the paper's all-copies
        # rule).  Docs reduced to nothing drop (NULL-text convention).
        sp = text.duplicate_spans(near, window=exact_substr_window)
        near = (text.apply_span_removal(near, sp)
                .where(F.col("text").isNotNull()))
        if counts:
            near = _pin(near)
            manifest["span_deduped"] = near.count()

    if semdedup_threshold is not None:
        # optional (OFF by default): SEMANTIC near-dup removal over the
        # aligned embeddings table — the exact composition (normalize
        # -> pca_project -> k-dim grid join -> full-width cosine verify
        # -> components), keep-min-id per semantic group.  Textual
        # dedup above cannot see paraphrases; this stage can.  Docs
        # without an embedding row pass through untouched (left-anti
        # only removes matched drop-list ids).
        from ..operators.similarity import semdedup_exact
        emb = load_table(spark, sf_dir, "embeddings")
        # restrict to SURVIVING docs before grouping (r11 ADVICE): the
        # drop decision must re-form groups and re-pick the min-id
        # representative among survivors — computed over the full table,
        # a group whose representative was already removed by the
        # quality gate / textual dedup would lose EVERY remaining copy,
        # contrary to SemDeDup's keep-one semantics.
        emb = emb.join(near.select(F.col("doc_id").alias("vec_id")),
                       "vec_id", "left_semi")
        drops = semdedup_exact(emb, threshold=semdedup_threshold,
                               k=semdedup_k)
        near = near.join(drops.select(F.col("vec_id").alias("doc_id")),
                         "doc_id", "left_anti")
        if counts:
            near = _pin(near)
            manifest["semdeduped"] = near.count()

    if lm_gate_perplexity is not None:
        # second-stage fluency gate (CCNet shape): train the bigram LM on
        # the deduped corpus itself and drop the high-perplexity tail
        # (garbled/boilerplate text that survives the cheap heuristics)
        uni, bi, tot, voc = text.train_bigram_lm(near)
        ppl = text.lm_perplexity(near, uni, bi, tot, voc)
        near = near.join(
            ppl.where(F.col("perplexity") <= lm_gate_perplexity)
               .select("doc_id"), "doc_id")
        if counts:
            near = _pin(near)
            manifest["lm_gated"] = near.count()

    if dsir_select is not None:
        # importance selection toward a target domain (DSIR): weight by
        # the hashed-n-gram log-ratio vs the target, Gumbel-top-n sample
        target_df, top_n = dsir_select
        ratio, default = sampling.dsir_log_ratio(target_df, near)
        w = sampling.dsir_weights(near, ratio, default)
        picked = sampling.dsir_resample(w, top_n).select("doc_id")
        near = near.join(F.broadcast(picked), "doc_id")
        if counts:
            near = _pin(near)
            manifest["dsir_selected"] = near.count()

    scrubbed = text.scrub_pii(near)
    split = sampling.hash_split(scrubbed, splits, "doc_id")

    if decontaminate:
        # split-leakage guard: a train doc sharing an n-gram with val/test
        # still leaks the benchmark even after doc-level dedup — flag via
        # the broadcastable distinct-shingle join and drop from train
        split = _pin(split)
        heldout = split.where(F.col("split") != "train")
        dirty = text.contamination(split.where(F.col("split") == "train"),
                                   heldout).select("doc_id")
        split = split.join(F.broadcast(dirty), "doc_id", "left_anti")
        if counts:
            manifest["decontaminated"] = split.count()

    with_tok = split.withColumn(
        "n_tok", F.size(F.split(F.trim(F.col("text")), r"\s+")))
    packed = assign_packs(with_tok, "n_tok", seq_len,
                          by=["split", "lang"], order=["doc_id"])
    if counts:
        packed = packed.persist()
        manifest["packed"] = packed.count()
        # packed is materialized, so every upstream cache can be released
        # (blocking=True: the blocks are gone when we return, not "soon" —
        # leaked blocks otherwise degrade long sessions)
        for df in pinned:
            df.unpersist(True)
    return packed, manifest


def media_pipeline(spark: SparkSession, n_items: int = 300,
                   dup_fraction: float = 0.1,
                   max_hamming: int = 3,
                   audio_min_shared: int = 8,
                   video_min_shared: int = 5,
                   feature_dim: int = 16,
                   max_bucket: int | None = 1000,
                   cross_modal_stills: bool = False,
                   ) -> "tuple[DataFrame, dict[str, int]]":
    """End-to-end MULTIMODAL training-data pipeline — the media analog of
    :func:`llm_corpus_pipeline`, composed from this engine's operators:

        media rows (binary + typed metadata)
          → near-dup dedup for ALL modalities (image dHash band join +
                                    audio constellation landmarks +
                                    per-frame video hashes → one union
                                    edge set → dup_clusters; keep the
                                    min-id representative per cluster)
          → per-kind features      (multimodal.extract_features: real
                                    WAV-FFT / BMP grid-luma / RAWV
                                    motion kernels, Arrow-batched)
          → quarantine split       (per-row decode errors survive as
                                    rows, never as job failures)

    The synthetic corpus plants exact re-encodes of a fraction of the
    images under new ids (the re-crawl case); the dedup stage must
    collapse each cluster to one representative.  Returns
    ``(features_df, manifest)`` with per-stage counts.  Scale shape: the
    only shuffles are the dHash band join and the cluster propagation —
    both candidate-bound; decode/features are row-local.
    """
    from ..sources import multimodal as mm

    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("media_id") % 3 + 1).cast("int"))
    keys = spark.range(n_items).select(
        F.col("id").alias("media_id"), kinds.alias("kind"))
    media = mm.synthesize_media(keys)
    # plant exact re-encodes of the first dup_fraction of images under
    # fresh ids — identical pixels => identical dHash => hamming 0
    n_dups = int(n_items * dup_fraction)
    dup_ids = (keys.orderBy("media_id").limit(n_dups)
               .select("media_id"))  # mixed kinds — every modality dedups
    # re-key the ORIGINAL payloads under fresh ids: byte-identical
    # content, new identity — the re-crawl duplicate
    dups = (media.join(F.broadcast(dup_ids), "media_id")
            .withColumn("media_id", F.col("media_id") + n_items))
    corpus = media.unionByName(dups.select(*media.columns)).persist()
    manifest = {"raw": corpus.count()}

    pairs = (mm.image_neardup_pairs(corpus, max_hamming=max_hamming,
                                    max_bucket=max_bucket)
             .select("d1", "d2")
             .unionByName(mm.audio_neardup_pairs(
                 corpus, min_shared=audio_min_shared,
                 max_bucket=max_bucket)
                 .select("d1", "d2"))
             .unionByName(mm.video_neardup_pairs(
                 corpus, min_shared=video_min_shared,
                 max_bucket=max_bucket)
                 .select("d1", "d2")))
    if cross_modal_stills:
        # optional round-9 stage: image rows that are stills of a video
        # scene join that video's duplicate cluster (keyframe dHash ⋈
        # image dHash, bipartite banded-Hamming) — OFF by default
        # because "a frame of the video exists as an image" is a
        # corpus-policy call, not always a duplicate
        pairs = pairs.unionByName(
            mm.video_still_pairs(corpus, max_hamming=max_hamming,
                                 max_bucket=max_bucket)
            .select(F.col("video_id").alias("d1"),
                    F.col("image_id").alias("d2")))
    # min_shared thresholds scale with clip length (landmarks ~ frames);
    # size them to your corpus — identical copies share ALL landmarks
    from ..operators.dedup import dup_clusters
    clusters = dup_clusters(pairs)           # (node, cluster=min id)
    drop = (clusters.where(F.col("node") != F.col("cluster"))
            .select(F.col("node").alias("media_id")))
    manifest["near_dup_dropped"] = drop.count()
    # No broadcast hint on the drop list: it scales with the corpus
    # dup-rate (a fraction of ALL rows, not a bounded dimension) — at
    # real scale a mandatory broadcast can exceed driver/executor
    # limits.  Left to AQE, which broadcasts only when the runtime size
    # is actually small (test_media_pipeline_drop_edge_not_hinted).
    kept = corpus.join(drop, "media_id", "left_anti").persist()
    manifest["kept"] = kept.count()

    feats = mm.extract_features(kept, dim=feature_dim).persist()
    manifest["features_ok"] = feats.where(F.col("error").isNull()).count()
    manifest["quarantined"] = feats.where(
        F.col("error").isNotNull()).count()
    corpus.unpersist()
    kept.unpersist()
    return feats, manifest
