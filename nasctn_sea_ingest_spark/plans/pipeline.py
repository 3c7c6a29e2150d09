"""End-to-end LLM training-data pipeline: the composition a 100 TB corpus
job actually runs, built entirely from this engine's operators.

    raw documents
      → quality gate        (text.quality_score, filter before any shuffle)
      → exact dedup         (dedup.drop_exact_duplicates)
      → near-dup candidates (dedup.minhash_dedup_candidates, LSH banding)
      → cluster + keep one  (dedup.dup_clusters → drop_near_duplicates)
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

__all__ = ["llm_corpus_pipeline"]


def llm_corpus_pipeline(spark: SparkSession, sf_dir: str,
                        seq_len: int = 2048,
                        min_quality: float = 0.5,
                        splits: "dict[str, float] | None" = None,
                        decontaminate: bool = True,
                        counts: bool = True,
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
    scored = text.quality_score(d)
    if counts:
        # raw + gated counts in ONE scan (separate .count() calls on the
        # un-persisted frames would re-run the quality gate per action)
        row = scored.agg(
            F.count("*").alias("raw"),
            F.count(F.when(F.col("quality") >= min_quality, 1)).alias("gated"),
        ).first()
        manifest["raw"], manifest["quality_gated"] = row["raw"], row["gated"]

    gated = (scored.where(F.col("quality") >= min_quality)
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
        for df in pinned:
            df.unpersist()
    return packed, manifest
