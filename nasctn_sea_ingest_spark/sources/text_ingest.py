"""Raw text-corpus ingestion: JSONL / CSV document sources → the engine's
``documents`` layout (doc_id, text, lang, source, n_chars).

A 100 TB training corpus lands as compressed JSONL shards, not parquet.
The rules that make that read scale are the same ones the sigmf ingest
follows (``sources/ingest.py``):

- **explicit schema, never inference** — schema inference is a full extra
  pass over the data (and nondeterministic under corrupt shards);
- **permissive parse + quarantine, never job failure** — one corrupt line
  in shard 90,000 must not kill the read: bad records land in a
  ``_corrupt_record`` column and are split into a quarantine frame the
  caller can persist next to the corpus;
- **derived ids are content hashes, not positions** — zipWithIndex /
  monotonically_increasing_id change under repartitioning; xxhash64 of
  (source, text) is stable across re-reads, re-splits and re-runs.

Spark's JSON/CSV readers are JVM-side and splittable (gzip shards split
per-file, zstd/bzip2 per-block), so the scan parallelizes by file with no
Python in the loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["DOCUMENT_SCHEMA", "read_documents", "split_quarantine"]

DOCUMENT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

_CORRUPT = "_corrupt_record"


def read_documents(spark: SparkSession, path: str, fmt: str = "jsonl",
                   text_col: str = "text", id_col: str | None = "doc_id",
                   **reader_opts) -> DataFrame:
    """Read a raw document corpus into the engine layout + ``_corrupt_record``.

    ``fmt``: 'jsonl' (one JSON object per line) or 'csv' (headered).
    ``text_col`` maps the source's text field; ``id_col=None`` (or a
    missing column) synthesizes a stable ``xxhash64(source, text)`` id.
    Missing ``lang``/``source``/``n_chars`` columns are derived (NULL
    lang, file name source, length(text) chars).  Corrupt lines survive
    as rows with ``_corrupt_record`` set — split them off with
    :func:`split_quarantine`.
    """
    if fmt not in ("jsonl", "csv"):
        raise ValueError(f"fmt must be 'jsonl' or 'csv', got {fmt!r}")
    if fmt == "jsonl":
        # JSON fields match by NAME, so the schema pins exactly what we
        # consume plus the corrupt-record capture column
        fields = [T.StructField(text_col, T.StringType(), True),
                  T.StructField(_CORRUPT, T.StringType(), True)]
        if id_col:
            fields.insert(0, T.StructField(id_col, T.LongType(), True))
        for extra in ("lang", "source"):
            if extra not in (text_col, id_col):
                fields.append(T.StructField(extra, T.StringType(), True))
        reader = (spark.read.schema(T.StructType(fields))
                  .option("mode", "PERMISSIVE")
                  .option("columnNameOfCorruptRecord", _CORRUPT))
        for k, v in reader_opts.items():
            reader = reader.option(k, v)
        df = reader.json(path)
    else:
        # CSV maps an explicit schema by POSITION, which we can't pin
        # without dictating shard column order; header-driven all-string
        # columns instead (reads one header line, never scans data —
        # this is NOT type inference).  Malformed rows surface as null
        # text under PERMISSIVE and quarantine on that.
        reader = (spark.read.option("header", "true")
                  .option("mode", "PERMISSIVE"))
        for k, v in reader_opts.items():
            reader = reader.option(k, v)
        df = reader.csv(path)
        df = df.withColumn(_CORRUPT, F.lit(None).cast("string"))
    for needed in ("lang", "source"):
        if needed not in df.columns:
            df = df.withColumn(needed, F.lit(None).cast("string"))
    src = F.coalesce(F.col("source"),
                     F.element_at(F.split(F.input_file_name(), "/"), -1))
    txt = F.col(text_col)
    did = (F.col(id_col).cast("long") if id_col in df.columns and id_col
           else F.lit(None).cast("long"))
    return df.select(
        F.coalesce(did, F.xxhash64(src, txt)).alias("doc_id"),
        txt.alias("text"),
        F.col("lang").alias("lang"),
        src.alias("source"),
        F.length(txt).cast("long").alias("n_chars"),
        F.col(_CORRUPT))


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): good rows drop the corrupt column; quarantine
    keeps the raw line for replay/debugging (the S15 error-isolation
    contract for text sources)."""
    good = (df.where(F.col(_CORRUPT).isNull() & F.col("text").isNotNull())
              .drop(_CORRUPT))
    bad = df.where(F.col(_CORRUPT).isNotNull() | F.col("text").isNull()) \
            .select(F.col(_CORRUPT).alias("raw_record"), "source")
    return good, bad
