"""Sequence packing: assemble documents into fixed-token-budget training
sequences — the batch-assembly step between a cleaned corpus and a trainer.

The standard GPT-style recipe concatenates documents in a deterministic
order and cuts every ``seq_len`` tokens, letting documents straddle cut
points. Relationally that is: a running token sum per stream, and
``pack_id = (cum - n_tok) div seq_len`` (the pack where each document
STARTS). Everything is one window + one aggregate — no UDF.

Scale note: the running sum orders within a stream, so the stream key
(``by`` — shard, language, source...) must partition the corpus; a single
global stream would serialize the sort through one task. Hash-shard first
(``sampling.hash_bucket``) to get as many independent streams as you want
parallelism.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["assign_packs", "pack_stats", "write_training_shards"]


def assign_packs(df: DataFrame, token_col: str, seq_len: int,
                 by: Sequence[str], order: Sequence[str]) -> DataFrame:
    """Add ``pack_id``: the fixed-``seq_len`` training sequence in which
    this document starts, packing in ``order`` within each ``by`` stream.
    Also adds ``pack_offset`` (token position of the document's first
    token inside its pack)."""
    w = Window.partitionBy(*by).orderBy(*order) \
              .rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum(token_col).over(w).cast("bigint")
    start = cum - F.col(token_col)
    return (df.withColumn("pack_id", F.floor(start / seq_len).cast("bigint"))
              .withColumn("pack_offset", (start % seq_len).cast("bigint")))


def pack_stats(df: DataFrame, token_col: str, seq_len: int,
               by: Sequence[str], order: Sequence[str]) -> DataFrame:
    """Per-pack assembly manifest: document count, token count, id range.
    The trainer-facing view of ``assign_packs``."""
    packed = assign_packs(df, token_col, seq_len, by, order)
    first_order = order[0]
    return (packed.groupBy(*by, "pack_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(token_col).cast("bigint").alias("n_tokens"),
                 F.min(first_order).alias("first_doc"),
                 F.max(first_order).alias("last_doc")))


def write_training_shards(packed: DataFrame, out_dir: str,
                          by: Sequence[str] = ("split", "lang"),
                          order: Sequence[str] = ("pack_id", "pack_offset"),
                          split_col: str = "split",
                          max_records_per_file: int = 100_000) -> None:
    """Materialize the packed corpus as training shards: one directory per
    ``split_col`` value (so a trainer mounts only its split), files bounded
    at ``max_records_per_file`` rows (shard count tracks corpus size, not
    partition count), rows sorted by (pack_id, pack_offset) within files
    so a sequential reader reassembles fixed-length sequences without a
    sort. Deterministic given ``assign_packs`` output — re-running
    overwrites byte-identical shards, which makes the sink resumable.

    ``split_col`` must be one of the ``by`` stream keys: the directory
    layout only isolates splits if the repartition co-locates them.
    """
    by = list(by)
    if split_col not in by:
        raise ValueError(
            f"split_col {split_col!r} must be one of the stream keys {by} "
            f"(partitionBy only isolates splits the repartition co-locates)")
    if split_col not in packed.columns:
        raise ValueError(f"split_col {split_col!r} not in {packed.columns}")
    (packed.repartition(*by)
           .sortWithinPartitions(*by, *order)
           .write.mode("overwrite")
           .option("maxRecordsPerFile", max_records_per_file)
           .partitionBy(split_col)
           .parquet(out_dir))
