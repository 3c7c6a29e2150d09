"""Materialized inverted-index search over the documents table.

The corpus q84 BM25 query scores a FIXED literal term set by rescanning
raw documents — right for one-off analytics, wrong for a serving-shaped
workload where the corpus is 100 TB and queries arrive continuously.
This module adds the production layout: tokenize ONCE into a posting
table ``(tok, doc_id, tfreq, dlen)``, store it partitioned by a token
shard, and answer each query by scanning only the shards its terms hash
to (partition pruning — the persisted-LSH-index pattern from
``similarity.lsh_bucket`` applied to text).

Per-query cost is O(postings of the query terms), independent of corpus
size for selective terms; the index build is two shuffle-free passes
over each document (explode → one ``(doc_id, tok)`` hash-agg, doc
length recovered from the same partitioning with a window sum — no
second scan of the raw text).

Tokenization matches the engine's text family (q84/q67): lowercase,
trim, split on ``\\s+``, drop empties.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["build_inverted_index", "write_index", "load_index",
           "term_shards", "conjunctive_search", "bm25_search",
           "index_stats"]

_BM25_K1 = 1.2
_BM25_B = 0.75


def _tokens(text_col) -> Column:
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"),
                    lambda x: x != "")


def build_inverted_index(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Posting rows ``(tok, doc_id, tfreq, dlen)``.  ``dlen`` (total
    tokens in the doc) is denormalized onto every posting so BM25 scores
    at query time never join back to the raw corpus.

    ``dlen`` is the SIZE of the token array, computed map-side BEFORE
    the explode and carried through it — so the whole build is one
    Generate + one hash-agg with a single Exchange on (doc_id, tok)
    (a first-draft window-over-doc_id variant cost a second exchange;
    the array is let-bound once per row so the regex split doesn't
    re-evaluate for size and explode — the q84 lesson).  Whitespace-only
    docs produce no postings (q84's ``dlen > 0`` stats rule)."""
    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        _tokens(text_col).alias("__t"))
            .select("doc_id", F.size("__t").alias("dlen"),
                    F.explode("__t").alias("tok")))
    return (toks.groupBy("doc_id", "tok")
            .agg(F.count("*").cast("long").alias("tfreq"),
                 F.first("dlen").cast("long").alias("dlen"))
            .select("tok", "doc_id", "tfreq", "dlen"))


def term_shards(spark: SparkSession, terms: Sequence[str],
                n_shards: int) -> "dict[str, int]":
    """Shard id per term, computed by the ENGINE's own hash (xxhash64 is
    JVM-private — recomputing it in Python would fork the function), via
    one tiny local-relation job: bounded setup work, like collecting
    query vectors in ``cosine_topk_batch``."""
    rows = (spark.createDataFrame([(t,) for t in terms], "tok string")
            .select("tok", F.pmod(F.xxhash64("tok"), F.lit(n_shards))
                    .cast("int").alias("shard")).collect())
    return {r.tok: r.shard for r in rows}


def write_index(postings: DataFrame, path: str,
                n_shards: int = 64) -> None:
    """Persist the index partitioned by ``shard = xxhash64(tok) mod n``:
    a query's scan prunes to the shards its terms hash to.  ``n_shards``
    is baked into the layout (recorded in an ``_index_meta`` sidecar and
    re-read by :func:`load_index`); postings of one token always land in
    exactly one shard directory, so a probe misses nothing."""
    spark = postings.sparkSession
    (postings
     .withColumn("shard", F.pmod(F.xxhash64("tok"), F.lit(n_shards))
                 .cast("int"))
     .repartition("shard")
     .write.mode("overwrite").partitionBy("shard").parquet(path))
    (spark.createDataFrame([(int(n_shards),)], "n_shards int")
     .coalesce(1).write.mode("overwrite").json(f"{path}/_index_meta"))


def load_index(spark: SparkSession, path: str) -> "tuple[DataFrame, int]":
    """(postings, n_shards) of a :func:`write_index` layout."""
    n = int(spark.read.json(f"{path}/_index_meta").first().n_shards)
    return spark.read.parquet(path), n


def _probe(index: DataFrame, terms: Sequence[str],
           n_shards: int | None) -> DataFrame:
    terms = sorted(set(terms))
    matched = index.where(F.col("tok").isin(terms))
    if n_shards is not None and "shard" in index.columns:
        shards = sorted(set(term_shards(index.sparkSession, terms,
                                        n_shards).values()))
        # literal IN on the partition column => PartitionFilters prune
        matched = matched.where(F.col("shard").isin(shards))
    return matched


def conjunctive_search(index: DataFrame, terms: Sequence[str],
                       k: int = 10,
                       n_shards: int | None = None) -> DataFrame:
    """Top-``k`` documents containing ALL query terms, ranked by total
    term frequency (ties: lower doc_id).  Postings are unique per
    (tok, doc), so "matched all" is ``count(*) == |terms|`` — no
    distinct aggregate.  Plan: pruned scan → one doc_id hash-agg over
    only matching postings → TakeOrdered(k)."""
    terms = sorted(set(terms))
    hits = (_probe(index, terms, n_shards)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_matched"),
                 F.sum("tfreq").cast("long").alias("score"))
            .where(F.col("n_matched") == len(terms)))
    return (hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
            .select("doc_id", "score"))


def index_stats(index: DataFrame) -> "tuple[int, float]":
    """(n_docs, avgdl) from the posting table — one distinct-doc
    aggregate over the full index.  At scale compute this once at build
    time and cache; every :func:`bm25_search` accepts it as an argument
    for exactly that reason."""
    row = (index.select("doc_id", "dlen").groupBy("doc_id")
           .agg(F.first("dlen").alias("dlen"))
           .agg(F.count("*").alias("n"),
                F.avg("dlen").alias("avgdl")).first())
    return int(row.n), float(row.avgdl)


def bm25_search(index: DataFrame, terms: Sequence[str], k: int = 10,
                stats: "tuple[int, float] | None" = None,
                k1: float = _BM25_K1, b: float = _BM25_B,
                n_shards: int | None = None) -> DataFrame:
    """Top-``k`` documents by summed Okapi BM25 over the query terms
    (Lucene idf — q84's exact formula and association order), computed
    ENTIRELY from the posting table: tf and dlen sit on each posting,
    per-term document frequencies aggregate from the pruned probe
    itself, and the corpus stats come from ``stats`` (or one
    :func:`index_stats` pass when not supplied).  Disjunctive (OR)
    semantics: any doc matching ≥1 term scores."""
    terms = sorted(set(terms))
    n_docs, avgdl = stats if stats is not None else index_stats(index)
    matched = _probe(index, terms, n_shards)
    dfreq = matched.groupBy("tok").agg(
        F.count("*").cast("long").alias("dfreq"))
    scored = matched.join(F.broadcast(dfreq), "tok")
    idf = F.log((F.lit(float(n_docs)) - F.col("dfreq") + 0.5)
                / (F.col("dfreq") + 0.5) + 1.0)
    per_term = (idf * (F.col("tfreq") * (k1 + 1.0))) \
        / (F.col("tfreq") + k1 * (1.0 - b + b * F.col("dlen") / avgdl))
    return (scored.withColumn("s", per_term)
            .groupBy("doc_id")
            .agg(F.sum("s").alias("bm25"),
                 F.count("*").alias("n_matched"))
            .orderBy(F.desc("bm25"), F.asc("doc_id")).limit(k)
            .select("doc_id", F.col("bm25"), "n_matched"))
