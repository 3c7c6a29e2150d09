"""Adversarial-input check for q135's PPJoin prefix filter: the corpus
oracle proves losslessness on the driver's data; this builds a crafted
documents table (empty text, <3-word docs with no shingles, exact
duplicates, one-word-edit near-duplicates, a doc sharing only common
shingles) and re-runs the same Spark-vs-DuckDB compare on it."""

import duckdb
import pytest

from nasctn_sea_ingest_spark.plans import CORPUS

from .oracle_compare import compare


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),       # exact dup
    (3, "the quick brown fox leaps over the lazy dog"),       # 1-word edit
    (4, ""),                                                  # empty
    (5, "two words"),                                         # no shingles
    (6, "the quick brown"),                                   # 1 shingle
    (7, "quick brown the"),                                   # same words, diff shingles
    (8, "completely unrelated text about spark engines here"),
    (9, "the quick brown fox jumps over the lazy dog today"), # superset
    (10, "a b c d e f g h i j k l m n o p"),
    (11, "a b c d e f g h i j k l m n o q"),                  # tail edit
]


@pytest.fixture()
def adv_sf_dir(tmp_path, spark):
    sf = str(tmp_path / "adv")
    import os
    os.mkdir(sf)
    spark.createDataFrame(DOCS, "doc_id long, text string") \
        .coalesce(1).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_q135_adversarial_docs_match_bruteforce(spark, adv_sf_dir):
    q = next(x for x in CORPUS if x.name == "q135_setsim_prefix_join")
    con = duckdb.connect()
    # Spark writes the table as a directory of part files; glob for DuckDB
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{adv_sf_dir}/documents.parquet/*.parquet'")
    try:
        problems = compare(q.spark(spark, adv_sf_dir), con, q.sql)
        assert not problems, problems
        rows = {(r.da, r.db): (r.inter, r.uni)
                for r in q.spark(spark, adv_sf_dir).collect()}
    finally:
        con.close()
    # the planted certainties: exact dup pair at J=1; the 1-word-edit and
    # tail-edit pairs share most shingles
    assert (1, 2) in rows and rows[(1, 2)][0] == rows[(1, 2)][1]
    assert (10, 11) in rows   # 14 shared / 2 unique shingles -> J = 0.875
    assert (1, 3) not in rows or 5 * rows[(1, 3)][0] >= 3 * rows[(1, 3)][1]
    # docs without shingles (empty, <3 words) never pair
    for (a, b) in rows:
        assert a not in (4, 5) and b not in (4, 5)
