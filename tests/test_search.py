"""Inverted-index search (operators/search.py): build parity vs a
brute-force Python tokenizer, conjunctive AND semantics, BM25 scores vs
an independent per-doc Python computation, and the persisted layout's
partition-pruned probe."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from nasctn_sea_ingest_spark.operators.search import (
    bm25_search, build_inverted_index, conjunctive_search, index_stats,
    load_index, term_shards, write_index)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").persist()


@pytest.fixture(scope="module")
def py_index(docs):
    """Brute-force oracle: same tokenization in pure Python."""
    out = {}
    for r in docs.collect():
        toks = [t for t in re.split(r"\s+", r.text.strip().lower()) if t]
        if toks:
            out[r.doc_id] = Counter(toks)
    return out


@pytest.fixture(scope="module")
def index(docs):
    return build_inverted_index(docs).persist()


def _common_terms(py_index, n=3):
    df = Counter()
    for c in py_index.values():
        df.update(c.keys())
    return [t for t, _ in df.most_common(n)]


def test_build_matches_bruteforce(index, py_index):
    got = {(r.tok, r.doc_id): (r.tfreq, r.dlen) for r in index.collect()}
    want = {(t, d): (c[t], sum(c.values()))
            for d, c in py_index.items() for t in c}
    assert got == want


def test_conjunctive_search_exact(index, py_index):
    terms = _common_terms(py_index, 2)
    got = [(r.doc_id, r.score)
           for r in conjunctive_search(index, terms, k=10).collect()]
    cand = [(d, sum(c[t] for t in terms)) for d, c in py_index.items()
            if all(t in c for t in terms)]
    want = sorted(cand, key=lambda x: (-x[1], x[0]))[:10]
    assert got == want
    # a term that appears nowhere makes the conjunction empty
    assert conjunctive_search(index, terms + ["zzqqxx__never"],
                              k=10).count() == 0
    # duplicate terms in the query must not break the all-matched count
    assert [(r.doc_id, r.score) for r in
            conjunctive_search(index, terms + [terms[0]], k=10)
            .collect()] == got


def test_bm25_search_matches_python(index, py_index):
    terms = _common_terms(py_index, 3)
    n_docs = len(py_index)
    avgdl = sum(sum(c.values()) for c in py_index.values()) / n_docs
    st = index_stats(index)
    assert st[0] == n_docs and st[1] == pytest.approx(avgdl)

    k1, b = 1.2, 0.75
    dfreq = {t: sum(1 for c in py_index.values() if t in c)
             for t in terms}
    want = []
    for d, c in py_index.items():
        s, m = 0.0, 0
        for t in terms:
            if t not in c:
                continue
            m += 1
            idf = math.log((n_docs - dfreq[t] + 0.5)
                           / (dfreq[t] + 0.5) + 1.0)
            dlen = sum(c.values())
            s += (idf * (c[t] * (k1 + 1.0))) \
                / (c[t] + k1 * (1.0 - b + b * dlen / avgdl))
        if m:
            want.append((d, s, m))
    want = sorted(want, key=lambda x: (-x[1], x[0]))[:10]
    got = [(r.doc_id, r.bm25, r.n_matched)
           for r in bm25_search(index, terms, k=10, stats=st).collect()]
    assert [(d, m) for d, _s, m in want] == [(d, m) for d, _s, m in got]
    for (_, ws, _), (_, gs, _) in zip(want, got):
        assert gs == pytest.approx(ws, rel=1e-9)


def test_persisted_index_prunes_and_answers(spark, index, py_index,
                                            tmp_path):
    """The 100 TB serving story: write the sharded layout, probe it with
    a query — the scan carries the shard predicate as a PartitionFilter
    (reads only the terms' shards), and results equal the unpersisted
    path exactly."""
    out = str(tmp_path / "inv_index")
    write_index(index, out, n_shards=16)
    idx, n_shards = load_index(spark, out)
    assert n_shards == 16
    assert idx.count() == index.count()  # lossless layout

    terms = _common_terms(py_index, 2)
    shards = set(term_shards(spark, terms, 16).values())
    probe = idx.where(F.col("tok").isin(terms)) \
               .where(F.col("shard").isin(sorted(shards)))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in \
        plan.split("PartitionFilters")[1][:220]

    got = [(r.doc_id, r.score) for r in
           conjunctive_search(idx, terms, k=10, n_shards=16).collect()]
    want = [(r.doc_id, r.score) for r in
            conjunctive_search(index, terms, k=10).collect()]
    assert got == want
    got_b = [(r.doc_id, round(r.bm25, 9)) for r in
             bm25_search(idx, terms, k=10, n_shards=16).collect()]
    want_b = [(r.doc_id, round(r.bm25, 9)) for r in
              bm25_search(index, terms, k=10).collect()]
    assert got_b == want_b
