"""Distributed BPE training/encoding (operators/bpe.py) vs a pure-Python
reference implementation of the same greedy algorithm (Sennrich et al.
2016) with the identical (count desc, pair lexicographic) tie-break."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nasctn_sea_ingest_spark.operators.bpe import (
    bpe_decode_word, bpe_encode, bpe_encode_word_py, merge_pair_expr,
    train_bpe, word_vocab)

_EOW = "</w>"


# ---------------------------------------------------------------------------
# Pure-Python reference
# ---------------------------------------------------------------------------

def _merge_word(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_ref(vocab: dict, n_merges: int, min_count: int = 1):
    state = {w: (list(w[:-1]) + [w[-1] + _EOW], c)
             for w, c in vocab.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, c in state.values():
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), _c = best
        merges.append((a, b))
        state = {w: (_merge_word(syms, a, b), c)
                 for w, (syms, c) in state.items()}
    return merges, {w: syms for w, (syms, c) in state.items()}


def test_train_bpe_matches_reference_toy(spark):
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    vdf = spark.createDataFrame(list(vocab.items()),
                                "word string, count long")
    got = train_bpe(vdf, n_merges=10)
    want, state = _train_ref(vocab, 10)
    assert got == want
    # encoding each vocab word with the learned ranks reproduces the
    # training-end symbol state (rank-greedy == replay-in-order)
    ranks = {p: i for i, p in enumerate(got)}
    for w in vocab:
        assert bpe_encode_word_py(w, ranks) == state[w]
        assert bpe_decode_word(state[w]) == w


def test_train_bpe_overlap_and_stop(spark):
    """'aaaa' merges non-overlapping left-to-right; min_count stops the
    loop before n_merges when no pair is frequent enough."""
    vdf = spark.createDataFrame([("aaaa", 1)], "word string, count long")
    got = train_bpe(vdf, n_merges=2)
    want, state = _train_ref({"aaaa": 1}, 2)
    assert got == want and want[0] == ("a", "a")
    assert state["aaaa"] == ["aa", "a", f"a{_EOW}"] or \
        state["aaaa"] == _merge_word(
            _merge_word(list("aaa") + [f"a{_EOW}"], *want[0]), *want[1])
    # a repeat-free 1-count word has every pair at count 1 < 2 -> stop
    v2 = spark.createDataFrame([("abcd", 1)], "word string, count long")
    assert train_bpe(v2, n_merges=5, min_count=2) == []


@settings(max_examples=30, deadline=None)
@given(syms=st.lists(st.sampled_from(["a", "b", "ab", "ba", "a</w>"]),
                     min_size=0, max_size=8),
       pair=st.tuples(st.sampled_from(["a", "b", "ab"]),
                      st.sampled_from(["a", "b", "a</w>"])))
def test_merge_pair_expr_property(spark, syms, pair):
    """The JVM aggregate fold == the Python reference merge for ANY
    symbol sequence and pair (incl. overlapping runs and empty
    arrays)."""
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(merge_pair_expr(F.col("syms"), *pair)
                    .alias("m")).first().m
    assert got == _merge_word(syms, *pair)


def test_train_bpe_on_documents_and_encode(spark, sf_dir):
    """End-to-end on the real corpus: the distributed vocabulary + 25
    Spark-trained merges equal the Python reference trained on the
    collected vocab; encoding is lossless (decode == normalized words)
    and consistent with the reference kernel."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").limit(120).persist()
    vdf = word_vocab(docs, "text").persist()
    pyvocab = {r.word: r["count"] for r in vdf.collect()}
    # vocabulary parity with the same tokenizer
    want_vocab = {}
    for r in docs.collect():
        for w in re.split(r"\s+", r.text.strip().lower()):
            if w:
                want_vocab[w] = want_vocab.get(w, 0) + 1
    assert pyvocab == want_vocab

    got = train_bpe(vdf, n_merges=25)
    want, _state = _train_ref(pyvocab, 25)
    assert got == want

    enc = bpe_encode(docs, "text", got).select("doc_id", "text",
                                               "bpe_tokens")
    ranks = {p: i for i, p in enumerate(got)}
    for r in enc.collect():
        words = [w for w in re.split(r"\s+", r.text.strip().lower())
                 if w]
        # lossless: stripping markers restores the normalized text
        assert "".join(r.bpe_tokens).replace(_EOW, "") == "".join(words)
        # consistent with the reference kernel per word
        flat = []
        for w in words:
            flat.extend(bpe_encode_word_py(w, ranks))
        assert r.bpe_tokens == flat
    docs.unpersist()
    vdf.unpersist()


def test_train_bpe_local_vs_distributed_parity(spark):
    """The size-gated driver kernel (round 9: small vocabs skip the
    distributed argmax loop, whose per-iteration cost is pure
    scheduling on tiny frames) is tie-for-tie identical to the
    distributed path AND the independent reference — including a
    deliberate count tie broken lexicographically, multi-char repeats,
    and a min_count early stop."""
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3,
             "aaaa": 4, "banana": 4, "bandana": 1, "ad": 6, "ae": 6}
    vdf = spark.createDataFrame(list(vocab.items()),
                                "word string, count long")
    local = train_bpe(vdf, n_merges=15)                 # gated path
    dist = train_bpe(vdf, n_merges=15, local_vocab_rows=0)
    want, _ = _train_ref(vocab, 15)
    assert local == dist == want
    # min_count propagates through the gate identically
    assert train_bpe(vdf, n_merges=15, min_count=7) == \
        train_bpe(vdf, n_merges=15, min_count=7, local_vocab_rows=0)
    # threshold boundary: vocab larger than the gate goes distributed
    # (same answer, just proves the take(n+1) overflow branch runs)
    assert train_bpe(vdf, n_merges=4, local_vocab_rows=3) == want[:4]
