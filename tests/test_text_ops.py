"""Text-operator library tests against pure-Python ground truth."""

import pytest
import pyspark.sql.functions as F
from pyspark.sql import Row

from nasctn_sea_ingest_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=0, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=1, text="le chat est sur la table et le chien dort"),
        Row(doc_id=2, text="el perro y el gato es una historia de los dos"),
        Row(doc_id=3, text="die katze ist auf der matte und der hund auch"),
        Row(doc_id=4, text="zzz qqq xxx"),                      # und
        Row(doc_id=5, text="!!! ??? 123 456 789 000 111 222"),  # low quality
        Row(doc_id=6, text="word word word word word word word word"),
    ]
    return spark.createDataFrame(rows)


def test_token_stats(docs):
    r = {x.doc_id: x for x in TX.token_stats(docs).collect()}
    assert r[0].n_tokens == 9
    assert r[0].n_distinct == 8           # 'the' twice
    assert r[0].ttr == pytest.approx(8 / 9)
    want_avg = sum(len(w) for w in
                   "the quick brown fox jumps over the lazy dog".split()) / 9
    assert r[0].avg_tok_len == pytest.approx(want_avg)
    assert r[0].stopword_ratio == pytest.approx(2 / 9)
    assert r[6].ttr == pytest.approx(1 / 8)


def test_language_id(docs):
    r = {x.doc_id: x.guessed_lang for x in TX.language_id(docs).collect()}
    assert r[0] == "en" and r[1] == "fr" and r[2] == "es" and r[3] == "de"
    assert r[4] == "und"


def test_quality_score(docs):
    r = {x.doc_id: x for x in TX.quality_score(docs).collect()}
    assert r[0].quality == 1.0
    assert r[5].quality <= 0.6           # numeric junk fails alpha+stopwords
    assert r[5].ok_alpha is False and r[5].ok_stopwords is False
    assert r[6].ok_repetition is False   # 8× same word
    assert 0.0 <= r[4].quality <= 1.0


def test_fingerprint_order_sensitive(spark):
    a = spark.createDataFrame([Row(doc_id=0, text="alpha beta gamma"),
                               Row(doc_id=1, text="gamma beta alpha"),
                               Row(doc_id=2, text="alpha beta gamma")])
    r = {x.doc_id: x.fingerprint for x in TX.fingerprint(a).collect()}
    assert r[0] == r[2]
    assert r[0] != r[1]
    # matches the direct rolling-hash computation
    def py_fp(text):
        h = 0
        for w in text.split():
            h = (h * 31 + (len(w) * 131 + ord(w[0]))) % 1_000_000_007
        return h
    assert r[0] == py_fp("alpha beta gamma")


def test_token_count_estimate(spark):
    d = spark.createDataFrame(
        [Row(doc_id=0, text="hello world"),
         Row(doc_id=1, text="internationalization, tokenizer-friendly 2024!")])
    r = {x.doc_id: x for x in TX.token_count_estimate(d).collect()}
    assert r[0].n_words == 2
    assert r[0].n_tokens_bpe_est == pytest.approx(2 + 2)  # ceil(5/4)+ceil(5/4)
    # longer words split into more subword pieces; punctuation counts 1 each
    assert r[1].n_tokens_bpe_est > r[1].n_words


def test_scrub_pii(spark):
    from nasctn_sea_ingest_spark.operators.text import scrub_pii
    rows = [
        (0, "mail a.b+c@x-y.co now"),
        (1, "call +1 555 867-5309 ok"),
        (2, "ssn 123-45-6789 leaked"),
        (3, "host 10.0.0.1 up"),
        (4, "clean text stays clean"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r.id: r.text for r in scrub_pii(df).collect()}
    assert got[0] == "mail [EMAIL] now"
    assert got[1] == "call [PHONE] ok"
    assert got[2] == "ssn [SSN] leaked"
    assert got[3] == "host [IPV4] up"
    assert got[4] == "clean text stays clean"
    # out_col keeps the original
    both = scrub_pii(df, out_col="scrubbed").collect()[0]
    assert both.text != both.scrubbed


def test_contamination_planted(spark):
    """A train doc sharing an eval 3-gram is flagged with the right shared
    count; clean docs are absent."""
    import pandas as pd

    from nasctn_sea_ingest_spark.operators.text import contamination

    train = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the quick brown fox jumps",      # shares 2 shingles
                 "totally unrelated content here",  # clean
                 "quick brown fox elsewhere"],      # shares 1 shingle
    }))
    eval_df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100],
        "text": ["the quick brown fox runs"],
    }))
    got = {r.doc_id: r.n_shared_shingles
           for r in contamination(train, eval_df, n=3).collect()}
    # eval shingles: {the quick brown, quick brown fox, brown fox runs}
    assert got == {1: 2, 3: 1}


def test_bloom_contamination_equals_exact(spark):
    """bloom_contamination == contamination (exact output parity) on a
    random corpus with planted overlaps — at the default geometry AND
    at an adversarially tiny n_bits (FPR near 1, every probe a bloom
    hit) where ONLY the verify join keeps the output exact; a
    disjoint eval set yields an empty frame either way."""
    import random

    import pandas as pd

    from nasctn_sea_ingest_spark.operators.text import (
        bloom_contamination, contamination)

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(60)]

    def doc(k):
        return " ".join(rng.choice(vocab) for _ in range(k))

    evals = [doc(12) for _ in range(5)]
    train_texts = [doc(15) for _ in range(40)]
    # plant verbatim eval phrases inside some train docs
    for i in (0, 7, 23):
        train_texts[i] += " " + evals[i % len(evals)]
    train = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(40)), "text": train_texts}))
    eval_df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100 + i for i in range(5)], "text": evals}))

    want = {r.doc_id: r.n_shared_shingles
            for r in contamination(train, eval_df, n=5).collect()}
    assert want  # the plant guarantees hits
    for kw in ({}, {"n_bits": 64, "n_hashes": 2}):
        got = {r.doc_id: r.n_shared_shingles
               for r in bloom_contamination(train, eval_df, n=5,
                                            **kw).collect()}
        assert got == want, kw

    clean_eval = spark.createDataFrame(pd.DataFrame({
        "doc_id": [999], "text": ["alpha beta gamma delta epsilon "
                                  "zeta eta theta"]}))
    assert not bloom_contamination(train, clean_eval, n=5).count()
    assert not contamination(train, clean_eval, n=5).count()


def test_bloom_contamination_hypothesis(spark):
    """Property: bloom_contamination == contamination on arbitrary
    tiny-alphabet corpora (dense chance overlaps) across randomized
    filter geometry — n_bits down to 64 (near-total FPR) and 1–3
    hashes — so exactness never depends on the filter being
    well-sized."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nasctn_sea_ingest_spark.operators.text import (
        bloom_contamination, contamination)

    text = st.lists(st.sampled_from("abcd"), min_size=0,
                    max_size=10).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(tr=st.lists(text, min_size=1, max_size=6),
           ev=st.lists(text, min_size=1, max_size=3),
           n_bits=st.sampled_from([64, 128, 4096]),
           n_hashes=st.integers(1, 3))
    def prop(tr, ev, n_bits, n_hashes):
        train = spark.createDataFrame(
            [(i, t) for i, t in enumerate(tr)], "doc_id long, text string")
        eval_df = spark.createDataFrame(
            [(100 + i, t) for i, t in enumerate(ev)],
            "doc_id long, text string")
        want = {r.doc_id: r.n_shared_shingles
                for r in contamination(train, eval_df, n=2).collect()}
        got = {r.doc_id: r.n_shared_shingles
               for r in bloom_contamination(
                   train, eval_df, n=2, n_bits=n_bits,
                   n_hashes=n_hashes).collect()}
        assert got == want

    prop()


def test_chunk_dedup_first_occurrence_wins(spark):
    """Repeated chunks survive only at their globally-first (doc, idx)
    position; fully-duplicated docs collapse to NULL; counts line up."""
    import pandas as pd

    from nasctn_sea_ingest_spark.operators.text import chunk_dedup

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b c d e f g h i j k l m n o p q r s t",
                 # doc1 chunk0 == doc0 chunk0 → dropped; tail unique
                 "a b c d e f g h i j x y z w v u t s r q",
                 # exact duplicate of doc0 → all chunks dropped
                 "a b c d e f g h i j k l m n o p q r s t",
                 "solo short doc"],
    }))
    got = {r.doc_id: r for r in chunk_dedup(df, chunk_words=10).collect()}
    assert (got[0].n_chunks, got[0].n_kept) == (2, 2)
    assert got[0].text_clean == "a b c d e f g h i j k l m n o p q r s t"
    assert (got[1].n_chunks, got[1].n_kept) == (2, 1)
    assert got[1].text_clean == "x y z w v u t s r q"
    assert (got[2].n_chunks, got[2].n_kept) == (2, 0)
    assert got[2].text_clean is None
    assert got[3].text_clean == "solo short doc"


def test_repetition_stats_vs_python(spark):
    """Sorted-run-length top-bigram count and distinct-trigram fraction
    match a plain-Python recount on varied docs."""
    import pandas as pd

    from nasctn_sea_ingest_spark.operators.text import repetition_stats

    texts = ["q q q q q q q q q r",
             "a b a b a b c d c d",
             "one two three four five six seven",
             "x y x y x y x y z z z x y"]
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        w = t.split()
        bg = [f"{a} {b}" for a, b in zip(w, w[1:])]
        tg = [f"{a} {b} {c}" for a, b, c in zip(w, w[1:], w[2:])]
        top = max(bg.count(x) for x in set(bg))
        assert got[i].n_bigrams == len(bg)
        assert got[i].top_bigram_frac == pytest.approx(top / len(bg))
        assert got[i].dup_trigram_frac == pytest.approx(
            1.0 - len(set(tg)) / len(tg))
        assert got[i].repetitive == (top / len(bg) > 0.20
                                     or 1.0 - len(set(tg)) / len(tg) > 0.30)


from hypothesis import given as _given, settings as _settings, \
    strategies as _st, HealthCheck as _HC


def _chunk_dedup_py(texts, k=3):
    """Pure-Python mirror of text.chunk_dedup semantics."""
    chunks = []          # (doc, idx, chunk) in global (doc, idx) order
    for doc, t in enumerate(texts):
        w = t.split()
        for idx in range(0, (len(w) + k - 1) // k):
            chunks.append((doc, idx, " ".join(w[idx * k:(idx + 1) * k])))
    seen = set()
    out = {}
    for doc, idx, ch in sorted(chunks):
        n_chunks, n_kept, kept = out.get(doc, (0, 0, []))
        first = ch not in seen
        seen.add(ch)
        out[doc] = (n_chunks + 1, n_kept + first, kept + [ch] if first
                    else kept)
    return {doc: (n, m, " ".join(kept) or None)
            for doc, (n, m, kept) in out.items()}


@_settings(max_examples=10, deadline=None,
           suppress_health_check=[_HC.function_scoped_fixture])
@_given(_st.lists(
    _st.lists(_st.sampled_from("abc"), min_size=1, max_size=20)
    .map(" ".join), min_size=1, max_size=12))
def test_chunk_dedup_property_vs_python(spark, texts):
    """Randomized docs over a 3-letter alphabet (forcing heavy chunk
    collisions, partial tail chunks, whole-doc wipeouts) match the
    pure-Python mirror exactly."""
    from nasctn_sea_ingest_spark.operators.text import chunk_dedup

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r.doc_id: (r.n_chunks, r.n_kept, r.text_clean)
           for r in chunk_dedup(df, chunk_words=3).collect()}
    assert got == _chunk_dedup_py(texts, k=3)


def test_gate_flags_fast_parity(spark):
    """The fused Arrow gate is value-identical to the column-expression
    forms (quality_score + repetition_stats) on real corpus documents
    plus hand-picked whitespace/empty/unicode edge cases."""
    import pyspark.sql.functions as F

    real = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", F.lit("en").alias("lang"), "text").limit(300))
    edge = spark.createDataFrame(
        [(9000001, "en", ""), (9000002, "en", "   "),
         (9000003, "en", "\tword\tword\t"),
         (9000004, "en", "a"), (9000005, "en", "a b"),
         (9000006, "en", "Héllo wörld ünïcode tèxt hère öfter"),
         (9000007, "en", "x " * 200)],
        "doc_id long, lang string, text string")
    docs = real.unionByName(edge)

    expr = TX.repetition_stats(TX.quality_score(docs)) \
        .select("doc_id", "quality", "repetitive")
    fast = TX.gate_flags_fast(docs).select("doc_id", "quality", "repetitive")
    e = {r.doc_id: r for r in expr.collect()}
    f = {r.doc_id: r for r in fast.collect()}
    assert set(e) == set(f) and len(e) > 100
    for k in e:
        assert e[k].quality == f[k].quality, (k, e[k], f[k])
        assert bool(e[k].repetitive) == bool(f[k].repetitive), \
            (k, e[k], f[k])


def test_chunk_overlap_windows(spark):
    """Windows of `size` every `stride` words; overlap preserved; final
    short window kept; whitespace-only docs emit nothing."""
    rows = [Row(doc_id=0, text=" ".join(f"w{i}" for i in range(10))),
            Row(doc_id=1, text="a b"),
            Row(doc_id=2, text="   ")]
    df = spark.createDataFrame(rows)
    out = TX.chunk_overlap(df, size=8, stride=4)
    got = {(r.doc_id, r.chunk_idx): (r.n_words, r.chunk)
           for r in out.collect()}
    # doc 0: 10 words -> starts at 0 and 4 -> [0:8], [4:10]
    assert got[(0, 0)] == (8, " ".join(f"w{i}" for i in range(8)))
    assert got[(0, 1)] == (6, " ".join(f"w{i}" for i in range(4, 10)))
    # doc 1 fits in one window
    assert got[(1, 0)] == (2, "a b")
    # doc 2 is whitespace-only: no chunks
    assert {k[0] for k in got} == {0, 1}
    # every word of doc 0 appears in >= 1 chunk; overlap region in 2
    joined = (got[(0, 0)][1] + " " + got[(0, 1)][1]).split()
    assert set(joined) == {f"w{i}" for i in range(10)}
    assert joined.count("w4") == 2  # overlap

def test_chunk_overlap_validates_args(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="x")])
    with pytest.raises(ValueError):
        TX.chunk_overlap(df, size=4, stride=5)
    with pytest.raises(ValueError):
        TX.chunk_overlap(df, size=0, stride=0)


def test_cdc_chunks_lossless_and_bounded(spark):
    """CDC chunking is lossless (chunks rejoin to the original words),
    deterministic, and every chunk except possibly the last has
    min_words <= n <= max_words."""
    from nasctn_sea_ingest_spark.operators.text import cdc_chunks_expr
    import numpy as np
    rng = np.random.default_rng(21)
    text = " ".join(f"w{int(x)}" for x in rng.integers(0, 5000, 400))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = df.select(cdc_chunks_expr(
        F.split(F.trim("text"), r"\s+"), 10, 4, 30).alias("c")) \
        .first().c
    assert " ".join(chunks) == text
    sizes = [len(c.split(" ")) for c in chunks]
    assert all(4 <= s <= 30 for s in sizes[:-1])
    assert sizes[-1] <= 30
    # determinism
    again = df.select(cdc_chunks_expr(
        F.split(F.trim("text"), r"\s+"), 10, 4, 30).alias("c")) \
        .first().c
    assert again == chunks


def test_cdc_resyncs_after_insertion_fixed_does_not(spark):
    """The CDC headline: insert a preamble word into a document — the
    content-defined chunk streams resync (large shared chunk set, so
    chunk dedup still removes the copy), while fixed-size chunks all
    shift (near-zero sharing, dedup blind)."""
    import numpy as np
    from nasctn_sea_ingest_spark.operators.text import (cdc_chunk_dedup,
                                                        cdc_chunks_expr,
                                                        chunk_dedup)
    rng = np.random.default_rng(22)
    common = [f"t{int(x)}" for x in rng.integers(0, 9000, 300)]
    doc_a = " ".join(common)
    doc_b = "inserted " + doc_a
    df = spark.createDataFrame([(1, doc_a), (2, doc_b)],
                               "doc_id long, text string")
    per_doc = df.select("doc_id", cdc_chunks_expr(
        F.split(F.trim("text"), r"\s+"), 10, 4, 30).alias("c")).collect()
    sets = {r.doc_id: set(r.c) for r in per_doc}
    shared = len(sets[1] & sets[2]) / len(sets[1])
    assert shared > 0.8           # resynced almost immediately

    cdc = {r.doc_id: r for r in cdc_chunk_dedup(df).collect()}
    assert cdc[2].n_kept < cdc[2].n_chunks * 0.2   # copy mostly removed
    fixed = {r.doc_id: r for r in chunk_dedup(df).collect()}
    assert fixed[2].n_kept == fixed[2].n_chunks    # fixed chunking blind
    # doc 1 (first occurrence) always survives intact
    assert cdc[1].n_kept == cdc[1].n_chunks
    assert cdc[1].text_clean == doc_a


def test_bigram_lm_matches_python_oracle(spark):
    """train_bigram_lm + lm_perplexity vs an independent Python
    implementation of the same interpolated model, and the semantic
    property a bigram LM exists for: shuffled word salad scores WORSE
    than fluent in-domain text (unigram stats identical between the
    two by construction)."""
    import math
    import re
    from collections import Counter

    from nasctn_sea_ingest_spark.operators.text import (lm_perplexity,
                                                        train_bigram_lm)

    corpus = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "a cat and a dog sat together"),
        (4, "the cat and the dog ran home"),
        (5, "the mat and the rug are old"),
    ]
    train = spark.createDataFrame(corpus, "doc_id long, text string")
    uni, bi, total, vocab = train_bigram_lm(train)

    # python oracle from the same corpus
    toks = [re.split(r"\s+", t.strip().lower()) for _, t in corpus]
    u = Counter(w for ws in toks for w in ws)
    b = Counter((a, c) for ws in toks for a, c in zip(ws, ws[1:]))
    assert total == sum(u.values()) and vocab == len(u)
    assert {(r.tok, r.cnt) for r in uni.collect()} == set(u.items())
    assert {((r.tok1, r.tok2), r.cnt) for r in bi.collect()} == \
        set(b.items())

    fluent = "the cat sat on the rug"
    salad = "rug the on sat cat the"      # same words, broken order
    oov = "zz qq xx yy"                    # fully out of vocabulary
    test = spark.createDataFrame(
        [(10, fluent), (11, salad), (12, oov), (13, "single")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in lm_perplexity(
        test, uni, bi, total, vocab).collect()}

    def oracle_ppl(text, l_bi=0.6, l_uni=0.3):
        ws = re.split(r"\s+", text.strip().lower())
        lps = []
        for a, c in zip(ws, ws[1:]):
            p_bi = (b.get((a, c), 0) / u[a]) if u.get(a) else 0.0
            p_uni = u.get(c, 0) / total
            p = l_bi * p_bi + l_uni * p_uni + 0.1 / len(u)
            lps.append(math.log2(p))
        avg = sum(lps) / len(lps)
        return avg, 2 ** (-avg)

    for did, text in ((10, fluent), (11, salad), (12, oov)):
        avg, ppl = oracle_ppl(text)
        assert got[did].avg_logprob == pytest.approx(avg, rel=1e-9)
        assert got[did].perplexity == pytest.approx(ppl, rel=1e-9)
        assert got[did].n_bigrams == len(text.split()) - 1
    assert got[11].perplexity > got[10].perplexity * 2   # salad >> fluent
    assert got[12].perplexity > got[11].perplexity       # OOV worst
    # single-word doc emits no bigram rows at all
    assert 13 not in got


def test_compression_ratio_orders_texts(spark):
    """zlib ratio separates repetitive < natural < random, matches a
    local zlib computation exactly, and empty docs yield NULL."""
    import zlib

    from nasctn_sea_ingest_spark.operators.text import compression_ratio

    import numpy as np
    rng = np.random.default_rng(61)
    rand = " ".join("".join(chr(97 + c) for c in rng.integers(0, 26, 8))
                    for _ in range(120))
    natural = ("the quick brown fox jumps over the lazy dog while the "
               "cat watches from a warm windowsill in the late sun ") * 8
    repetitive = "spam ham " * 400
    df = spark.createDataFrame(
        [(1, repetitive), (2, natural), (3, rand), (4, "")],
        "doc_id long, text string")
    got = {r.doc_id: r.zlib_ratio
           for r in compression_ratio(df).collect()}
    assert got[4] is None
    assert got[1] < got[2] < got[3]
    for did, txt in ((1, repetitive), (2, natural), (3, rand)):
        raw = txt.encode()
        assert got[did] == pytest.approx(
            len(zlib.compress(raw, 6)) / len(raw))


@_settings(max_examples=25, deadline=None)
@_given(words=_st.lists(_st.sampled_from(
            ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "zz"]),
            min_size=0, max_size=50),
        target=_st.integers(2, 12),
        minw=_st.integers(1, 4),
        maxw=_st.integers(8, 20))
def test_cdc_chunks_property(spark, words, target, minw, maxw):
    """For ANY word sequence and ANY (target, min, max) params: chunks
    rejoin losslessly and every chunk except the last respects the
    [min, max] size bounds (the last may be short, never long)."""
    from nasctn_sea_ingest_spark.operators.text import cdc_chunks_expr
    df = spark.createDataFrame([(words,)], "w array<string>")
    chunks = df.select(
        cdc_chunks_expr(F.col("w"), target, minw, maxw).alias("c")) \
        .first().c
    joined = [t for c in chunks for t in c.split(" ")]
    assert joined == words
    sizes = [len(c.split(" ")) for c in chunks]
    for s in sizes[:-1]:
        assert minw <= s <= maxw
    if sizes:
        assert sizes[-1] <= maxw


def test_strip_boilerplate_python_oracle(spark):
    """Corpus-frequency line removal == a Python replay: the shared
    cookie banner and footer vanish from every doc (indentation
    variants collapse via the trimmed key), unique content and blank
    lines survive in order, a fully-boilerplate doc keeps a NULL-text
    row, and per-source scoping keeps one site's boilerplate out of
    another's statistics."""
    from nasctn_sea_ingest_spark.operators.text import strip_boilerplate

    banner = "ACCEPT COOKIES TO CONTINUE"
    footer = "(c) example.com all rights reserved"
    docs = []
    for i in range(20):
        body = f"unique paragraph {i} alpha\n\nsecond thought {i}"
        docs.append((i, f"{banner}\n{body}\n  {footer}"))
    docs.append((100, f"{banner}\n   {footer}"))      # boilerplate-only
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r.text for r in strip_boilerplate(
        df, max_doc_frac=0.5).collect()}
    assert len(out) == 21
    for i in range(20):
        assert out[i] == (f"unique paragraph {i} alpha\n\n"
                          f"second thought {i}"), out[i]
    assert out[100] is None

    # per-source scoping: site B's 2 docs share a line that is NOT
    # boilerplate for site A's identical line (A has it in 1 of 3 docs)
    rows = [(1, "a", "shared line\nonly in one a doc"),
            (2, "a", "a body two"),
            (3, "a", "a body three"),
            (10, "b", "shared line\nb one"),
            (11, "b", "shared line\nb two")]
    df2 = spark.createDataFrame(rows, "doc_id long, src string, text string")
    out2 = {r.doc_id: r.text for r in strip_boilerplate(
        df2, by=["src"], max_doc_frac=0.6).collect()}
    assert out2[1].startswith("shared line")       # kept for source a
    assert out2[10] == "b one" and out2[11] == "b two"


def test_strip_markup(spark):
    """Regex-tier HTML stripping: scripts/styles vanish WITH contents,
    comments and tags drop, block closers keep paragraph breaks, named
    entities unescape with &amp; last (double-escaped text stays
    escaped), numeric refs degrade to a space, whitespace collapses but
    newline structure survives; malformed markup degrades, never
    errors."""
    from nasctn_sea_ingest_spark.operators.text import strip_markup

    html = ("<html><head><STYLE>p{color:red}</STYLE>"
            "<script type='x'>alert('evil');\nmore()</script></head>"
            "<body><!-- hidden -->"
            "<h1>Title</h1><p>First &amp; second &lt;tag&gt;.</p>"
            "<p>Q&quot;A&quot; &amp;lt;kept&gt; x&#65;y</p>"
            "<div>last<br>line</div><unclosed")
    out = strip_markup(spark.createDataFrame(
        [(1, html)], "doc_id long, text string")).first().text
    assert "alert" not in out and "color" not in out
    assert "hidden" not in out
    lines = out.split("\n")
    assert lines[0] == "Title"
    assert lines[1] == "First & second <tag>."
    assert 'Q"A" &lt;kept> x y' == lines[2]
    assert lines[3] == "last" and lines[4].startswith("line")
    # malformed trailing tag degrades to dropped text, not an error
    assert "<unclosed" not in out


def test_duplicate_spans_brute_force(spark):
    """text.duplicate_spans == a Python brute force of the Lee et al.
    ExactSubstr pass: stride-1 W-word windows, corpus-wide occurrence
    count >= min_count (same-doc self-repeats count), flagged
    positions merged into maximal spans; short docs drop out; window
    overlap/adjacency merging exact; min_count and window validated."""
    import pytest as _pytest

    from nasctn_sea_ingest_spark.operators.text import duplicate_spans

    W = 4
    docs = [
        # doc 1 and 2 share a 6-word verbatim run -> 3 overlapping
        # flagged windows each -> ONE merged span each
        (1, "aa bb cc dd ee ff unique1 tail1 words here"),
        (2, "prefix2 aa bb cc dd ee ff other2 stuff2"),
        # doc 3 repeats a 4-word run WITHIN itself (positions 1 and 8,
        # gap > W) -> two one-window spans in the same doc
        (3, "rr ss tt uu filler1 filler2 filler3 rr ss tt uu"),
        # doc 4: all-unique words, no flagged windows
        (4, "k1 k2 k3 k4 k5 k6 k7 k8"),
        # doc 5: shorter than the window
        (5, "too short now"),
    ]

    def ref():
        toks = {d: t.split() for d, t in docs}
        occ = {}
        for d, t in toks.items():
            for i in range(1, len(t) - W + 2):
                occ.setdefault(" ".join(t[i - 1:i - 1 + W]),
                               []).append((d, i))
        flagged = {}
        for s, hits in occ.items():
            if len(hits) >= 2:
                for d, i in hits:
                    flagged.setdefault(d, []).append(i)
        spans = set()
        for d, ps in flagged.items():
            ps = sorted(set(ps))
            start = prev = ps[0]
            nw = 1
            for p in ps[1:]:
                if p <= prev + W:
                    prev = p
                    nw += 1
                else:
                    spans.add((d, start, prev + W - 1, nw))
                    start = prev = p
                    nw = 1
            spans.add((d, start, prev + W - 1, nw))
        return spans

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.start_word, r.end_word, r.n_windows)
           for r in duplicate_spans(df, window=W).collect()}
    want = ref()
    assert got == want and got
    assert {d for d, *_ in got} == {1, 2, 3}      # 4 unique, 5 short
    assert len([s for s in got if s[0] == 3]) == 2  # self-repeat, 2 spans

    with _pytest.raises(ValueError, match="min_count"):
        duplicate_spans(df, window=W, min_count=1)
    with _pytest.raises(ValueError, match="window"):
        duplicate_spans(df, window=0)


def test_apply_span_removal(spark):
    """apply_span_removal: flagged spans dropped (every occurrence —
    the Lee et al. all-copies rule), full-span docs come back NULL,
    span-free docs pass through byte-verbatim (original whitespace
    intact), rewritten docs are single-space normalized."""
    from nasctn_sea_ingest_spark.operators.text import (
        apply_span_removal, duplicate_spans)

    W = 3
    docs = [
        (1, "x1 dup aa bb cc x2 x3"),
        (2, "y1 y2 dup aa bb cc"),
        (3, "dup aa bb cc"),               # entire doc is the span
        (4, "clean  doc   with   spaces"),  # no spans: verbatim
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = duplicate_spans(df, window=W)
    out = {r.doc_id: r.text
           for r in apply_span_removal(df, spans).collect()}
    # span = the 4-word run "dup aa bb cc" (two flagged overlapping
    # 3-windows merged) — removed from every doc that carries it
    assert out[1] == "x1 x2 x3"
    assert out[2] == "y1 y2"
    assert out[3] is None
    assert out[4] == "clean  doc   with   spaces"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(docs=st.lists(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=14)
    .map(" ".join),
    min_size=1, max_size=6), w=st.integers(2, 4))
def test_duplicate_spans_hypothesis(spark, docs, w):
    """Property: duplicate_spans + apply_span_removal == the Python
    ExactSubstr reference on random tiny-alphabet corpora (dense with
    chance duplicates — consecutive/overlapping/same-doc windows, the
    regimes a hand-written example can miss)."""
    from nasctn_sea_ingest_spark.operators.text import (
        apply_span_removal, duplicate_spans)

    rows = [(i, t) for i, t in enumerate(docs)]

    def ref_spans():
        occ = {}
        for d, t in rows:
            tk = t.split()
            for i in range(1, len(tk) - w + 2):
                occ.setdefault(" ".join(tk[i - 1:i - 1 + w]),
                               []).append((d, i))
        flagged = {}
        for hits in occ.values():
            if len(hits) >= 2:
                for d, i in hits:
                    flagged.setdefault(d, []).append(i)
        spans = set()
        for d, ps in flagged.items():
            ps = sorted(set(ps))
            start = prev = ps[0]
            nw = 1
            for p in ps[1:]:
                if p <= prev + w:
                    prev, nw = p, nw + 1
                else:
                    spans.add((d, start, prev + w - 1, nw))
                    start, prev, nw = p, p, 1
            spans.add((d, start, prev + w - 1, nw))
        return spans

    def ref_removed():
        spans = {}
        for d, s, e, _ in ref_spans():
            spans.setdefault(d, []).append((s, e))
        out = {}
        for d, t in rows:
            if d not in spans:
                out[d] = t
                continue
            tk = t.split()
            kept = [x for i, x in enumerate(tk, start=1)
                    if not any(s <= i <= e for s, e in spans[d])]
            out[d] = " ".join(kept) if kept else None
        return out

    df = spark.createDataFrame(rows, "doc_id long, text string")
    sp = duplicate_spans(df, window=w)
    got = {(r.doc_id, r.start_word, r.end_word, r.n_windows)
           for r in sp.collect()}
    assert got == ref_spans()
    got_txt = {r.doc_id: r.text
               for r in apply_span_removal(df, sp).collect()}
    assert got_txt == ref_removed()


def test_duplicate_spans_viral_window_autoswitch(spark):
    """r14 verdict #4: a VIRAL window (one phrase planted 10^5 times)
    must flip the flag stage from the one-scan COUNT window (whose
    per-hash count partition becomes one huge single task) to the
    map-side-combinable groupBy + semi-join form — automatically,
    with identical output, while a benign corpus keeps the one-scan
    plan.  The planted corpus drives the decision through the sample
    path (its length upper bound exceeds the test threshold)."""
    from nasctn_sea_ingest_spark.operators.text import duplicate_spans

    W = 3
    phrase = "vx vy vz"
    # 2000 docs x 50 phrase repeats = 10^5 occurrences of one window
    docs = [(d, " ".join(phrase for _ in range(50)))
            for d in range(2000)]
    docs += [(9000 + d, f"u{d}a u{d}b u{d}c u{d}d") for d in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    auto = duplicate_spans(df, window=W, flag_strategy="auto",
                           viral_window_threshold=50_000)
    plan = auto._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan         # switched to the groupby form
    win = duplicate_spans(df, window=W, flag_strategy="window")
    wplan = win._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" not in wplan
    got_a = {(r.doc_id, r.start_word, r.end_word, r.n_windows)
             for r in auto.collect()}
    got_w = {(r.doc_id, r.start_word, r.end_word, r.n_windows)
             for r in win.collect()}
    assert got_a == got_w             # identical output, either plan

    # benign corpus above the length bound but with no hot hash:
    # the sampler keeps the one-scan plan
    benign = spark.createDataFrame(
        [(d, " ".join(f"b{d}w{i}" for i in range(60)))
         for d in range(2000)], "doc_id long, text string")
    kept = duplicate_spans(benign, window=W, flag_strategy="auto",
                           viral_window_threshold=50_000)
    kplan = kept._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" not in kplan

    with pytest.raises(ValueError, match="flag_strategy"):
        duplicate_spans(df, window=W, flag_strategy="bogus")


def test_span_dup_ratio(spark):
    """dup_ratio == summed disjoint-span lengths / token count; 0.0
    for span-free docs; a fully-duplicated doc reads 1.0; NULL text
    (apply_span_removal's fully-removed convention) reads n_tokens=0
    — not the -1 that size(NULL) yields under the non-ANSI default
    (r14 ADVICE)."""
    from nasctn_sea_ingest_spark.operators.text import (
        duplicate_spans, span_dup_ratio)

    W = 3
    docs = [(1, "aa bb cc dd x1 x2 x3 x4"),   # 4 of 8 dup -> 0.5
            (2, "y1 aa bb cc dd y2"),         # 4 of 6
            (3, "aa bb cc dd"),               # 4 of 4 -> 1.0
            (4, "u1 u2 u3 u4 u5")]            # none -> 0.0
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sp = duplicate_spans(df, window=W)
    got = {r.doc_id: (r.n_tokens, r.dup_tokens, round(r.dup_ratio, 6))
           for r in span_dup_ratio(df, sp).collect()}
    assert got == {1: (8, 4, 0.5), 2: (6, 4, round(4 / 6, 6)),
                   3: (4, 4, 1.0), 4: (5, 0, 0.0)}

    # a removal-stage survivor frame: doc 3 came back NULL (fully
    # removed); its ratio row must read (0, 0, 0.0)
    removed = spark.createDataFrame(
        [(3, None), (4, "u1 u2 u3 u4 u5")], "doc_id long, text string")
    got2 = {r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_ratio)
            for r in span_dup_ratio(
                removed, sp.where(F.lit(False))).collect()}
    assert got2 == {3: (0, 0, 0.0), 4: (5, 0, 0.0)}
