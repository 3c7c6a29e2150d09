"""Text-analysis operators for training-data pipelines: token statistics,
quality scoring, language ID, fingerprinting, token-count estimation.
Library form of the corpus queries q27–q29 — pure JVM column expressions,
so they run inside the scan at any scale (no UDFs, no shuffles beyond the
caller's).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions import _let

__all__ = ["token_stats", "quality_score", "language_id", "fingerprint",
           "token_count_estimate", "scrub_pii", "contamination",
           "bloom_contamination", "bloom_bitmask", "bloom_probe",
           "chunk_dedup", "repetition_stats", "chunk_overlap", "duplicate_spans", "apply_span_removal", "span_dup_ratio",
           "cdc_chunks_expr", "cdc_chunk_dedup",
           "train_bigram_lm", "lm_perplexity", "compression_ratio",
           "PII_PATTERNS", "STOPWORDS", "LANG_MARKERS"]

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "that", "it", "for")

# tiny high-frequency function-word lexicons (language-ID heuristic)
LANG_MARKERS = {
    "en": ("the", "of", "and", "is", "to", "in"),
    "fr": ("le", "la", "et", "est", "les", "des"),
    "es": ("el", "los", "y", "es", "las", "una"),
    "de": ("der", "die", "und", "ist", "das", "ein"),
}


def _words(text_col) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), r"\s+")


def _hits(w: Column, vocab) -> Column:
    lst = F.array(*[F.lit(x) for x in vocab])
    return F.size(F.filter(w, lambda x: F.array_contains(lst, x)))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds token-level statistics: n_tokens, n_distinct, type-token ratio,
    avg token length, stopword ratio (q27 semantics)."""
    w = _words(text_col)
    n = F.size(w)
    return (df.withColumn("n_tokens", n)
              .withColumn("n_distinct", F.size(F.array_distinct(w)))
              .withColumn("ttr", F.col("n_distinct") / F.col("n_tokens"))
              .withColumn(
                  "avg_tok_len",
                  F.aggregate(w, F.lit(0), lambda a, x: a + F.length(x))
                  / F.col("n_tokens"))
              .withColumn("stopword_ratio",
                          _hits(w, STOPWORDS) / F.col("n_tokens")))


def quality_score(df: DataFrame, text_col: str = "text",
                  min_tokens: int = 5, max_avg_tok_len: float = 12.0,
                  min_stopword_ratio: float = 0.02) -> DataFrame:
    """Composite document-quality heuristics (C4/Gopher-style rules as
    column math): length gate, token-length sanity, function-word presence,
    alpha ratio, repetition (1 − ttr). Adds per-rule booleans and a [0,1]
    ``quality`` score."""
    d = token_stats(df, text_col)
    c = F.col(text_col)
    alpha_ratio = (F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
                   / F.greatest(F.length(c), F.lit(1)))
    checks = {
        "ok_len": F.col("n_tokens") >= min_tokens,
        "ok_tok_len": F.col("avg_tok_len") <= max_avg_tok_len,
        "ok_stopwords": F.col("stopword_ratio") >= min_stopword_ratio,
        "ok_alpha": alpha_ratio >= 0.6,
        "ok_repetition": F.col("ttr") >= 0.2,
    }
    d = d.withColumn("alpha_ratio", alpha_ratio)
    for name, cond in checks.items():
        d = d.withColumn(name, cond)
    score = sum(F.when(F.col(n), 1).otherwise(0) for n in checks) \
        / F.lit(float(len(checks)))
    return d.withColumn("quality", score)


def language_id(df: DataFrame, text_col: str = "text",
                markers: dict | None = None) -> DataFrame:
    """Function-word language-ID heuristic (q28 semantics, extensible
    lexicons): argmax of per-language marker hits, 'und' on ties/zero."""
    markers = markers or LANG_MARKERS
    w = _words(text_col)
    d = df
    for lang, vocab in markers.items():
        d = d.withColumn(f"__{lang}", _hits(w, vocab))
    langs = list(markers)
    best = F.greatest(*[F.col(f"__{l}") for l in langs])
    n_best = sum(F.when(F.col(f"__{l}") == best, 1).otherwise(0)
                 for l in langs)
    guess = F.lit("und")
    for l in langs:  # first maximum wins; ties → 'und' via n_best guard
        guess = F.when((F.col(f"__{l}") == best) & (best > 0)
                       & (n_best == 1), l).otherwise(guess)
    return d.withColumn("guessed_lang", guess).drop(
        *[f"__{l}" for l in langs])


def fingerprint(df: DataFrame, text_col: str = "text",
                mod: int = 1_000_000_007) -> DataFrame:
    """Order-sensitive rolling polynomial hash over the token stream (q29):
    near-free change detection / shard-stable doc identity."""
    w = _words(text_col)
    token_h = F.transform(
        w, lambda x: (F.length(x) * 131 + F.ascii(x)).cast("bigint"))
    rolled = F.aggregate(token_h, F.lit(0).cast("bigint"),
                         lambda a, b: (a * 31 + b) % mod)
    return df.withColumn("fingerprint", rolled)


def token_count_estimate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two LLM-token-count estimators: whitespace words and a BPE-ish
    subword estimate (word-piece regex: alpha runs, digit runs, single
    punctuation — close to GPT-style pre-tokenization granularity)."""
    c = F.col(text_col)
    words = _words(text_col)
    pieces = F.regexp_extract_all(
        c, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0)
    # subword upper bound: alpha runs split to ~4-char BPE pieces
    bpe_ish = F.aggregate(
        pieces, F.lit(0),
        lambda a, p: a + F.when(p.rlike("^[A-Za-z]+$"),
                                F.ceil(F.length(p) / 4).cast("int"))
                          .otherwise(F.lit(1)))
    return (df.withColumn("n_words", F.size(words))
              .withColumn("n_tokens_bpe_est", bpe_ish))


# portable PII patterns: plain character classes only (no lookarounds, no
# \d/\w shorthand-class dialect differences) so Java (Spark) and RE2-ish
# (DuckDB) engines match the same spans — oracle-checked by q58
PII_PATTERNS = {
    "EMAIL": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",
    "PHONE": "[+]?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}[- .]?[0-9]{0,4}",
    "IPV4": "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
    "SSN": "[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def scrub_pii(df: DataFrame, text_col: str = "text",
              patterns: "dict[str, str] | None" = None,
              out_col: str | None = None) -> DataFrame:
    """Redact PII spans with ``[TYPE]`` placeholders — the pre-training
    scrub pass of an LLM data pipeline. Pure chained ``regexp_replace``
    (map-only, codegen, no shuffle); order is dict order, so put more
    specific patterns (SSN before PHONE) first when they overlap."""
    patterns = PII_PATTERNS if patterns is None else patterns
    c = F.col(text_col)
    for name, pat in patterns.items():
        c = F.regexp_replace(c, pat, f"[{name}]")
    return df.withColumn(out_col or text_col, c)


def chunk_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", chunk_words: int = 10) -> DataFrame:
    """Corpus-wide exact chunk dedup (Lee et al. 2022, *Deduplicating
    Training Data Makes Language Models Better*, at fixed word-chunk
    granularity instead of suffix-array substrings): split every document
    into non-overlapping ``chunk_words``-word chunks, keep only the FIRST
    occurrence of each repeated chunk (global order = (id, chunk_idx)),
    and reassemble documents from the surviving chunks.

    Returns ``(id_col, n_chunks, n_kept, text_clean)``; ``text_clean`` is
    NULL when every chunk of the document was a repeat (fully boilerplate
    documents vanish — the Lee-et-al. behavior).

    Scale shape: chunks are built by ARRAY SLICING inside the scan (a
    ``transform`` over chunk indices), so the only explode emits one row
    per CHUNK — ``chunk_words``× fewer rows than a per-word posexplode,
    and no (doc, chunk_idx) re-assembly shuffle (an earlier explode-words
    → groupBy-chunk variant measured ~2× slower end-to-end). One shuffle
    on the chunk text (the dedup key — the chunk must travel anyway), one
    shuffle back on the doc id. Chunk occurrence ranking is a window over
    the chunk key; skew = identical boilerplate chunks, bounded by corpus
    repetition, the quantity this operator removes. Oracle-checked as
    corpus q88.
    """
    from pyspark.sql import Window

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), " "))
    ch = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(chunks).alias("chunk_idx", "chunk"))
    win = Window.partitionBy("chunk").orderBy("__id", "chunk_idx")
    ranked = ch.withColumn("rn", F.row_number().over(win))
    kept = F.when(F.col("rn") == 1, F.struct("chunk_idx", "chunk"))
    return (ranked.groupBy("__id")
            .agg(F.count("*").alias("n_chunks"),
                 # count(non-null when), not sum(int): both engines emit
                 # BIGINT (DuckDB's sum(INT) is HUGEINT → dtype mismatch)
                 F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept"),
                 F.nullif(F.array_join(
                     F.transform(F.array_sort(F.collect_list(kept)),
                                 lambda s: s["chunk"]), " "),
                     F.lit("")).alias("text_clean"))
            .withColumnRenamed("__id", id_col))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     top_bigram_max: float = 0.20,
                     dup_trigram_max: float = 0.30) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    table A1): fraction of all word bigrams taken by the single most
    frequent bigram, and fraction of trigram occurrences that are
    duplicates; ``repetitive`` flags documents over either threshold.

    Pure column expressions — no shuffle, no UDF; runs inside the scan.
    The top-bigram count is a single O(n log n) pass: sort the bigram
    array, then a run-length ``aggregate`` over the sorted runs (state is
    three scalars, not a frequency map — memory stays O(1) beyond the
    array the row already holds, where a distinct×scan expression would be
    O(n²) on long documents). n-gram streams are zip_with/arrays_zip of
    shifted slices, evaluated once per row (an ``element_at`` lambda would
    re-evaluate the split per gram after CollapseProject inlining).
    Oracle-checked as corpus q91.
    """
    w = _words(text_col)
    m = F.greatest(F.size(w) - 1, F.lit(0))
    bg = F.zip_with(F.slice(w, 1, m), F.slice(w, 2, m),
                    lambda a, b: F.concat(a, F.lit(" "), b))
    m3 = F.greatest(F.size(w) - 2, F.lit(0))
    tg = F.transform(
        F.arrays_zip(F.slice(w, 1, m3), F.slice(w, 2, m3),
                     F.slice(w, 3, m3)),
        lambda s: F.concat(s["0"], F.lit(" "), s["1"], F.lit(" "), s["2"]))
    run0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"))
    top_bg = F.aggregate(
        F.array_sort(bg), run0,
        lambda st, x: F.struct(
            x.alias("prev"),
            F.when(x == st["prev"], st["run"] + 1).otherwise(F.lit(1))
             .alias("run"),
            F.greatest(st["best"],
                       F.when(x == st["prev"], st["run"] + 1)
                        .otherwise(F.lit(1))).alias("best")),
        lambda st: st["best"])
    n_bi, n_tri = F.size(bg), F.size(tg)
    frac_top = F.when(n_bi > 0, top_bg.cast("double") / n_bi)
    frac_dup = F.when(
        n_tri > 0,
        1.0 - F.size(F.array_distinct(tg)).cast("double") / n_tri)
    return (df.withColumn("n_bigrams", n_bi)
              .withColumn("top_bigram_frac", frac_top)
              .withColumn("dup_trigram_frac", frac_dup)
              .withColumn("repetitive",
                          F.coalesce(frac_top > top_bigram_max, F.lit(False))
                          | F.coalesce(frac_dup > dup_trigram_max,
                                       F.lit(False))))


def gate_flags_fast(df: DataFrame, text_col: str = "text",
                    min_tokens: int = 5, max_avg_tok_len: float = 12.0,
                    min_stopword_ratio: float = 0.02,
                    top_bigram_max: float = 0.20,
                    dup_trigram_max: float = 0.30) -> DataFrame:
    """Fused Arrow fast path for the pipeline's quality + repetition gate:
    ONE ``mapInPandas`` pass adding ``quality`` (the ``quality_score``
    composite) and ``repetitive`` (the ``repetition_stats`` flag), value-
    identical to the column-expression forms (pinned by
    ``test_gate_flags_fast_parity``).

    Why a UDF when the library rule is "stay JVM-side": the expression
    forms are higher-order array lambdas, which Catalyst evaluates
    INTERPRETED (never whole-stage codegen) at ~0.5 ms/doc; one
    Arrow-batched pass over the same documents measures ~5× faster and
    keeps the stage map-only. Use the expression forms where a Column is
    required (streaming selects, SQL parity); use this in batch pipelines
    where the gate is a full-scan bottleneck.

    The word splitter mirrors Java's ``\\s`` class (`` \\t\\n\\x0B\\f\\r``)
    exactly — Python's unicode-aware ``\\s`` would diverge on exotic
    whitespace."""
    import re
    from collections import Counter

    n_checks = 5.0
    java_ws = re.compile(r"[ \t\n\x0B\f\r]+")
    non_alpha = re.compile(r"[^A-Za-z]")
    stops = frozenset(STOPWORDS)

    def _flags(text: str) -> tuple:
        if text is None:
            return None, None
        w = java_ws.split(text.strip(" ")) if text.strip(" ") else [""]
        n = len(w)
        ttr = len(set(w)) / n
        score = ((n >= min_tokens)
                 + (sum(map(len, w)) / n <= max_avg_tok_len)
                 + (sum(x in stops for x in w) / n >= min_stopword_ratio)
                 + (len(non_alpha.sub("", text)) / max(len(text), 1) >= 0.6)
                 + (ttr >= 0.2)) / n_checks
        rep = False
        if n >= 2:
            top = Counter(zip(w, w[1:])).most_common(1)[0][1]
            rep = top / (n - 1) > top_bigram_max
        if not rep and n >= 3:
            tg = list(zip(w, w[1:], w[2:]))
            rep = 1.0 - len(set(tg)) / (n - 2) > dup_trigram_max
        return score, rep

    from pyspark.sql.types import BooleanType, DoubleType, StructField, \
        StructType
    schema = StructType(list(df.schema.fields)
                        + [StructField("quality", DoubleType()),
                           StructField("repetitive", BooleanType())])

    def _run(batches):
        import pandas as pd
        for pdf in batches:
            out = [_flags(t) for t in pdf[text_col]]
            pdf = pdf.copy()
            pdf["quality"] = pd.Series([q for q, _ in out], dtype="float64")
            pdf["repetitive"] = pd.Series([r for _, r in out],
                                          dtype="object")
            yield pdf

    return df.mapInPandas(_run, schema)


def contamination(train: DataFrame, eval_df: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 13, broadcast_eval: bool = True) -> DataFrame:
    """Train/eval decontamination: training documents that share at least
    one word ``n``-gram with the evaluation set, with the count of shared
    distinct shingles — the standard pre-training hygiene pass (flag, then
    drop or audit, before any benchmark is trusted).

    ``n`` defaults to 13 tokens, the GPT-3/Pile-style decontamination
    window: long enough that an overlap means the eval text itself
    appears, not a common phrase (short n on boilerplate-heavy corpora
    flags nearly everything — corpus q74 uses n=3 against its SQL oracle
    precisely because the synthetic docs are template-generated).

    Shape: distinct shingles per side, equi-join on the shingle, count per
    train doc. The eval side of a decontamination run is benchmarks —
    thousands of docs, not billions — so its distinct-shingle frame
    broadcasts (``broadcast_eval=True``) and the pass is map-side against
    the full training corpus: no shuffle of train shingles at all. With a
    large eval side it degrades to one hash join keyed by shingle.
    Oracle-checked as corpus q74.
    """
    from .dedup import shingle

    # spread=False: the broadcast path is map-side over the train corpus's
    # own input splits; a repartition here would shuffle every token array
    tr = shingle(train, text_col, id_col, n, spread=False)
    ev = (shingle(eval_df, text_col, id_col, n, spread=False)
          .select("shingle").distinct())
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (tr.join(ev, "shingle")
              .groupBy("id")
              .agg(F.count("*").alias("n_shared_shingles"))
              .withColumnRenamed("id", id_col))


def bloom_contamination(train: DataFrame, eval_df: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 13, n_bits: int = 1 << 23,
                        n_hashes: int = 4) -> DataFrame:
    """:func:`contamination` with a Bloom-filter prefilter — the same
    EXACT output (train docs sharing >= 1 word ``n``-gram with the
    eval set, with the shared-distinct-shingle count), built for the
    regime where the eval side outgrows a raw broadcast.

    ``contamination(broadcast_eval=True)`` ships the eval set's
    distinct shingle STRINGS to every task: 13-gram shingles run
    ~80-100 bytes each, so 10M eval shingles is ~1 GB of broadcast —
    past every practical driver/executor limit long before the eval
    side stops being "small".  This form broadcasts a fixed-size
    bitmask frame instead: ``n_bits`` bits packed 64/row as
    ``(word_idx, mask)`` longs — ``n_bits = 2^23`` is 128 Ki rows
    (~2 MB serialized) REGARDLESS of eval size, with false-positive
    rate (1 - e^(-k*n_ev/m))^k (~0.24 % at 10:1 bits-per-shingle,
    k = 4).  The pipeline:

    1. BUILD: explode each distinct eval shingle into ``n_hashes``
       bit positions (``pmod(xxhash64(shingle, seed_i), n_bits)``),
       pack into masks with one ``bit_or`` hash aggregate — cost
       O(eval shingles), output bounded by CONFIG (which is why the
       mandatory ``F.broadcast`` is safe here, unlike the
       data-proportional vertex frames of the r8 media lesson).
    2. PROBE: the full train shingle stream checks all ``n_hashes``
       bits via ``n_hashes`` broadcast equi-joins on word_idx —
       map-side over the train corpus's own input splits, NO shuffle
       of train shingles (``spread=False``, the contamination
       discipline).
    3. VERIFY: only bloom survivors (true hits + the ~0.2 % false
       positives) equi-join the exact eval shingle frame, so the
       output is exact and the one shuffled relation is
       candidate-proportional, not corpus-proportional.

    Pinned equal to ``contamination`` on the same inputs by pytest,
    including under an adversarially tiny ``n_bits`` (high-FPR) where
    only the verify join keeps it exact."""
    from .dedup import shingle

    tr = shingle(train, text_col, id_col, n, spread=False)
    ev = (shingle(eval_df, text_col, id_col, n, spread=False)
          .select("shingle").distinct())
    bloom = bloom_bitmask(ev, n_bits=n_bits, n_hashes=n_hashes)
    return (bloom_probe(tr, bloom, ev, n_bits=n_bits,
                        n_hashes=n_hashes)
            .withColumnRenamed("id", id_col))


def _bloom_pos(i: int, n_bits: int):
    return F.pmod(F.xxhash64(F.col("shingle"), F.lit(i)),
                  F.lit(n_bits))


def bloom_bitmask(ev_shingles: DataFrame, n_bits: int = 1 << 23,
                  n_hashes: int = 4) -> DataFrame:
    """The ``(wd, mask)`` Bloom bitmask frame over a distinct
    ``shingle`` column — ``n_bits`` bits packed 64/row, built by one
    explode + one ``bit_or`` hash aggregate.  Config-bounded at
    n_bits/64 rows regardless of input size; shared by
    :func:`bloom_contamination` and ``streaming.decontam_stream``
    (which builds it ONCE off the static eval side and probes every
    micro-batch against it)."""
    if n_bits < 64:
        raise ValueError("n_bits must be >= 64")
    if n_hashes < 1:
        raise ValueError("n_hashes must be >= 1")
    return (ev_shingles.select(F.explode(F.array(
                *[_bloom_pos(i, n_bits) for i in range(n_hashes)]))
                .alias("p"))
            .select(F.shiftright("p", 6).alias("wd"),
                    F.col("p").bitwiseAND(F.lit(63)).alias("bit"))
            .groupBy("wd")
            .agg(F.bit_or(F.expr(
                "shiftleft(CAST(1 AS BIGINT), bit)")).alias("mask")))


def bloom_probe(shingles: DataFrame, bloom: DataFrame,
                ev_shingles: DataFrame, n_bits: int = 1 << 23,
                n_hashes: int = 4) -> DataFrame:
    """Probe an ``(id, shingle)`` stream against a
    :func:`bloom_bitmask` frame (``n_hashes`` map-side BROADCAST
    joins — zero shuffle of the probe side), then exact-verify
    survivors against the distinct eval shingle frame: returns
    ``(id, n_shared_shingles)``, exact (the verify join removes every
    false positive).  ``n_bits``/``n_hashes`` must match the mask's
    build geometry — a mismatch probes bits the build never set and
    silently misses (the semdedup geometry-manifest lesson; callers
    that persist a mask must persist its geometry)."""
    probe = shingles
    hit = F.lit(True)
    for i in range(n_hashes):
        p = _bloom_pos(i, n_bits)
        probe = probe.withColumn(f"__w{i}", F.shiftright(p, 6)) \
                     .withColumn(f"__b{i}",
                                 p.bitwiseAND(F.lit(63)))
        probe = probe.join(
            F.broadcast(bloom.select(F.col("wd").alias(f"__w{i}"),
                                     F.col("mask").alias(f"__m{i}"))),
            f"__w{i}", "left")
        hit = hit & F.expr(
            f"coalesce(shiftright(__m{i}, __b{i}) & 1, 0) = 1")
    survivors = probe.where(hit).select("id", "shingle")
    return (survivors.join(ev_shingles, "shingle")
            .groupBy("id")
            .agg(F.count("*").alias("n_shared_shingles")))


def chunk_overlap(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", size: int = 20,
                  stride: int = 10) -> DataFrame:
    """Overlapping word-window chunking (the RAG / retrieval-index
    chunker): windows of ``size`` words starting every ``stride`` words
    (``stride < size`` ⇒ ``size - stride`` words of overlap, the usual
    context-preservation trick). Chunk k covers words
    ``[k*stride, k*stride + size)``; the final window may be shorter, and
    every word belongs to ≥ 1 chunk.

    Returns one row per chunk: ``(id_col, chunk_idx, n_words, chunk)``.

    Scale shape: chunks are built by array slicing inside the scan (same
    pattern as :func:`chunk_dedup`) — one ``transform`` over start
    indices, one explode emitting a row per chunk. Map-only: no shuffle,
    full codegen around the explode, output size = input words ×
    (size/stride) amortized. Oracle-checked as corpus q105.
    """
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    words = F.split(F.trim(F.col(text_col)), r"\s+")

    def chunks(w):
        n = F.size(w)
        n_chunks = (F.ceil((F.greatest(n - size, F.lit(0)))
                           / F.lit(stride)) + 1).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda k: F.struct(
                k.alias("chunk_idx"),
                F.slice(w, k * stride + 1, size).alias("w")))

    c = F.explode(_let(words, chunks)).alias("c")
    return (df.where(F.trim(F.col(text_col)) != "")
              .select(id_col, c)
              .select(id_col, F.col("c.chunk_idx").alias("chunk_idx"),
                      F.size("c.w").alias("n_words"),
                      F.array_join("c.w", " ").alias("chunk")))


def cdc_chunks_expr(words: Column, target_words: int = 10,
                    min_words: int = 4, max_words: int = 30) -> Column:
    """Content-defined chunking of a word array (the Rabin/FastCDC idea
    at word granularity): a word ENDS a chunk when ``xxhash64(word) mod
    target_words == 0`` — the boundary decision depends on the word's
    CONTENT, not its position, so an insertion near the start of a
    document perturbs chunks only until the next content boundary and
    every later chunk is byte-identical again (fixed-size chunking
    shifts ALL downstream chunks, defeating chunk-level dedup on any
    edited re-crawl).  ``min_words``/``max_words`` bound chunk sizes
    (boundaries inside a too-short chunk are skipped; a too-long chunk
    force-splits) — the guards are chunk-local, so streams still resync
    one boundary after any edit.

    One ``aggregate`` fold per row — JVM-side, zero shuffle; expected
    chunk length ≈ ``min_words + target_words``.  Returns
    ``array<string>`` of space-joined chunks (lossless:
    ``array_join(chunks, ' ') == array_join(words, ' ')``)."""
    init = F.struct(
        F.array().cast("array<string>").alias("done"),
        F.lit("").alias("cur"),
        F.lit(0).alias("n"))

    def step(acc, w):
        n2 = acc["n"] + 1
        joined = F.when(acc["n"] == 0, w).otherwise(
            F.concat(acc["cur"], F.lit(" "), w))
        cut = ((n2 >= min_words)
               & (F.pmod(F.xxhash64(w), F.lit(target_words)) == 0)) \
            | (n2 >= max_words)
        return F.struct(
            F.when(cut, F.concat(acc["done"], F.array(joined)))
             .otherwise(acc["done"]).alias("done"),
            F.when(cut, F.lit("")).otherwise(joined).alias("cur"),
            F.when(cut, F.lit(0)).otherwise(n2).alias("n"))

    return F.aggregate(
        words, init, step,
        lambda acc: F.when(acc["n"] > 0,
                           F.concat(acc["done"], F.array(acc["cur"])))
                     .otherwise(acc["done"]))


def cdc_chunk_dedup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", target_words: int = 10,
                    min_words: int = 4,
                    max_words: int = 30) -> DataFrame:
    """:func:`chunk_dedup` (Lee et al. exact chunk dedup, corpus q88)
    over CONTENT-DEFINED chunks: because boundaries resync after edits,
    a re-crawled document with an inserted preamble still shares almost
    all its chunks with the original and dedups — the fixed-size
    variant's chunks all shift and nothing matches (asserted head-to-
    head in the test).  Same scale shape as q88: one shuffle on the
    chunk key, one back on the doc id; same output contract
    ``(id_col, n_chunks, n_kept, text_clean)``."""
    from pyspark.sql import Window

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    chunks = cdc_chunks_expr(words, target_words, min_words, max_words)
    ch = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(chunks).alias("chunk_idx", "chunk"))
    win = Window.partitionBy("chunk").orderBy("__id", "chunk_idx")
    ranked = ch.withColumn("rn", F.row_number().over(win))
    kept = F.when(F.col("rn") == 1, F.struct("chunk_idx", "chunk"))
    return (ranked.groupBy("__id")
            .agg(F.count("*").alias("n_chunks"),
                 F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept"),
                 F.nullif(F.array_join(
                     F.transform(F.array_sort(F.collect_list(kept)),
                                 lambda s: s["chunk"]), " "),
                     F.lit("")).alias("text_clean"))
            .withColumnRenamed("__id", id_col))


def train_bigram_lm(docs: DataFrame, text_col: str = "text",
                    min_count: int = 1
                    ) -> "tuple[DataFrame, DataFrame, int, int]":
    """Corpus bigram language model counts — the training half of the
    CCNet-style LM quality filter (q101 is the unigram form; a bigram LM
    separates fluent text from shuffled/garbled text that unigram
    statistics cannot).  Returns ``(unigrams(tok, cnt),
    bigrams(tok1, tok2, cnt), total_tokens, vocab_size)``.

    Plan: one tokenize pass; unigram counts are a hash-agg; bigrams come
    from zip-of-shifted-slices (the q87 pair stream — one row per
    bigram, no per-word posexplode) into a second hash-agg.  Both tables
    are vocabulary-bound, not corpus-bound.  ``min_count`` prunes the
    bigram tail (the usual LM size/quality trade)."""
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda x: x != "")
    toks = docs.select(words.alias("w"))
    uni = (toks.select(F.explode("w").alias("tok"))
           .groupBy("tok").agg(F.count("*").cast("long").alias("cnt")))
    n_minus1 = F.greatest(F.size("w") - 1, F.lit(0))
    pairs = toks.select(F.explode(F.zip_with(
        F.slice("w", 1, n_minus1), F.slice("w", 2, n_minus1),
        lambda a, b: F.struct(a.alias("tok1"), b.alias("tok2"))))
        .alias("p"))
    bi = (pairs.groupBy("p.tok1", "p.tok2")
          .agg(F.count("*").cast("long").alias("cnt"))
          .where(F.col("cnt") >= min_count))
    totals = uni.agg(F.sum("cnt").alias("t"),
                     F.count("*").alias("v")).first()
    return uni, bi, int(totals.t), int(totals.v)


def lm_perplexity(docs: DataFrame, unigrams: DataFrame,
                  bigrams: DataFrame, total_tokens: int, vocab: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  l_bi: float = 0.6, l_uni: float = 0.3) -> DataFrame:
    """Per-document interpolated-bigram perplexity:
    ``p(w2|w1) = l_bi*cnt(w1,w2)/cnt(w1) + l_uni*cnt(w2)/N +
    (1-l_bi-l_uni)/V`` — the uniform floor keeps OOV transitions finite
    without smoothing hyperparameters.  Returns
    ``(id_col, n_bigrams, avg_logprob, perplexity)`` with perplexity =
    ``2^(-avg log2 p)``; single-word/empty docs get NULLs.

    Plan: one bigram stream per doc (zip-of-slices), one shuffle join
    against the bigram table on (tok1, tok2) and one against the unigram
    table per side — all vocabulary-bound relations; the per-doc
    aggregate is a hash-agg on the id.  The scored filter drops
    high-perplexity (garbled / out-of-domain) documents, the standard
    second gate after the cheap heuristics in ``quality_score``."""
    l_floor = 1.0 - l_bi - l_uni
    if l_floor <= 0:
        raise ValueError("l_bi + l_uni must be < 1 (uniform floor)")
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda x: x != "")
    n_minus1 = F.greatest(F.size("w") - 1, F.lit(0))
    grams = (docs.select(F.col(id_col).alias("__id"), words.alias("w"))
             .select("__id", F.explode(F.zip_with(
                 F.slice("w", 1, n_minus1), F.slice("w", 2, n_minus1),
                 lambda a, b: F.struct(a.alias("tok1"),
                                       b.alias("tok2")))).alias("p"))
             .select("__id", "p.tok1", "p.tok2"))
    bi = bigrams.select("tok1", "tok2",
                        F.col("cnt").alias("bi_cnt"))
    u1 = unigrams.select(F.col("tok").alias("tok1"),
                         F.col("cnt").alias("u1_cnt"))
    u2 = unigrams.select(F.col("tok").alias("tok2"),
                         F.col("cnt").alias("u2_cnt"))
    j = (grams.join(bi, ["tok1", "tok2"], "left")
         .join(u1, "tok1", "left")
         .join(u2, "tok2", "left"))
    p_bi = F.when(F.col("u1_cnt").isNotNull() & (F.col("u1_cnt") > 0),
                  F.coalesce(F.col("bi_cnt"), F.lit(0)).cast("double")
                  / F.col("u1_cnt")).otherwise(F.lit(0.0))
    p_uni = F.coalesce(F.col("u2_cnt"), F.lit(0)).cast("double") \
        / F.lit(float(total_tokens))
    p = (F.lit(l_bi) * p_bi + F.lit(l_uni) * p_uni
         + F.lit(l_floor / float(vocab)))
    scored = j.select("__id", (F.log2(p)).alias("lp"))
    return (scored.groupBy("__id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.avg("lp").alias("avg_logprob"),
                 F.pow(F.lit(2.0), -F.avg("lp")).alias("perplexity"))
            .withColumnRenamed("__id", id_col))


def compression_ratio(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      out_col: str = "zlib_ratio") -> DataFrame:
    """Per-document zlib compression ratio (compressed bytes / raw
    bytes) — the cheap whole-document repetitiveness signal used
    alongside the Gopher n-gram gates: templated/looping text
    compresses far below ~0.4 while natural prose sits near 0.5-0.8 and
    random strings near 1.0.  Complementary to
    :func:`repetition_stats`: zlib sees ANY repeated substring within
    its window, not just word n-grams.

    Row-local Arrow-batched pandas stage (zlib is stdlib C — ~GB/s per
    core; an expression form does not exist since Spark has no
    compress() SQL function).  Empty docs get ratio NULL.
    """
    import pandas as pd  # noqa: F401

    def run(batches):
        import zlib
        for b in batches:
            out = []
            for t in b[text_col]:
                raw = (t or "").encode("utf-8", "ignore")
                out.append(len(zlib.compress(raw, 6)) / len(raw)
                           if raw else None)
            b = b[[id_col]].copy()
            b[out_col] = out
            yield b

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        run, f"{id_col} {id_type}, {out_col} double")


def strip_boilerplate(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      by: "list[str] | None" = None,
                      max_doc_frac: float = 0.05, min_docs: int = 2,
                      min_line_chars: int = 1) -> DataFrame:
    """Corpus-frequency boilerplate removal (the CCNet/RefinedWeb line
    dedup): a LINE whose distinct-document frequency exceeds BOTH
    ``min_docs`` and ``max_doc_frac`` of the corpus is boilerplate —
    nav bars, cookie banners, license footers — and is stripped from
    every document, preserving the order (and blank-line structure) of
    what remains.  This is the INTER-document cleaning step next to the
    intra-document gates (``repetition_stats``) and chunk dedup
    (``chunk_dedup`` drops whole duplicate chunks; this surgically
    removes the shared lines and keeps the document).

    ``by`` scopes the frequency statistics (and the doc denominator)
    per group — boilerplate is domain-specific, and a line common on
    one site is signal on another.  Lines shorter than
    ``min_line_chars`` after trimming (default: empty lines) are never
    counted or removed.  The line KEY is the trimmed line's xxhash64
    (indentation variants collapse); reconstruction uses the raw line.

    Documents whose every eligible line was boilerplate keep a row with
    NULL text (the ``chunk_dedup`` convention — quarantine them, don't
    lose them).  Scale shape: one line explode, one distinct + hash
    aggregate for document frequencies (line-hash keyed — the shuffle
    carries hashes, not line text), one anti-join back, one per-doc
    ordered rebuild; no driver collect anywhere."""
    by = list(by or [])
    other = [c for c in df.columns if c != text_col]
    nd = (df.groupBy(*by).agg(
        F.countDistinct(id_col).alias("__nd"))
        if by else df.agg(F.countDistinct(id_col).alias("__nd")))
    lines = df.select(
        *other,
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")),
                             "\n")).alias("__pos", "__line"))
    elig = F.length(F.trim("__line")) >= min_line_chars
    key = F.xxhash64(*(by + [F.trim(F.col("__line"))]))
    freq = (lines.where(elig)
            .select(key.alias("__k"), *by, F.col(id_col))
            .distinct()
            .groupBy("__k", *by).agg(F.count("*").alias("__df")))
    hot = (freq.join(F.broadcast(nd), by) if by
           else freq.crossJoin(F.broadcast(nd)))
    hot = hot.where((F.col("__df") >= F.lit(int(min_docs)))
                    & (F.col("__df")
                       >= F.lit(float(max_doc_frac)) * F.col("__nd"))) \
             .select("__k")
    kept = (lines.withColumn("__k", F.when(elig, key))
            .join(hot, "__k", "left_anti"))
    rebuilt = (kept.groupBy(*other).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.struct("__pos", "__line"))),
                lambda s: s["__line"]),
            "\n").alias(text_col)))
    # fully-boilerplate docs dropped by the groupBy: restore with NULL
    # text, preserving every non-text column
    missing = df.select(*other).join(
        rebuilt.select(id_col), id_col, "left_anti") \
        .withColumn(text_col, F.lit(None).cast("string"))
    return rebuilt.select(*df.columns).unionByName(
        missing.select(*df.columns))


def strip_markup(df: DataFrame, text_col: str = "text",
                 out_col: "str | None" = None) -> DataFrame:
    """HTML/markup stripping — the step a web corpus runs before any
    quality gate: drops ``<script>``/``<style>`` elements WITH their
    contents, removes comments and remaining tags (block-level closers
    become newlines so paragraphs don't fuse), unescapes the five named
    entities (``&amp;`` last, so double-escaped text stays escaped —
    the lossless order), degrades numeric ``&#NN;`` references to a
    space, and collapses runs of spaces/tabs while PRESERVING newline
    structure for the line-level gates downstream
    (:func:`strip_boilerplate`).  Pure chained ``regexp_replace`` —
    map-side, codegen'd, zero shuffle, the ``scrub_pii`` shape.

    This is the deterministic regex tier, not a DOM parser: malformed
    nesting degrades to leftover text, never an error — the right
    trade for a quality-gated corpus where a parser exception would
    quarantine the whole document."""
    c = F.col(text_col)
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(
        c, r"(?i)</(p|div|li|tr|h[1-6])\s*>|<br\s*/?>", "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    # truncated documents end mid-tag: drop the unterminated tail too
    c = F.regexp_replace(c, r"(?s)<[^>]*$", " ")
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
                     ("&#39;", "'"), ("&apos;", "'")):
        c = F.regexp_replace(c, ent, rep)
    c = F.regexp_replace(c, r"&#\d+;", " ")
    c = F.regexp_replace(c, "&amp;", "&")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    out = out_col or text_col
    return df.withColumn(out, F.trim(c))


def _window_hashes(df: DataFrame, text_col: str, id_col: str,
                   W: int) -> DataFrame:
    """(__id, __pos, __h) for every stride-1 W-word window: xxhash64
    at emission so everything downstream moves 8-byte keys, never
    window strings (shared by :func:`duplicate_spans`' two flag
    strategies and its viral-window sampler)."""
    toks = (df.select(F.col(id_col).alias("__id"),
                      _words(text_col).alias("__w"))
            .where(F.size("__w") >= W))
    return (toks.select(
        "__id",
        F.posexplode(F.expr(
            f"transform(sequence(1, size(__w) - {W} + 1), "
            f"i -> xxhash64(array_join(slice(__w, i, {W}), ' ')))"))
        .alias("__p0", "__h"))
        .select("__id", (F.col("__p0") + 1).alias("__pos"), "__h"))


def _pick_flag_strategy(df: DataFrame, text_col: str, id_col: str,
                        W: int, threshold: int) -> str:
    """Choose duplicate_spans' flag plan: the one-scan COUNT window
    ("window") unless a VIRAL window (one phrase with >= ~threshold
    occurrences) would turn its per-hash count partition into a
    multi-second single task — then the map-side-combinable
    groupBy + semi-join form ("groupby"), which pays a second scan
    but distributes the hot key's count.

    Two cheap gates, so small corpora never pay a pre-flight scan:
    (1) an upper bound on TOTAL windows (sum of text lengths / 2 —
    every word costs >= 2 characters with its separator) below the
    threshold proves no single hash can reach it: pick "window" from
    one columnar length-sum.  (2) otherwise a seeded 1% document
    sample is windowed and its max per-hash count extrapolated; a
    10x safety margin biases toward "groupby" (two scans are linear;
    an undetected viral tail is the failure mode that matters).
    Deterministic for fixed input (seeded sample), so plan digests
    stay stable round to round."""
    ub = df.agg(F.sum(F.length(text_col))).first()[0] or 0
    if (int(ub) + 1) // 2 < int(threshold):
        return "window"
    frac = 0.01
    smax = (_window_hashes(df.sample(fraction=frac, seed=42),
                           text_col, id_col, W)
            .groupBy("__h").agg(F.count(F.lit(1)).alias("__n"))
            .agg(F.max("__n")).first()[0]) or 0
    if int(smax) / frac >= int(threshold) / 10:
        return "groupby"
    return "window"


def duplicate_spans(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", window: int = 12,
                    min_count: int = 2,
                    flag_strategy: str = "auto",
                    viral_window_threshold: int = 50_000_000
                    ) -> DataFrame:
    """Exact duplicate-SPAN detection across the corpus (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better" —
    the ExactSubstr pass): every word window of length ``window``
    (STRIDE 1, unlike :func:`chunk_dedup`'s chunk-aligned granularity)
    whose exact text occurs at least ``min_count`` times anywhere in
    the corpus is flagged, and each document's flagged positions are
    merged into MAXIMAL spans — the removal-ready form of exact
    substring dedup (drop/trim the span, keep the document), which
    catches verbatim boilerplate, licence blocks, and syndicated
    passages that document-level near-dup (MinHash) and chunk-level
    CDC both miss when they sit inside otherwise-distinct documents.

    Returns ``(id_col, start_word, end_word, n_windows)``: 1-based
    word indices, ``end_word`` inclusive, span length = end_word -
    start_word + 1; a span's windows all occur >= min_count times
    corpus-wide (same doc or cross-doc — a verbatim self-repeat is as
    harmful in training data as a cross-doc one).

    Plan: ONE scan, TWO shuffles.  Windows are hashed with
    ``xxhash64`` at emission so everything downstream moves 8-byte
    keys, never window strings; the corpus-wide occurrence count is a
    COUNT window over ``partitionBy(hash)`` (unordered — no per-hash
    sort), so flagging needs no self-join and the tokenized corpus is
    scanned exactly once (a groupBy + semi-join form re-derives the
    window frame on both sides of the join: two full scans — measured
    on the first cut of this operator).  Span merging is then a
    per-doc prefix-max window whose rows are bounded by document
    length.

    A VIRAL window (one phrase occurring 10^8 times) makes one count
    partition large — linear, count-only work, but a SINGLE task.
    ``flag_strategy`` governs it (r14 verdict #4 — a measured switch,
    not a comment): ``"window"`` = the one-scan plan above;
    ``"groupby"`` = the map-side-combinable groupBy(hash) count +
    semi-join form (two scans, no single-task tail — identical
    output); ``"auto"`` (default) picks via
    :func:`_pick_flag_strategy`: a columnar length-sum upper bound
    short-circuits small corpora to "window" with no extra scan, and
    past it a seeded 1% sample extrapolates the max per-hash count
    against ``viral_window_threshold`` (10x safety margin toward
    "groupby").  SCALE.md §41 A/Bs the two forms at the crossover.
    Hash-flagging accepts the minhash-family collision convention
    (2^-64 × pairs — a collision could over-flag one window); the
    DuckDB oracle groups by the window STRING, so a hash-green
    driver row also certifies collision-freedom on the checked
    data."""
    W = int(window)
    if W < 1:
        raise ValueError("window must be >= 1 word")
    if int(min_count) < 2:
        raise ValueError("min_count < 2 flags every window")
    if flag_strategy not in ("auto", "window", "groupby"):
        raise ValueError(f"unknown flag_strategy {flag_strategy!r}")
    from pyspark.sql import Window as _W
    strategy = flag_strategy
    if strategy == "auto":
        strategy = _pick_flag_strategy(
            df, text_col, id_col, W, viral_window_threshold)
    wins = _window_hashes(df, text_col, id_col, W)
    if strategy == "window":
        fpos = (wins.withColumn(
            "__n", F.count(F.lit(1)).over(_W.partitionBy("__h")))
            .where(F.col("__n") >= int(min_count))
            .select("__id", "__pos"))
    else:
        hot = (wins.groupBy("__h")
               .agg(F.count(F.lit(1)).alias("__n"))
               .where(F.col("__n") >= int(min_count))
               .select("__h"))
        fpos = (wins.join(hot, "__h", "semi")
                .select("__id", "__pos"))
    prev = _W.partitionBy("__id").orderBy("__pos") \
             .rowsBetween(_W.unboundedPreceding, -1)
    # windows at p and q (p < q) belong to one span iff q <= p + W
    # (they overlap or touch); first row of a doc always starts one
    brk = F.when(
        F.col("__pos") > F.coalesce(F.max("__pos").over(prev) + W,
                                    F.lit(-1)),
        F.lit(1)).otherwise(F.lit(0))
    run = _W.partitionBy("__id").orderBy("__pos") \
            .rowsBetween(_W.unboundedPreceding, 0)
    isl = (fpos.withColumn("__brk", brk)
           .withColumn("__g", F.sum("__brk").over(run)))
    return (isl.groupBy("__id", "__g")
            .agg(F.min("__pos").alias("start_word"),
                 (F.max("__pos") + F.lit(W - 1)).alias("end_word"),
                 F.count(F.lit(1)).alias("n_windows"))
            .select(F.col("__id").alias(id_col),
                    "start_word", "end_word", "n_windows"))


def apply_span_removal(df: DataFrame, spans: DataFrame,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Rewrite documents with :func:`duplicate_spans`' flagged spans
    REMOVED — the second half of the Lee et al. ExactSubstr pass
    (every occurrence of a duplicated span is dropped; the paper found
    removing all copies works as well as keep-one and is much simpler
    to distribute, since no occurrence needs to be elected keeper).

    Per doc the span list is collected to an array (bounded by
    doc-length/window spans) and the word array is filtered by
    position against it — one broadcast-able equi-join plus map-side
    higher-order expressions, no explode.  Rewritten text is
    single-space-joined surviving words (the :func:`chunk_dedup`
    whitespace-normalization convention); a doc whose every word sat
    in a span comes back with NULL text (the chunk_dedup drop
    convention — filter it out downstream); docs with NO spans pass
    through byte-verbatim (only rewritten docs lose their original
    whitespace)."""
    sp = (spans.groupBy(F.col(id_col).alias("__sid"))
          .agg(F.collect_list(F.struct(
              F.col("start_word").alias("s"),
              F.col("end_word").alias("e"))).alias("__sp")))
    j = df.join(sp, F.col(id_col) == F.col("__sid"), "left") \
          .drop("__sid")
    kept = F.filter(
        _words(text_col),
        lambda w, i: ~F.exists(
            "__sp", lambda s: (i + 1 >= s["s"]) & (i + 1 <= s["e"])))
    out = (j.withColumn("__kept", kept)
           .withColumn(text_col, F.when(
               F.col("__sp").isNull(), F.col(text_col))
               .when(F.size("__kept") == 0, F.lit(None))
               .otherwise(F.array_join("__kept", " ")))
           .drop("__sp", "__kept"))
    return out


def span_dup_ratio(df: DataFrame, spans: DataFrame,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document DUPLICATION RATIO from :func:`duplicate_spans`'
    output: ``dup_tokens / n_tokens`` — the RefinedWeb-style gate
    signal ("drop documents that are mostly duplicated text" instead
    of rewriting them; rewriting mid-document can leave disfluent
    splices, so heavy offenders are often better dropped whole).
    Adds ``n_tokens``, ``dup_tokens``, ``dup_ratio`` (0.0 for docs
    with no spans).  Merged spans are disjoint by construction, so
    summing their lengths is exact.  NULL text — the convention
    :func:`apply_span_removal` uses for fully-removed docs, exactly
    the rows most likely to flow in from that stage — counts as 0
    tokens (``size(NULL)`` is -1 under the non-ANSI default, a
    nonsense token count the r14 ADVICE flagged)."""
    per_doc = (spans.groupBy(F.col(id_col).alias("__rid"))
               .agg(F.sum(F.col("end_word") - F.col("start_word")
                          + 1).alias("__dup")))
    n = F.when(F.col(text_col).isNull(), F.lit(0)) \
         .otherwise(F.size(_words(text_col)))
    return (df.join(per_doc, F.col(id_col) == F.col("__rid"), "left")
            .drop("__rid")
            .withColumn("n_tokens", n)
            .withColumn("dup_tokens",
                        F.coalesce("__dup", F.lit(0)).cast("long"))
            .withColumn("dup_ratio",
                        F.col("dup_tokens")
                        / F.greatest(F.col("n_tokens"), F.lit(1)))
            .drop("__dup"))
