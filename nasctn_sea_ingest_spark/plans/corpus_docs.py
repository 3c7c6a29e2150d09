"""Document-pipeline query corpus: dedup (exact / n-gram Jaccard / MinHash-LSH
/ SimHash), text analysis (token stats, language-ID heuristic, fingerprint).

These are the LLM-training-data operators the 100 TB deployment needs
(BASELINE.json north star).  Every query is deterministic on both engines:
shingle/token ids are md5-derived integers (a standard hash both engines
compute identically — never an engine-specific hash), so MinHash/SimHash
signatures are bit-identical between Spark and DuckDB.  The id is computed
per occurrence with a scalar expression — fully distributive, no global
row_number sort and no vocabulary join, so the plan scales linearly.

Scale notes (100 TB): the shingle self-join shuffles on the shingle key —
at scale the corpus would first drop ultra-frequent shingles (stop-shingles)
to bound skew, and LSH banding replaces the all-pairs join entirely; the
MinHash query here demonstrates exactly that band-bucket join shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from .corpus import _q
from .tables import load_table, register_tables

P_MH = 2147483647          # minhash modulus (2^31 - 1)
N_HASH = 16                # minhash signature length
N_BANDS = 4                # LSH bands (4 rows per band)

# ---------------------------------------------------------------------------
# shared SQL fragments (dialect-specific tokenize/shingle CTEs)
# ---------------------------------------------------------------------------

# DuckDB: word 3-gram shingles, distinct per doc
_DUCK_SHINGLES = """
toks AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(w) - 2),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
  FROM toks WHERE len(w) >= 3
)"""

# Spark SQL: identical semantics. Grams are arrays_zip of shifted slices
# (split evaluated once per slice per ROW) — the per-gram element_at
# lambda re-evaluates the split for every reference after CollapseProject
# inlining (O(words) re-splits per gram; 10×+ slower, see
# operators/dedup._gram_stream). REPARTITION spreads the explode across
# cores when the input is one small parquet file.
_SPARK_SHINGLES = """
toks AS (SELECT /*+ REPARTITION(32, doc_id) */ doc_id,
                split(trim(text), ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         concat(s.`0`, ' ', s.`1`, ' ', s.`2`) AS shingle
  FROM (
    SELECT doc_id, explode(arrays_zip(
             slice(w, 1, greatest(size(w) - 2, 0)),
             slice(w, 2, greatest(size(w) - 2, 0)),
             slice(w, 3, greatest(size(w) - 2, 0)))) AS s
    FROM toks)
)"""


# Non-distinct variants for min-aggregating consumers (q25): duplicate
# shingles cannot change a min, and dropping the DISTINCT removes a whole
# (doc_id, shingle) exchange — the 16-way min partial-aggregates map-side
# to ≤16 values per doc per task before the only remaining shuffle
# (measured ~1.4× at sf0.1).
_DUCK_SHINGLES_ALL = _DUCK_SHINGLES.replace("SELECT DISTINCT doc_id,",
                                            "SELECT doc_id,")
_SPARK_SHINGLES_ALL = _SPARK_SHINGLES.replace("SELECT DISTINCT doc_id,",
                                              "SELECT doc_id,")


# portable shingle→integer hash: md5 is bit-identical on both engines; 15
# hex digits (60 bits) parse into a signed BIGINT without overflow, reduced
# mod P so the per-hash products below stay < 2^63 under ANSI mode
_SPARK_SID = f"cast(conv(substr(md5(shingle), 1, 15), 16, 10) as bigint) % {P_MH}"
_DUCK_SID = f"cast(('0x' || substr(md5(shingle), 1, 15)) as bigint) % {P_MH}"


def _minhash_aggs() -> str:
    """min((a_j*sid + b_j) % P) per hash j — identical string on both engines."""
    return ",\n       ".join(
        f"min((sid * {2 * j + 1} + {101 * j + 17}) % {P_MH}) AS h{j}"
        for j in range(N_HASH))


def _bands_cte() -> str:
    """Signatures unpivoted to one row per band (doc_id, band, c0..c3)."""
    return "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, "
        + ", ".join(f"h{4 * b + i} AS c{i}" for i in range(4))
        + " FROM mh"
        for b in range(N_BANDS))


def _band_join_select() -> str:
    """ONE bucket self-join on (band, chunk) + distinct replaces N_BANDS
    separate self-joins and their union — one shuffle stage instead of
    four, same candidate set."""
    cond = " AND ".join(f"a.c{i} = b.c{i}" for i in range(4))
    return (f"SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 "
            f"FROM bands a JOIN bands b "
            f"ON a.band = b.band AND {cond} AND a.doc_id < b.doc_id")


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

@_q("q23_dedup_exact",
    "exact dedup: hash-groupBy keep-min-id (LLM-pipeline op; analog of "
    "duplicate-capture drop in FIXTURES.md §8)",
    """
    SELECT md5(text) AS text_hash, min(doc_id) AS rep_doc_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """)
def q23(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (d.groupBy(F.md5("text").alias("text_hash"))
             .agg(F.min("doc_id").alias("rep_doc_id"),
                  F.count("*").alias("n_copies")))


@_q("q24_jaccard_neardup",
    "near-dup detection: word 3-gram shingles → self-join → exact Jaccard "
    "(LLM-pipeline op)",
    f"""
    WITH {_DUCK_SHINGLES},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT d1, d2,
           round(CAST(inter AS DOUBLE) / (s1.n + s2.n - inter), 6) AS jaccard
    FROM pairs
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
    WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.5
    """)
def q24(spark, sf_dir):
    register_tables(spark, sf_dir, ["documents"])
    return spark.sql(f"""
    WITH {_SPARK_SHINGLES},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT d1, d2,
           round(CAST(inter AS DOUBLE) / (s1.n + s2.n - inter), 6) AS jaccard
    FROM pairs
    JOIN sizes s1 ON s1.doc_id = d1
    JOIN sizes s2 ON s2.doc_id = d2
    WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.5
    """)


@_q("q25_minhash_lsh",
    "MinHash + LSH banding near-dup candidates: shingle→md5-id→16 minhashes"
    "→4 bands→bucket join (LLM-pipeline op, scale path for q24); the id is "
    "a scalar md5 expression, not a vocabulary rank — no global sort, no "
    "vocab join, one shuffle to the per-doc aggregate",
    f"""
    WITH {_DUCK_SHINGLES_ALL},
    j AS (SELECT doc_id, {_DUCK_SID} AS sid FROM sh),
    mh AS (SELECT doc_id, {_minhash_aggs()} FROM j GROUP BY doc_id),
    bands AS ({_bands_cte()})
    {_band_join_select()}
    """)
def q25(spark, sf_dir):
    register_tables(spark, sf_dir, ["documents"])
    return spark.sql(f"""
    WITH {_SPARK_SHINGLES_ALL},
    j AS (SELECT doc_id, {_SPARK_SID} AS sid FROM sh),
    mh AS (SELECT doc_id, {_minhash_aggs()} FROM j GROUP BY doc_id),
    bands AS ({_bands_cte()})
    {_band_join_select()}
    """)


N_SH_BITS = 32             # simhash signature width
N_SH_BANDS = 4             # 8-bit bands; pigeonhole: hamming<=3 ⇒ ≥1 equal band


def _simhash_bits_sql(intdiv: str) -> tuple[str, str]:
    """(per-bit signed sums, signature assembly); ``intdiv`` selects the
    dialect ('div' → Spark SQL, '//' → DuckDB). The bit tests use
    shift+mask (~20% faster than div/mod across the 32-expression
    aggregate; h is nonnegative so ``(h >> j) & 1 == (h div 2^j) % 2``),
    spelled per dialect: DuckDB has the ``>>`` operator, while Spark SQL
    only gained ``>>`` syntax in 4.0 — ``shiftright()`` keeps the
    declared pyspark>=3.5 floor."""
    shift = ("((h >> {j}) & 1)" if intdiv == "//"
             else "(shiftright(h, {j}) & 1)")
    return (
        ",\n         ".join(
            f"sum(CASE WHEN {shift.format(j=jj)} = 1 THEN cnt ELSE -cnt END) AS s{jj}"
            for jj in range(N_SH_BITS)),
        " + ".join(
            f"(CASE WHEN s{jj} > 0 THEN {1 << jj} ELSE 0 END)"
            for jj in range(N_SH_BITS)))


def _simhash_bands(intdiv: str) -> str:
    """Signature → one row per 8-bit band. The band-equality join is lossless
    for hamming<=3 (4 bands, ≤3 differing bits ⇒ some band is untouched), so
    it returns exactly the all-pairs result without the O(n²) cross join."""
    return "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {b} AS band, "
        f"(simhash {intdiv} {1 << (8 * b)}) % 256 AS chunk FROM sig"
        for b in range(N_SH_BANDS))


# the cheap bit_count filter runs on the raw band join BEFORE the distinct,
# so the dedup shuffle only carries pairs that already pass the hamming gate
_SIMHASH_SELECT = """
    cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
                    a.simhash AS sh1, b.simhash AS sh2
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.chunk = b.chunk
              AND a.doc_id < b.doc_id
             WHERE bit_count({xor_ab}) <= 3)
    SELECT DISTINCT d1, d2, CAST(bit_count({xor}) AS INTEGER) AS hamming
    FROM cand
"""


@_q("q26_simhash_hamming",
    "SimHash near-dup: frequency-weighted 32-bit signatures, 4-band "
    "pigeonhole LSH join (lossless for hamming<=3 — no all-pairs scan), "
    "exact Hamming verify (LLM-pipeline op)",
    None)  # oracle filled in below (needs generated SQL)
def q26(spark, sf_dir):
    register_tables(spark, sf_dir, ["documents"])
    bits, sig = _simhash_bits_sql("div")
    return spark.sql(f"""
    WITH t AS (SELECT doc_id, explode(split(trim(text), ' ')) AS tok FROM documents),
    tc AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY doc_id, tok),
    th AS (SELECT doc_id, cnt,
           cast(conv(substr(md5(tok), 1, 15), 16, 10) as bigint) % 4294967296 AS h
           FROM tc),
    bitsums AS (SELECT doc_id, {bits} FROM th GROUP BY doc_id),
    sig AS (SELECT doc_id, {sig} AS simhash FROM bitsums),
    bands AS ({_simhash_bands("div")}),
    {_SIMHASH_SELECT.format(xor_ab="a.simhash ^ b.simhash", xor="sh1 ^ sh2")}
    """)


def _q26_oracle() -> str:
    bits, sig = _simhash_bits_sql("//")
    return f"""
    WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
    tc AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY doc_id, tok),
    th AS (SELECT doc_id, cnt,
           cast(('0x' || substr(md5(tok), 1, 15)) as bigint) % 4294967296 AS h
           FROM tc),
    bitsums AS (SELECT doc_id, {bits} FROM th GROUP BY doc_id),
    sig AS (SELECT doc_id, {sig} AS simhash FROM bitsums),
    bands AS ({_simhash_bands("//")}),
    {_SIMHASH_SELECT.format(xor_ab="xor(a.simhash, b.simhash)", xor="xor(sh1, sh2)")}
    """


# patch the oracle in (generated SQL can't live in the decorator literal)
from .corpus import CORPUS as _CORPUS  # noqa: E402
for _entry in _CORPUS:
    if _entry.name == "q26_simhash_hamming":
        _entry.sql = _q26_oracle()


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

@_q("q27_text_stats",
    "text quality scoring: token count, distinct tokens, type-token ratio, "
    "avg token length, stopword ratio (LLM-pipeline op)",
    """
    WITH t AS (SELECT doc_id, n_chars, string_split(trim(text), ' ') AS w FROM documents)
    SELECT doc_id, n_chars,
           len(w) AS n_tokens,
           len(list_distinct(w)) AS n_distinct,
           round(len(list_distinct(w)) * 1.0 / len(w), 5) AS ttr,
           round(list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w), 5) AS avg_tok_len,
           round(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and'))) * 1.0 / len(w), 5) AS stopword_ratio
    FROM t
    """)
def q27(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    d = d.withColumn("w", F.split(F.trim(F.col("text")), " "))
    n = F.size("w")
    return d.select(
        "doc_id", "n_chars",
        n.alias("n_tokens"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        F.round(F.size(F.array_distinct("w")) * F.lit(1.0) / n, 5).alias("ttr"),
        F.round(F.expr("aggregate(transform(w, x -> length(x)), 0, (a, x) -> a + x)") * F.lit(1.0) / n, 5).alias("avg_tok_len"),
        F.round(F.size(F.expr("filter(w, x -> x IN ('the', 'a', 'of', 'and'))")) * F.lit(1.0) / n, 5).alias("stopword_ratio"))


@_q("q28_lang_id",
    "language-ID n-gram/stopword heuristic (LLM-pipeline op)",
    """
    WITH t AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS w FROM documents),
    s AS (SELECT doc_id, lang,
                 len(list_filter(w, x -> x IN ('the', 'of', 'and', 'is'))) AS en,
                 len(list_filter(w, x -> x IN ('le', 'la', 'et', 'est'))) AS fr,
                 len(list_filter(w, x -> x IN ('el', 'los', 'y', 'es'))) AS es,
                 len(list_filter(w, x -> x IN ('der', 'die', 'und', 'ist'))) AS de
          FROM t)
    SELECT doc_id, lang,
           CASE WHEN en > fr AND en > es AND en > de THEN 'en'
                WHEN fr > en AND fr > es AND fr > de THEN 'fr'
                WHEN es > en AND es > fr AND es > de THEN 'es'
                WHEN de > en AND de > fr AND de > es THEN 'de'
                ELSE 'und' END AS guessed_lang,
           en AS en_hits
    FROM s
    """)
def q28(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    d = d.withColumn("w", F.split(F.trim(F.col("text")), " "))
    def hits(words):
        lst = ", ".join(f"'{x}'" for x in words)
        return F.size(F.expr(f"filter(w, x -> x IN ({lst}))"))
    d = (d.withColumn("en", hits(["the", "of", "and", "is"]))
          .withColumn("fr", hits(["le", "la", "et", "est"]))
          .withColumn("es", hits(["el", "los", "y", "es"]))
          .withColumn("de", hits(["der", "die", "und", "ist"])))
    return d.select(
        "doc_id", "lang",
        F.when((F.col("en") > F.col("fr")) & (F.col("en") > F.col("es")) & (F.col("en") > F.col("de")), "en")
         .when((F.col("fr") > F.col("en")) & (F.col("fr") > F.col("es")) & (F.col("fr") > F.col("de")), "fr")
         .when((F.col("es") > F.col("en")) & (F.col("es") > F.col("fr")) & (F.col("es") > F.col("de")), "es")
         .when((F.col("de") > F.col("en")) & (F.col("de") > F.col("fr")) & (F.col("de") > F.col("es")), "de")
         .otherwise("und").alias("guessed_lang"),
        F.col("en").alias("en_hits"))


@_q("q29_fingerprint",
    "document fingerprint: rolling polynomial hash over token stream "
    "(LLM-pipeline op)",
    """
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents)
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(w, x -> CAST(len(x) * 131 + ascii(x) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
    FROM t
    """)
def q29(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    d = d.withColumn("w", F.split(F.trim(F.col("text")), " "))
    return d.select(
        "doc_id",
        F.expr("aggregate(transform(w, x -> cast(length(x) * 131 + ascii(x) as bigint)), "
               "cast(0 as bigint), (a, b) -> (a * 31 + b) % 1000000007)").alias("fingerprint"))


@_q("q67_vocab_topk",
    "vocabulary build: token explode → count → deterministic top-k (the "
    "first stage of any tokenizer-training / corpus-stats job; explode + "
    "hash-agg + TakeOrderedAndProject, never a global sort)",
    """
    SELECT tok, count(*) AS n FROM (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents)
    WHERE tok <> ''
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 100
    """)
def q67(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (d.select(F.explode(F.split(F.lower(F.trim(F.col("text"))),
                                       r"\s+")).alias("tok"))
             .where(F.col("tok") != "")
             .groupBy("tok").agg(F.count("*").alias("n"))
             .orderBy(F.desc("n"), F.asc("tok"))
             .limit(100))


@_q("q68_label_centroids",
    "per-label embedding centroid, long format: posexplode across rows + "
    "two-key hash-agg (the class-prototype / IVF-seed shape; exact decimal "
    "sums make the cross-row float reduction order-independent)",
    """
    SELECT label, dim,
           round(CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10)))
                      AS DOUBLE) / count(*), 6) AS centroid,
           count(*) AS n_vecs
    FROM (SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings)
    GROUP BY label, dim
    """)
def q68(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    return (ex.groupBy("label", (F.col("pos") + 1).alias("dim"))
              .agg(F.round(
                       F.sum(F.col("v").cast("double").cast("decimal(20,10)"))
                        .cast("double") / F.count("*"), 6).alias("centroid"),
                   F.count("*").alias("n_vecs")))


@_q("q69_tfidf_top_terms",
    "TF-IDF top-3 terms per document: token counts + document-frequency "
    "join + global-N scalar broadcast + per-doc ranked truncation (the "
    "keyword-extraction / relevance shape over the corpus)",
    """
    WITH toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents)
      WHERE tok <> ''),
    tf AS (SELECT doc_id, tok, count(*) AS cnt FROM toks
           GROUP BY doc_id, tok),
    df AS (SELECT tok, count(DISTINCT doc_id) AS dfreq FROM toks
           GROUP BY tok),
    n AS (SELECT count(*) AS total FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.cnt,
             tf.cnt * ln(CAST(n.total AS DOUBLE) / dfreq) AS tfidf
      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n),
    ranked AS (
      SELECT doc_id, tok, cnt, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, tok) AS rn
      FROM scored)
    SELECT doc_id, tok, cnt, round(tfidf, 6) AS tfidf
    FROM ranked WHERE rn <= 3
    """)
def q69(spark, sf_dir):
    from pyspark.sql import Window
    d = load_table(spark, sf_dir, "documents")
    toks = (d.select("doc_id",
                     F.explode(F.split(F.lower(F.trim(F.col("text"))),
                                       r"\s+")).alias("tok"))
             .where(F.col("tok") != ""))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
    dfreq = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("dfreq"))
    total = d.agg(F.count("*").alias("total"))
    scored = (tf.join(dfreq, "tok")
                .crossJoin(F.broadcast(total))
                .withColumn("tfidf",
                            F.col("cnt") * F.log(F.col("total")
                                                 .cast("double")
                                                 / F.col("dfreq"))))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (scored.withColumn("rn", F.row_number().over(w))
                  .where(F.col("rn") <= 3)
                  .select("doc_id", "tok", "cnt",
                          F.round("tfidf", 6).alias("tfidf")))


_DUCK_HB_DOC = ("cast(('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 15)) "
                "AS BIGINT) % 10000")


@_q("q74_decontaminate",
    "train/eval decontamination: train docs sharing a word 3-gram with the "
    "hash-held-out eval slice, via broadcastable distinct-shingle join "
    "(text.contamination; pre-training hygiene op)",
    f"""
    WITH {_DUCK_SHINGLES},
    b AS (SELECT doc_id, {_DUCK_HB_DOC} AS hb FROM documents),
    tr AS (SELECT sh.doc_id, shingle FROM sh JOIN b USING (doc_id)
           WHERE hb < 9000),
    ev AS (SELECT DISTINCT shingle FROM sh JOIN b USING (doc_id)
           WHERE hb >= 9000)
    SELECT tr.doc_id, count(*) AS n_shared_shingles
    FROM tr JOIN ev ON tr.shingle = ev.shingle
    GROUP BY tr.doc_id
    """)
def q74(spark, sf_dir):
    from ..operators.sampling import hash_bucket
    from ..operators.text import contamination
    d = load_table(spark, sf_dir, "documents")
    hb = hash_bucket("doc_id")
    return contamination(d.where(hb < 9000), d.where(hb >= 9000), n=3)


# BM25 constants (Okapi; Lucene's always-positive idf variant)
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("spark", "query", "merge")


@_q("q84_bm25_retrieval",
    "BM25 term-document relevance: per-term top-10 documents (Okapi "
    "k1=1.2 b=0.75, Lucene idf) — doc-length norm + document-frequency "
    "join, per-term ranked truncation; per-(term,doc) rows avoid "
    "cross-row float summation so both engines agree bit-for-bit",
    f"""
    WITH toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
        FROM documents)
      WHERE tok <> ''),
    dl AS (SELECT doc_id, count(*) AS dlen FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(sum(dlen) AS DOUBLE) / count(*) AS avgdl,
                     count(*) AS n_docs FROM dl),
    tf AS (SELECT doc_id, tok, count(*) AS tfreq FROM toks
           WHERE tok IN {str(tuple(_BM25_TERMS))} GROUP BY doc_id, tok),
    df AS (SELECT tok, count(DISTINCT doc_id) AS dfreq FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.tfreq,
             ln((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
               * (tfreq * ({_BM25_K1} + 1.0))
               / (tfreq + {_BM25_K1} * (1.0 - {_BM25_B}
                                        + {_BM25_B} * dlen / avgdl))
               AS score
      FROM tf JOIN df ON tf.tok = df.tok
      JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats),
    ranked AS (
      SELECT doc_id, tok, tfreq, score,
             row_number() OVER (PARTITION BY tok
                                ORDER BY score DESC, doc_id) AS rn
      FROM scored)
    SELECT tok, doc_id, tfreq, round(score, 6) AS bm25
    FROM ranked WHERE rn <= 10
    """)
def q84(spark, sf_dir):
    # One scan, NO token explode: doc length and per-query-term counts are
    # array expressions over the split (the query terms are a tiny literal
    # set, so counting them per doc is a map-side filter+size — the full
    # (doc, token) stream the naive plan shuffles twice never exists).
    # Corpus stats and per-term document frequencies fold into a single
    # one-row aggregate broadcast back; the per-term top-10 windows over
    # only the docs that contain a query term.
    from pyspark.sql import Window
    from ..functions import _let
    d = load_table(spark, sf_dir, "documents")
    w_arr = F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                     lambda x: x != "")
    def _count_term(t):  # bind via closure: a 2-arg lambda would be taken
        return lambda x: x == t  # as the (element, index) filter variant
    # let-bind the regex split ONCE per row: dlen + one tf per term is
    # len(terms)+1 references, and Catalyst re-evaluates the split for
    # every reference after CollapseProject inlining (interleaved A/B at
    # sf0.1: ~15% on this stage for 3 terms; grows with the term count)
    counts = _let(w_arr, lambda v: F.struct(
        F.size(v).alias("dlen"),
        *[F.size(F.filter(v, _count_term(t))).alias(f"tf_{i}")
          for i, t in enumerate(_BM25_TERMS)]))
    per_doc = (d.select("doc_id", counts.alias("__c"))
                .select("doc_id", "__c.*")
                .where(F.col("dlen") > 0))
    # dlen > 0 matches the oracle's dl CTE, which only contains docs with
    # ≥1 nonempty token — a whitespace-only doc must not inflate n_docs
    # or the avgdl denominator
    stats = per_doc.agg(
        (F.sum("dlen").cast("double") / F.count("*")).alias("avgdl"),
        F.count("*").alias("n_docs"),
        *[F.count(F.when(F.col(f"tf_{i}") > 0, 1)).alias(f"df_{i}")
          for i in range(len(_BM25_TERMS))])
    term_rows = F.array(*[
        F.struct(F.lit(t).alias("tok"),
                 F.col(f"tf_{i}").cast("long").alias("tfreq"),
                 F.col(f"df_{i}").cast("long").alias("dfreq"))
        for i, t in enumerate(_BM25_TERMS)])
    long = (per_doc.crossJoin(F.broadcast(stats))
            .select("doc_id", "dlen", "avgdl", "n_docs",
                    F.explode(term_rows).alias("t"))
            .select("doc_id", "dlen", "avgdl", "n_docs",
                    "t.tok", "t.tfreq", "t.dfreq")
            .where(F.col("tfreq") > 0))
    idf = F.log((F.col("n_docs") - F.col("dfreq") + 0.5)
                / (F.col("dfreq") + 0.5) + 1.0)
    # association mirrors the oracle's left-to-right parse
    # `idf * a / b` = (idf * a) / b — `idf * (a/b)` can differ by an ulp,
    # enough to flip round(score, 6) at a rounding boundary
    scored = long.withColumn(
        "score",
        (idf * (F.col("tfreq") * (_BM25_K1 + 1.0)))
        / (F.col("tfreq") + _BM25_K1 * (1.0 - _BM25_B
                                        + _BM25_B * F.col("dlen")
                                        / F.col("avgdl"))))
    w = Window.partitionBy("tok").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
                  .where(F.col("rn") <= 10)
                  .select("tok", "doc_id", "tfreq",
                          F.round("score", 6).alias("bm25")))


@_q("q87_bpe_pair_counts",
    "tokenizer training stage 2: corpus-wide adjacent-token-pair counts "
    "(the argmax of one BPE merge iteration), top-20 — zip-of-slices "
    "pair stream, hash-agg with map-side combine, TakeOrdered top-k",
    """
    WITH toks AS (SELECT string_split_regex(trim(text), '\\s+') AS w
                  FROM documents),
    pairs AS (
      SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1])) AS pair
      FROM toks WHERE len(w) >= 2)
    SELECT pair, count(*) AS n_occurrences
    FROM pairs GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT 20
    """)
def q87(spark, sf_dir):
    from ..operators.dedup import _gram_stream
    d = load_table(spark, sf_dir, "documents")
    pairs = _gram_stream(d, "text", "doc_id", n=2)
    return (pairs.groupBy(F.col("shingle").alias("pair"))
                 .agg(F.count("*").alias("n_occurrences"))
                 .orderBy(F.desc("n_occurrences"), F.asc("pair"))
                 .limit(20))


@_q("q88_chunk_dedup",
    "corpus-wide exact chunk dedup (Lee et al. 2022 ExactSubstr at 10-word "
    "chunk granularity): repeated chunks keep only their first occurrence "
    "(global (doc, idx) order), documents reassembled from survivors — "
    "operators.text.chunk_dedup; fully-boilerplate docs go NULL",
    """
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                  FROM documents),
    wpos AS (SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos,
                    unnest(w) AS word
             FROM toks),
    chunks AS (SELECT doc_id, pos // 10 AS chunk_idx,
                      string_agg(word, ' ' ORDER BY pos) AS chunk
               FROM wpos GROUP BY doc_id, pos // 10),
    ranked AS (SELECT doc_id, chunk_idx, chunk,
                      row_number() OVER (PARTITION BY chunk
                                         ORDER BY doc_id, chunk_idx) AS rn
               FROM chunks)
    SELECT doc_id, count(*) AS n_chunks,
           count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
           nullif(string_agg(CASE WHEN rn = 1 THEN chunk END,
                             ' ' ORDER BY chunk_idx), '') AS text_clean
    FROM ranked GROUP BY doc_id
    """)
def q88(spark, sf_dir):
    from ..operators.text import chunk_dedup
    d = load_table(spark, sf_dir, "documents")
    return chunk_dedup(d, chunk_words=10)


@_q("q91_repetition_filter",
    "Gopher-style within-doc repetition gates (Rae et al. 2021 A1): "
    "top-bigram occupancy + duplicate-trigram fraction, flag over "
    "thresholds — operators.text.repetition_stats (sorted run-length "
    "aggregate, zero shuffle; oracle takes the unnest/group-by road)",
    """
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                  FROM documents),
    g AS (SELECT doc_id, w,
                 list_transform(generate_series(1, len(w) - 1),
                                i -> w[i] || ' ' || w[i+1]) AS bg,
                 list_transform(generate_series(1, len(w) - 2),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                   AS tg
          FROM toks WHERE len(w) >= 3),
    bgc AS (SELECT doc_id, b, count(*) AS c
            FROM (SELECT doc_id, unnest(bg) AS b FROM g) GROUP BY doc_id, b),
    bgm AS (SELECT doc_id, max(c) AS top_c FROM bgc GROUP BY doc_id),
    tgs AS (SELECT doc_id, count(*) AS n_tri, count(DISTINCT t) AS n_tri_d
            FROM (SELECT doc_id, unnest(tg) AS t FROM g) GROUP BY doc_id)
    SELECT g.doc_id, len(bg) AS n_bigrams,
           round(CAST(top_c AS DOUBLE) / len(bg), 6) AS top_bigram_frac,
           round(CAST(n_tri - n_tri_d AS DOUBLE) / n_tri, 6)
             AS dup_trigram_frac,
           CAST((CAST(top_c AS DOUBLE) / len(bg) > 0.20
                 OR CAST(n_tri - n_tri_d AS DOUBLE) / n_tri > 0.30) AS INT)
             AS repetitive
    FROM g JOIN bgm ON g.doc_id = bgm.doc_id
           JOIN tgs ON g.doc_id = tgs.doc_id
    """)
def q91(spark, sf_dir):
    from ..operators.text import repetition_stats
    from .tables import fan_out_small_scan
    # per-doc higher-order array gates are the CPU stage: fan out the
    # single-file scan (measured -77% at sf0.1; no-op on real tables)
    d = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    r = (repetition_stats(d, top_bigram_max=0.20, dup_trigram_max=0.30)
         .where(F.size(F.split(F.trim("text"), r"\s+")) >= 3))
    return r.select(
        "doc_id", "n_bigrams",
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
        F.round("dup_trigram_frac", 6).alias("dup_trigram_frac"),
        F.col("repetitive").cast("int").alias("repetitive"))


@_q("q101_unigram_logprob",
    "corpus-trained unigram LM quality score (CCNet-style): train token "
    "counts over the whole corpus (the wordcount agg), broadcast the tiny "
    "vocabulary back, score each doc by its mean negative log-probability. "
    "Per-token -ln p is quantized to fixed-point BIGINT *before* the "
    "per-doc sum, so the aggregate is integer-exact and order-independent "
    "on both engines (float sums over shuffled rows are not)",
    """
    WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
               FROM documents),
    v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
    n AS (SELECT count(*) AS total FROM t),
    s AS (SELECT tok,
                 CAST(round(-ln(CAST(cnt AS DOUBLE) / total)
                            * 1000000000) AS BIGINT) AS nll_e9
          FROM v, n)
    SELECT t.doc_id, count(*) AS n_tokens,
           round(CAST(sum(s.nll_e9) AS DOUBLE) / 1e9 / count(*), 6)
             AS avg_nll
    FROM t JOIN s USING (tok)
    GROUP BY t.doc_id
    """)
def q101(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # 100 TB shape: tokenize once (one explode over the scan), wordcount
    # agg (map-side combine on the hot token keys), vocabulary is tiny
    # relative to the corpus -> broadcast joins back; the only full
    # shuffle is the per-doc rollup on doc_id
    t = d.select("doc_id",
                 F.explode(F.split(F.trim(F.col("text")), " "))
                  .alias("tok"))
    v = t.groupBy("tok").agg(F.count("*").alias("cnt"))
    # the corpus token total is the sum of the vocabulary counts — derive
    # it from the tiny wordcount aggregate instead of a second full
    # scan+explode of the corpus (a whole wasted pass at 100 TB)
    n = v.agg(F.sum("cnt").alias("total"))
    s = (v.crossJoin(F.broadcast(n))
          .select("tok",
                  F.expr("CAST(round(-ln(CAST(cnt AS DOUBLE) / total) "
                         "* 1000000000) AS BIGINT)").alias("nll_e9")))
    return (t.join(F.broadcast(s), "tok")
             .groupBy("doc_id")
             .agg(F.count("*").alias("n_tokens"),
                  F.round(F.sum("nll_e9").cast("double") / 1e9
                          / F.count("*"), 6).alias("avg_nll")))


@_q("q105_chunk_overlap",
    "overlapping word-window chunking (text.chunk_overlap — the RAG "
    "retrieval-index chunker): size-20 windows every 10 words, chunks "
    "built by array slicing in the scan, map-only",
    """
    WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
               FROM documents WHERE trim(text) <> ''),
    k AS (SELECT doc_id, w,
                 unnest(generate_series(0,
                   CAST(ceil(greatest(len(w) - 20, 0) / 10.0) AS INT)))
                   AS chunk_idx
          FROM d)
    SELECT doc_id, chunk_idx,
           len(w[chunk_idx * 10 + 1 : chunk_idx * 10 + 20]) AS n_words,
           array_to_string(w[chunk_idx * 10 + 1 : chunk_idx * 10 + 20], ' ')
             AS chunk
    FROM k
    """)
def q105(spark, sf_dir):
    from ..operators.text import chunk_overlap
    d = load_table(spark, sf_dir, "documents")
    return chunk_overlap(d, size=20, stride=10)


@_q("q106_balanced_sample",
    "deterministic class-balanced sample (sampling.balanced_sample): "
    "exactly min(n, |stratum|) docs per language by md5 rank — "
    "WindowGroupLimit keeps the shuffle at O(tasks x n)",
    """
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
    WHERE rk <= 40
    """)
def q106(spark, sf_dir):
    from ..operators.sampling import balanced_sample
    d = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "lang", "source")
    return balanced_sample(d, 40, "lang", "doc_id")


@_q("q109_feature_hashing",
    "hashing-trick featurization (hashingTF): tokens -> md5 buckets -> "
    "per-(doc, bucket) counts, long form — the vocabulary-free "
    "vectorizer (no fit pass, no vocab broadcast; one explode + one "
    "two-key hash-agg, fully map-combinable)",
    """
    WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
               FROM documents),
    b AS (SELECT doc_id,
                 CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 64
                   AS bucket
          FROM t)
    SELECT doc_id, bucket, count(*) AS cnt
    FROM b GROUP BY doc_id, bucket
    """)
def q109(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id",
                 F.explode(F.split(F.trim(F.col("text")), " "))
                  .alias("tok"))
    bucket = (F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10)
               .cast("bigint") % 64)
    return (t.select("doc_id", bucket.alias("bucket"))
             .groupBy("doc_id", "bucket")
             .agg(F.count("*").alias("cnt")))


@_q("q113_bigram_condprob",
    "bigram conditional-probability table P(w2|w1) (the LM/tokenizer "
    "statistic one step past q87's pair counts): bigram counts via "
    "zip-of-slices, continuation totals re-aggregated from the PAIR "
    "counts (never a second corpus pass), integer-exact division",
    """
    WITH toks AS (SELECT string_split(trim(text), ' ') AS w
                  FROM documents),
    bg AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                         i -> w[i] || ' ' || w[i+1])) AS bigram
           FROM toks WHERE len(w) >= 2),
    c2 AS (SELECT split_part(bigram, ' ', 1) AS w1,
                  split_part(bigram, ' ', 2) AS w2,
                  count(*) AS cnt2
           FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(cnt2) AS cnt1 FROM c2 GROUP BY w1)
    SELECT c2.w1, c2.w2, c2.cnt2,
           round(CAST(c2.cnt2 AS DOUBLE) / cnt1, 6) AS p
    FROM c2 JOIN c1 USING (w1)
    WHERE c2.cnt2 >= 20
    """)
def q113(spark, sf_dir):
    register_tables(spark, sf_dir, ["documents"])
    # zip-of-slices (one split per row, no per-gram re-split) — same
    # rewrite as the shingle stream; the continuation totals come from
    # the tiny pair-count aggregate, broadcast back
    return spark.sql("""
    WITH toks AS (SELECT /*+ REPARTITION(32, doc_id) */ doc_id,
                         split(trim(text), ' ') AS w FROM documents),
    bg AS (SELECT s.`0` AS w1, s.`1` AS w2 FROM (
             SELECT explode(arrays_zip(
                      slice(w, 1, greatest(size(w) - 1, 0)),
                      slice(w, 2, greatest(size(w) - 1, 0)))) AS s
             FROM toks)),
    c2 AS (SELECT w1, w2, count(*) AS cnt2 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(cnt2) AS cnt1 FROM c2 GROUP BY w1)
    SELECT /*+ BROADCAST(c1) */ c2.w1, c2.w2, c2.cnt2,
           round(CAST(c2.cnt2 AS DOUBLE) / cnt1, 6) AS p
    FROM c2 JOIN c1 USING (w1)
    WHERE c2.cnt2 >= 20
    """)
