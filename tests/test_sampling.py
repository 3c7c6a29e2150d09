"""Deterministic sampling/splitting: uniformity, disjointness, stability
under repartitioning, and mixture allowlist semantics."""

import pyspark.sql.functions as F
import pytest

from nasctn_sea_ingest_spark.operators import sampling as S
from nasctn_sea_ingest_spark.plans.tables import load_table


def test_deterministic_sample_fraction_and_stability(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    got = S.deterministic_sample(d, 0.3, "doc_id")
    frac = got.count() / n
    assert abs(frac - 0.3) < 0.1          # uniform to sampling noise
    # membership is partitioning-independent
    ids1 = {r.doc_id for r in got.select("doc_id").collect()}
    ids2 = {r.doc_id for r in
            S.deterministic_sample(d.repartition(13), 0.3, "doc_id")
             .select("doc_id").collect()}
    assert ids1 == ids2
    # a different salt is an independent draw
    ids3 = {r.doc_id for r in
            S.deterministic_sample(d, 0.3, "doc_id", salt="x")
             .select("doc_id").collect()}
    assert ids3 != ids1


def test_hash_split_disjoint_exhaustive(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = S.hash_split(d, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id")
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = d.count()
    assert sum(counts.values()) == n      # exhaustive
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.8) < 0.1
    # one row → exactly one split (column, not filter ⇒ disjoint by
    # construction); re-run is identical
    again = S.hash_split(d, {"train": 0.8, "val": 0.1, "test": 0.1},
                         "doc_id")
    assert (out.select("doc_id", "split").exceptAll(
        again.select("doc_id", "split")).count() == 0)


def test_weighted_mixture_allowlist(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    langs = {r.lang for r in d.select("lang").distinct().collect()}
    rates = {"en": 1.0, "fr": 0.5}
    out = S.weighted_mixture(d, rates, "lang", "doc_id")
    got_langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert got_langs <= {"en", "fr"}      # others dropped
    n_en = d.where(F.col("lang") == "en").count()
    assert out.where(F.col("lang") == "en").count() == n_en  # rate 1.0 = all
    if "fr" in langs:
        n_fr = d.where(F.col("lang") == "fr").count()
        kept = out.where(F.col("lang") == "fr").count()
        assert 0 < kept < n_fr


def test_upsample_epochs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    out = S.upsample(d, 2.5, "doc_id")
    got = out.count()
    assert abs(got / n - 2.5) < 0.15
    # every key appears at least twice, epochs are 0-based and contiguous
    per_key = out.groupBy("doc_id").agg(
        F.count("*").alias("c"), F.max("epoch").alias("mx")).collect()
    assert all(r.c in (2, 3) and r.mx == r.c - 1 for r in per_key)
    # deterministic
    assert S.upsample(d, 2.5, "doc_id").count() == got


def test_weighted_mixture_upsampling_rates(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = S.weighted_mixture(d, {"en": 2.0, "fr": 0.5}, "lang", "doc_id")
    n_en = d.where(F.col("lang") == "en").count()
    # rate 2.0 → every en row exactly twice (epoch 0 and 1)
    assert out.where(F.col("lang") == "en").count() == 2 * n_en
    assert out.where((F.col("lang") == "en") & (F.col("epoch") == 1)) \
              .count() == n_en


def test_sequence_packing_invariants(spark, sf_dir):
    """Pack ids are contiguous per stream; offsets stay < seq_len; token
    conservation holds; straddling docs keep their start-pack id."""
    from nasctn_sea_ingest_spark.operators.packing import (
        assign_packs, pack_stats)
    d = load_table(spark, sf_dir, "documents")
    t = d.select("lang", "doc_id",
                 F.size(F.split(F.trim(F.col("text")), " ")).alias("n_tok"))
    L = 512
    packed = assign_packs(t, "n_tok", L, by=["lang"], order=["doc_id"])
    rows = packed.collect()
    assert all(0 <= r.pack_offset < L for r in rows)
    # python oracle: replay the greedy concat per lang
    from collections import defaultdict
    cum = defaultdict(int)
    for r in sorted(rows, key=lambda r: (r.lang, r.doc_id)):
        assert r.pack_id == cum[r.lang] // L
        assert r.pack_offset == cum[r.lang] % L
        cum[r.lang] += r.n_tok
    stats = pack_stats(t, "n_tok", L, by=["lang"], order=["doc_id"])
    total = stats.agg(F.sum("n_tokens")).first()[0]
    assert total == t.agg(F.sum("n_tok")).first()[0]  # conservation


def test_stratified_sample_rates_and_default(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    fracs = {"en": 0.5, "fr": 0.25}
    out = S.stratified_sample(d, fracs, "lang", "doc_id", salt="t")
    per = {r.lang: r.n for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r.lang: r.n for r in
            d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(per) <= set(fracs)          # default=None drops the rest
    for lang, frac in fracs.items():
        if base.get(lang, 0) >= 50:
            assert abs(per.get(lang, 0) / base[lang] - frac) < 0.15
    # default keeps unlisted strata at the default rate
    out2 = S.stratified_sample(d, fracs, "lang", "doc_id", salt="t",
                               default=1.0)
    assert out2.count() > out.count()
    other = out2.where(~F.col("lang").isin(*fracs)).count()
    assert other == d.where(~F.col("lang").isin(*fracs)).count()
    # membership is partitioning-independent
    ids1 = {r.doc_id for r in out.select("doc_id").collect()}
    ids2 = {r.doc_id for r in
            S.stratified_sample(d.repartition(13), fracs, "lang",
                                "doc_id", salt="t")
             .select("doc_id").collect()}
    assert ids1 == ids2


def test_seeded_shuffle_position_is_exact_global_rank(spark, sf_dir):
    import hashlib
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = S.seeded_shuffle(d, "doc_id", seed="7")
    rows = out.select("doc_id", "position").collect()
    n = len(rows)
    # positions are a 0..n-1 permutation
    assert sorted(r.position for r in rows) == list(range(n))
    # and equal the rank of the md5 draw (python oracle)
    draw = {r.doc_id: hashlib.md5(f"7|{r.doc_id}".encode()).hexdigest()
            for r in rows}
    want = {k: i for i, k in
            enumerate(sorted(draw, key=lambda k: draw[k]))}
    assert all(want[r.doc_id] == r.position for r in rows)
    # stable under input partitioning
    again = S.seeded_shuffle(d.repartition(17), "doc_id", seed="7")
    assert {(r.doc_id, r.position) for r in
            again.select("doc_id", "position").collect()} \
        == {(r.doc_id, r.position) for r in rows}
    # different seed → different permutation
    other = S.seeded_shuffle(d, "doc_id", seed="8")
    assert {(r.doc_id, r.position) for r in
            other.select("doc_id", "position").collect()} \
        != {(r.doc_id, r.position) for r in rows}


def test_seeded_shuffle_order_only_sorted(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    out = S.seeded_shuffle(d, "doc_id", seed="7", position=False)
    assert "position" not in out.columns
    ids = [r.doc_id for r in out.collect()]
    import hashlib
    assert ids == sorted(ids, key=lambda k:
                         hashlib.md5(f"7|{k}".encode()).hexdigest())


# ---------------------------------------------------------------------------
# property tests (hypothesis): the invariants hold for arbitrary specs
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(weights=st.lists(st.floats(0.05, 1.0), min_size=2, max_size=5))
def test_hash_split_partitions_bucket_space(weights):
    """Driver-side property: the bucket edges from any weight vector tile
    [0, N_BUCKETS) exactly — no gaps, no overlap (the disjoint/exhaustive
    guarantee does not depend on Spark)."""
    from nasctn_sea_ingest_spark.operators.sampling import N_BUCKETS
    total = sum(weights)
    edges = [0]
    acc = 0.0
    for w in weights[:-1]:
        acc += w / total * N_BUCKETS
        edges.append(int(round(acc)))
    edges.append(N_BUCKETS)
    assert edges == sorted(edges)
    assert edges[0] == 0 and edges[-1] == N_BUCKETS


def test_stratified_sample_edge_fractions(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_en = d.where(F.col("lang") == "en").count()
    # fraction 1.0 keeps every row of the stratum; 0.0 keeps none
    full = S.stratified_sample(d, {"en": 1.0}, "lang", "doc_id")
    assert full.count() == n_en
    none = S.stratified_sample(d, {"en": 0.0}, "lang", "doc_id")
    assert none.count() == 0
    # default=0.0 and absent default both drop unlisted strata
    assert S.stratified_sample(d, {"en": 1.0}, "lang", "doc_id",
                               default=0.0).count() == n_en


def test_balanced_sample_exact_counts_and_determinism(spark):
    from nasctn_sea_ingest_spark.operators.sampling import balanced_sample
    import pyspark.sql.functions as F
    rows = [(i, ["en", "fr", "de"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = balanced_sample(df, 20, "lang", "doc_id")
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 20, "fr": 20, "de": 20}
    # small stratum: capped at its size, not padded
    small = df.where("lang = 'en' and doc_id < 30")  # 10 en rows
    got = balanced_sample(small, 20, "lang", "doc_id").count()
    assert got == 10
    # deterministic across repartitionings
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in
               balanced_sample(df.repartition(13), 20, "lang",
                               "doc_id").collect())
    assert a == b
    # salt changes the draw
    c = sorted(r.doc_id for r in
               balanced_sample(df, 20, "lang", "doc_id",
                               salt="v2").collect())
    assert a != c


def test_balanced_sample_excludes_null_keys(spark):
    from nasctn_sea_ingest_spark.operators.sampling import balanced_sample
    df = spark.createDataFrame(
        [(None, "en"), (1, "en"), (2, "en"), (None, "fr"), (3, "fr")],
        "doc_id long, lang string")
    out = balanced_sample(df, 10, "lang", "doc_id").collect()
    # null-key rows have no identity to rank by -> excluded, not sampled
    assert sorted(r.doc_id for r in out) == [1, 2, 3]


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Near-dup clusters must land whole on one side of the split; un-
    paired docs split individually per the hash weights; assignment is
    deterministic across calls."""
    from nasctn_sea_ingest_spark.operators.sampling import (
        hash_split, leakage_safe_split)

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(400)], "doc_id long, text string")
    # three clusters, one of them transitive (0~1, 1~2 => {0,1,2})
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (200, 201)], "d1 long, d2 long")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}

    out = leakage_safe_split(docs, pairs, "doc_id", w).collect()
    split = {r.doc_id: r.split for r in out}
    assert len(split) == 400 and set(split.values()) <= set(w)
    for cluster in ([0, 1, 2], [10, 11], [200, 201]):
        assert len({split[d] for d in cluster}) == 1, cluster

    # deterministic across calls
    again = {r.doc_id: r.split
             for r in leakage_safe_split(docs, pairs, "doc_id", w).collect()}
    assert again == split

    # singletons follow the plain hash_split assignment exactly
    singles = [d for d in split if d not in {0, 1, 2, 10, 11, 200, 201}]
    plain = {r.doc_id: r.split
             for r in hash_split(docs, w, "doc_id").collect()}
    for d in singles:
        assert split[d] == plain[d]
    # and the split is usably balanced on this sample
    from collections import Counter
    c = Counter(split.values())
    assert c["train"] > 250 and c["val"] > 10 and c["test"] > 10


def test_dsir_selects_target_like_docs(spark):
    """DSIR end-to-end: train the hashed-n-gram log-ratio on a chemistry
    target vs a mixed raw pool — chemistry-like docs must get strictly
    higher log-weights than sports-like docs, the distributed sum must
    equal a Python recomputation from the collected ratio table (exact
    plumbing check), and Gumbel-top-n resampling must pick mostly
    target-like docs, deterministically."""
    import numpy as np
    from nasctn_sea_ingest_spark.operators.sampling import (
        dsir_log_ratio, dsir_resample, dsir_weights,
        hashed_gram_buckets)

    chem = ["acid base reaction yields salt",
            "molar mass of the compound",
            "titration endpoint indicator color",
            "covalent bond energy table"]
    sport = ["striker scores late winning goal",
             "coach praises defensive record",
             "season ticket holders cheer loudly",
             "referee shows second yellow card"]
    target = spark.createDataFrame([(i, t) for i, t in enumerate(chem)],
                                   "doc_id long, text string")
    raw_rows = [(100 + i, t) for i, t in enumerate(chem + sport)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")

    ratio, default = dsir_log_ratio(target, raw, n_buckets=4096)
    pool = spark.createDataFrame(
        [(i, t) for i, t in enumerate(chem)] +
        [(50 + i, t) for i, t in enumerate(sport)],
        "doc_id long, text string")
    w = dsir_weights(pool, ratio, default, n_buckets=4096)
    got = {r.doc_id: r for r in w.collect()}
    chem_w = [got[i].log_weight for i in range(4)]
    sport_w = [got[50 + i].log_weight for i in range(4)]
    assert min(chem_w) > max(sport_w)

    # exact plumbing: distributed sum == python sum over the SAME
    # collected bucket arrays and ratio table
    rt = {r.bucket: r.log_ratio for r in ratio.collect()}
    arrs = {r.doc_id: r.b for r in pool.select(
        "doc_id", hashed_gram_buckets("text", 4096).alias("b"))
        .collect()}
    for did, r in got.items():
        want = sum(rt.get(b, default) for b in arrs[did])
        assert r.log_weight == pytest.approx(want, rel=1e-12)
        assert r.n_grams == len(arrs[did])

    picked = {r.doc_id for r in
              dsir_resample(w, 4, salt="s1").collect()}
    assert len(picked) == 4
    assert len(picked & set(range(4))) >= 3      # mostly chemistry
    again = {r.doc_id for r in
             dsir_resample(w, 4, salt="s1").collect()}
    assert picked == again                        # deterministic
    other = {r.doc_id for r in
             dsir_resample(w, 4, salt="s2").collect()}
    assert isinstance(other, set)                 # different salt runs


def test_token_budget_mixture_exact_oracle(spark):
    """Greedy token-budget fill == a Python replay of the same md5
    order: per-domain token sums within budget + at most one overshoot
    doc, deterministic across runs, domains without budgets dropped,
    oversized budgets keep whole domains."""
    import hashlib

    from nasctn_sea_ingest_spark.operators.sampling import \
        token_budget_mixture

    rows = []
    for i in range(60):
        dom = ["web", "code", "wiki"][i % 3]
        rows.append((i, dom, 50 + (i * 37) % 200))
    df = spark.createDataFrame(rows, "doc_id long, dom string, n_tok int")
    budgets = {"web": 1200, "code": 700, "wiki": 10**9}
    got = token_budget_mixture(df, budgets, "dom", "n_tok", "doc_id",
                               salt="s")
    got_rows = {r.doc_id for r in got.collect()}

    def md5key(i):
        return hashlib.md5(f"s|{i}".encode()).hexdigest()

    want = set()
    for dom, budget in budgets.items():
        docs = sorted((r for r in rows if r[1] == dom),
                      key=lambda r: (md5key(r[0]), r[0]))
        cum = 0
        for did, _d, tok in docs:
            if cum >= budget:
                break
            want.add(did)
            cum += tok
    assert got_rows == want
    # wiki had an unlimited budget: every wiki doc kept
    assert {r[0] for r in rows if r[1] == "wiki"} <= got_rows
    # per-domain sums: within budget + at most one doc overshoot
    sums = {r.dom: r.s for r in got.groupBy("dom")
            .agg(F.sum("n_tok").alias("s")).collect()}
    assert sums["web"] < 1200 + 250 and sums["code"] < 700 + 250
    # deterministic
    again = {r.doc_id for r in token_budget_mixture(
        df, budgets, "dom", "n_tok", "doc_id", salt="s").collect()}
    assert again == got_rows
    # unknown domains dropped entirely
    got2 = token_budget_mixture(df, {"web": 500}, "dom", "n_tok",
                                "doc_id")
    assert {r.dom for r in got2.collect()} == {"web"}


def test_dsir_resample_tracks_weights_statistically(spark):
    """Gumbel-top-1 must select items with probability proportional to
    exp(log_weight): over 240 independent salts, items weighted 1:2:4
    should be picked ~1/7 : 2/7 : 4/7 of the time (binomial 3-sigma
    bands) — the distributional claim behind the sampler, not just
    determinism."""
    import math

    from nasctn_sea_ingest_spark.operators.sampling import dsir_resample

    w = spark.createDataFrame(
        [(0, math.log(1.0)), (1, math.log(2.0)), (2, math.log(4.0))],
        "doc_id long, log_weight double").persist()
    try:
        counts = {0: 0, 1: 0, 2: 0}
        n_trials = 240
        for t in range(n_trials):
            picked = dsir_resample(w, 1, salt=f"t{t}").first().doc_id
            counts[picked] += 1
        for did, p in ((0, 1 / 7), (1, 2 / 7), (2, 4 / 7)):
            sd = (n_trials * p * (1 - p)) ** 0.5
            assert abs(counts[did] - n_trials * p) <= 3 * sd, \
                (did, counts)
    finally:
        w.unpersist()
