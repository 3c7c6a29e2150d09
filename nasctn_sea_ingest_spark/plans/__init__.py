from .tables import load_table, register_tables, us  # noqa: F401
from .corpus import CORPUS, Query  # noqa: F401
from . import corpus_docs  # noqa: F401  (registers document-pipeline queries)
from . import corpus_ext  # noqa: F401  (set ops, rollup/cube, ANN, multimodal)
from . import corpus_subq  # noqa: F401  (subqueries, TPC-H join shapes)
from . import corpus_r3  # noqa: F401  (basket/ER/skyline/IVM families)
from . import corpus_partsupp  # noqa: F401  (TPC-H Q2/Q11/Q16/Q20; only
#   registers when the driver ships partsupp.parquet — no-op until then)
from . import corpus_r4  # noqa: F401  (PPJoin set-similarity, TWAP,
#   corpus-KL drift, recursive-CTE rollup)

# ---------------------------------------------------------------------------
# Driver-window ordering.  The correctness driver oracle-checks the FIRST 50
# entries of ``queries()`` each round.  Round 1 verified q01-q45 (the
# registration-order front); round 2 rotated to verify q46-q77 plus the
# queries changed that round.  Round 3's window: (a) every NEW query
# (q78-q87 — TPC-H Q10/Q7/Q8/Q13 shapes, stratified sampling, seeded
# shuffle, BM25, keyed as-of, IVF-PQ, BPE pair counts), (b) the 27
# queries whose only hard-signal row is from round 1 (two rounds old),
# (c) representatives of the round-2-green families.  Exactly 50 entries
# — every oracle-backed query keeps a green row ≤ 2 rounds old
# (asserted by test_driver_window_covers_unverified_families).
# ---------------------------------------------------------------------------

# ROUND-4 WINDOW (this rotation executed first thing in round 4, per the
# staged plan): after round 3 the per-query latest-green rounds are
#   r03: q27 q28 q37-q40 q42 q43 q67-q69 q74 q78-q115   (fresh)
#   r02: q01 q05 q07 q08 q11 q14-q18 q20 q22-q26 q31 q35 q36 q41
#        q44-q66 q70-q73 q75-q77                        (one round old)
#   r01: q02-q04 q06 q09 q10 q12 q13 q19 q21 q29 q30 q32-q34 (two rounds old)
#   none: q116-q130                                     (new in r03)
# so the 50-slot window is (a) the 15 never-driver-checked queries,
# (b) any NEW round-4 queries, (c) the 15 r01-only greens, (d) fill to 50
# with the lowest-numbered r02 greens.  Keep
# test_driver_window_covers_unverified_families in sync.
#
# ROUND-5 ROTATION (do this FIRST next round): window should become
# (a) any new round-5 queries, (b) the r02-only greens left un-refreshed
# this round — their green rows will then be three rounds old: q31 q35
# q36 q41 q44-q66 q70-q73 q75-q77 (34 queries), (c) fill to 50 with the
# oldest r03 greens (q27 q28 q37-q40 q42 q43 q67-q69 q74, then q78+).
_WINDOW_PRIORITY = [
    # (a) NEW in round 4 (4): PPJoin exact set-similarity join, TWAP,
    # corpus-KL drift, recursive-CTE hierarchy rollup.  They displace the
    # last four round-2 fill entries (q31/q35/q36/q41 → round-5 window).
    "q135_setsim_prefix_join", "q136_twap", "q137_corpus_kl",
    "q138_recursive_rollup",
    # (b) new in round 3, never driver-checked (15): basket pairs,
    # weighted median, ER blocking, autocorrelation, event bigrams,
    # skyline, partial-agg merge (IVM), batch model scoring, HLL sketch
    # rollup (rows-only), drawdown, A/B test, equi-depth histogram,
    # triangle counting, sequence pattern (funnel regex), first-touch
    # attribution.
    "q116_copurchase_pairs", "q117_weighted_median", "q118_blocked_match",
    "q119_autocorr_daily", "q120_event_bigrams", "q121_pareto_frontier",
    "q122_partial_agg_merge", "q123_model_scoring", "q124_sketch_rollup",
    "q125_max_drawdown", "q126_ab_test", "q127_equidepth_histogram",
    "q128_triangle_count", "q129_sequence_pattern",
    "q130_first_touch_attribution",
    # (c) round-1-only greens (15): their single hard-signal row is two
    # rounds old; refresh.
    "q02_filter_project", "q03_time_range", "q04_conjunctive_slice",
    "q06_group_limiter", "q09_semi_join", "q10_anti_join",
    "q12_union_concat", "q13_distinct", "q19_axis_synthesis",
    "q21_trace_stats", "q29_fingerprint", "q30_midmean", "q32_roll_shift",
    "q33_cross_product", "q34_scalar_stats",
    # (d) fill: the 20 lowest-numbered r02 greens (one round old).  The
    # remaining r02 greens (q44-q66, q70-q73, q75-q77) rotate in next
    # round before they go three rounds stale.
    "q01_pricing_summary", "q05_mask_nullify", "q07_topk", "q08_join_agg",
    "q11_asof_nearest", "q14_gap_detect", "q15_rank_topn",
    "q16_exact_quantiles", "q17_pivot_wide", "q18_db_aggregates",
    "q20_cadence_coverage", "q22_cosine_topk", "q23_dedup_exact",
    "q24_jaccard_neardup", "q25_minhash_lsh", "q26_simhash_hamming",
]
assert len(_WINDOW_PRIORITY) == 50, len(_WINDOW_PRIORITY)

# If the driver ships partsupp mid-round, its four queries have no
# hard-signal row at all — they pre-empt the front of the window and the
# same number of fill entries drop off the 50-slot tail.
if corpus_partsupp.REGISTERED:
    _WINDOW_PRIORITY = (
        [q.name for q in corpus_partsupp.REGISTERED]
        + _WINDOW_PRIORITY)[:50]

_rank = {n: i for i, n in enumerate(_WINDOW_PRIORITY)}
CORPUS.sort(key=lambda q: (_rank.get(q.name, len(_rank)), q.name))
