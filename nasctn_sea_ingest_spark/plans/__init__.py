from .tables import load_table, register_tables, us  # noqa: F401
from .corpus import CORPUS, Query  # noqa: F401
from . import corpus_docs  # noqa: F401  (registers document-pipeline queries)
from . import corpus_ext  # noqa: F401  (set ops, rollup/cube, ANN, multimodal)
from . import corpus_subq  # noqa: F401  (subqueries, TPC-H join shapes)

# ---------------------------------------------------------------------------
# Driver-window ordering.  The correctness driver oracle-checks the FIRST 50
# entries of ``queries()`` each round; registration order (module import
# order) left q46-q77 outside round 1's window.  Rotate so the window holds
# (a) every query family not yet hard-signal-verified (subquery/TPC-H,
# sampling, packing, interval join, extended window suites, ANN, multimodal)
# and (b) a representative of each previously-green family, including every
# query whose implementation changed this round.  Queries past 50 were all
# driver-green in CORRECTNESS_r01.json, so cross-round coverage is total.
# ---------------------------------------------------------------------------

_WINDOW_PRIORITY = [
    # round-1 untested (27): whole families needing hard-signal rows
    "q46_ann_lsh", "q47_ann_ivf", "q48_multimodal_features",
    "q50_grouping_sets", "q51_sessionize", "q52_unpivot",
    "q53_percentile_cont", "q54_batch_topk", "q55_hash_split",
    "q56_weighted_mixture", "q57_interval_join", "q58_pii_scrub",
    "q59_approx_aggs", "q60_sequence_pack", "q61_quantize_embeddings",
    "q62_scalar_subquery", "q63_correlated_scalar", "q64_in_having",
    "q65_shipping_priority", "q66_local_supplier_volume",
    "q70_late_shipment_priority", "q71_promo_revenue_share",
    "q72_sole_late_supplier", "q73_event_funnel",
    "q75_rolling_median", "q76_embedding_drift", "q77_ntile_nth",
    # changed-this-round (must re-verify): q24 decimal fix, as-of rewrite
    "q24_jaccard_neardup", "q11_asof_nearest", "q35_asof_backward",
    # flagship + one representative per previously-green family (23 total)
    "q01_pricing_summary", "q05_mask_nullify", "q07_topk", "q08_join_agg",
    "q14_gap_detect", "q15_rank_topn", "q16_exact_quantiles",
    "q17_pivot_wide", "q18_db_aggregates", "q20_cadence_coverage",
    "q22_cosine_topk", "q23_dedup_exact", "q25_minhash_lsh",
    "q26_simhash_hamming", "q31_block_resample", "q36_rayleigh_transform",
    "q41_rollup", "q44_distinct_agg", "q45_json_string", "q49_window_suite",
]

_rank = {n: i for i, n in enumerate(_WINDOW_PRIORITY)}
CORPUS.sort(key=lambda q: (_rank.get(q.name, len(_rank)), q.name))
