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
from . import corpus_r5  # noqa: F401  (EWMA, table fingerprint,
#   embedding-dimension profile, token-label MI, gap interpolation,
#   rolling corr, reachability, weighted sampling, streaks, SCD2,
#   k-means step, CUSUM, Benford)

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

# Since round 5 the 50-slot window is DERIVED from the committed
# CORRECTNESS_r0*.json files themselves (oldest-green-first), replacing the
# hand-staged rotation comments of rounds 1-4.  For every corpus query we
# compute the latest round with a driver row (any row — pass or the
# by-design ``no_oracle`` rows-only check — counts as a freshness signal);
# queries with NO row yet (new this round) sort first, then ascending
# latest-green round, then ascending query number as the deterministic
# tiebreak.  This reproduces the staged round-5 window exactly (the 34
# r02-only greens q31 q35 q36 q41 q44-q66 q70-q73 q75-q77, then the
# lowest-numbered r03 greens as fill) and keeps the invariant — no
# oracle-backed query's newest green row ever older than two rounds —
# self-maintaining (asserted by test_driver_window_covers_unverified_families
# without hard-coded lists).
#
# SATURATION (round-5 end): at 150 oracle-backed queries the rotation is
# exactly 3 x 50 with zero slack — each round's window is entirely
# consumed by the two-rounds-stale cohort, so registering ANY new oracle
# corpus query now fails the staleness test by design.  New capability
# belongs on the pytest-verified library/streaming surface, or must
# REPLACE an existing corpus entry; relaxing the invariant to three
# rounds is the conscious alternative if a future family is worth more
# than freshness cadence.


def _latest_driver_round() -> dict[str, int]:
    """Map query name -> latest round with a driver correctness row."""
    import json
    import re
    from pathlib import Path

    latest: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _window_order(names: list[str]) -> list[str]:
    """Oldest-green-first driver window: never-checked queries lead, then
    ascending latest-green round, query number breaking ties."""
    import re

    latest = _latest_driver_round()

    def key(name: str):
        m = re.match(r"q(\d+)", name)
        num = int(m.group(1)) if m else 10**9
        return (latest.get(name, -1), num)

    return sorted(names, key=key)


_WINDOW_PRIORITY = _window_order([q.name for q in CORPUS])[:50]

# If the driver ships partsupp mid-round, its four queries have no
# hard-signal row at all — they pre-empt the front of the window and the
# same number of fill entries drop off the 50-slot tail.
if corpus_partsupp.REGISTERED:
    _WINDOW_PRIORITY = (
        [q.name for q in corpus_partsupp.REGISTERED]
        + _WINDOW_PRIORITY)[:50]

_rank = {n: i for i, n in enumerate(_WINDOW_PRIORITY)}
CORPUS.sort(key=lambda q: (_rank.get(q.name, len(_rank)), q.name))
