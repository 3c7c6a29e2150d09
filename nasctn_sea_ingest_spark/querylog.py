"""Per-query run log — the query-library analog of the reference's
eliot-style per-action context (``dask_ops.py:15-93``; its ingest-side
counterpart here is the ``ingest_log`` table ``sources/ingest.py``).

The reference wraps each dask action in a logged context with timings.
Here a :class:`QueryLog` wraps DataFrame actions: each ``run`` records
name, wall duration, row count, and a digest of the executed physical
plan (so a plan regression — lost pushdown, new exchange — shows up as a
digest change in the log even before it shows up as a slowdown).

Driver-side only and O(#queries) memory: the log never touches executor
state, and ``to_df`` turns it into a small DataFrame for warehouse
append alongside ``ingest_log``.
"""

from __future__ import annotations

import hashlib
import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QueryLog"]


def normalized_plan(df: DataFrame) -> str:
    """The plan text :func:`plan_digest` hashes: expression ids (#123),
    plan ids, and locations are stripped so only structural changes
    (operators, exchanges, pushed filters) alter it."""
    p = df._jdf.queryExecution().executedPlan().toString()
    p = re.sub(r"#\d+L?", "#", p)
    p = re.sub(r"plan_id=\d+", "plan_id=", p)
    p = re.sub(r"Location: \S+", "Location:", p)
    # higher-order-function lambda variables are numbered from a
    # session-global counter (lambda x_100 in a fresh session, x_201
    # mid-bench) — a context artifact like expression ids, not plan
    # shape (round-9 --context audit: 12 queries latently exposed)
    p = re.sub(r"\b(lambda [A-Za-z]+)_\d+", r"\1_", p)
    # with-expression CSE aliases (_common_expr_0 vs _common_expr_1)
    # number from the same session-global counter family
    p = re.sub(r"\b(_common_expr)_\d+", r"\1_", p)
    # Sample seeds are runtime values, not plan shape.  (Round 6 found
    # the r5 "plans_changed: 4" phantom: df.sample(0.1, seed=7) binds
    # 0.1 to withReplacement and DROPS the keyword seed, so every run
    # re-rolled it.  The call sites now pass fraction= explicitly; this
    # strip keeps any future unseeded sample from re-arming the alarm.)
    p = re.sub(r"(Sample [^,\n]*, [^,\n]*, (?:true|false)), -?\d+",
               r"\1, <seed>", p)
    # r16 (r15 verdict #6 — AQE-context-stable digests): partition
    # COUNTS are runtime context (spark.sql.shuffle.partitions tracks
    # the core count; AQE rewrites them under load), not plan shape —
    # an 8-core run flipped ~150 digests on identical code purely on
    # `hashpartitioning(k#, 8)` vs `..., 32)` text.  Normalize the
    # trailing count of every partitioning spec (greedy within the
    # line: the count is the LAST numeric argument) and the
    # AdaptiveSparkPlan execution-state marker.
    p = re.sub(r"((?:hash|range|roundrobin)partitioning\([^\n]*),"
               r" \d+\)", r"\1, <n>)", p)
    p = re.sub(r"AdaptiveSparkPlan isFinalPlan=(?:true|false)",
               "AdaptiveSparkPlan", p)
    # Range's split count is defaultParallelism and the asof/slicing
    # recipes size their pid frame (spark.range(nb)) from
    # spark.sql.shuffle.partitions — both are session context, not
    # plan shape.  Normalizing the whole argument tuple blinds the
    # digest to LITERAL extent changes of spark.range sources (e.g. a
    # codebook size); those change RESULTS and are caught by the
    # oracle, which is the right net for semantic edits.
    p = re.sub(r"Range \([^)]*\)", "Range (<args>)", p)
    # round-robin repartitions print the capitalized physical form,
    # which the lowercase partitioning strip above misses; their count
    # is defaultParallelism (fan_out_small_scan, the under-partitioned
    # input defenses)
    p = re.sub(r"RoundRobinPartitioning\(\d+\)",
               "RoundRobinPartitioning(<n>)", p)
    # The timeline/value SLICING recipes (asof_join, twap, kmeans-class
    # range slicers) derive their approx_percentile boundary list from
    # spark.sql.shuffle.partitions, so the probability-array LITERAL
    # tracks the core count (7 probs at 8 cores, 31 at 32).  Normalize
    # arrays of 5+ fractions inside (partial_)approx_percentile only —
    # short explicit quantile lists (e.g. [0.25,0.5,0.75]) stay
    # digest-visible.
    p = re.sub(r"((?:partial_)?approx_percentile\([^\[\]]*)"
               r"\[(?:[-0-9.eE]+,){4,}[-0-9.eE]+\]",
               r"\1[<probs>]", p)
    return p


def plan_digest(df: DataFrame) -> str:
    """Stable digest of the executed plan SHAPE (see
    :func:`normalized_plan` for exactly what is stripped)."""
    return hashlib.sha256(normalized_plan(df).encode()).hexdigest()[:16]


# ---------------------------------------------------------------------------
# Stage digests for checkpoint-terminated plans (r12 verdict #1).
#
# Iterative operators (pagerank, dbscan, star_components, semdedup_exact)
# MUST localCheckpoint to bound lineage, but a checkpointed DataFrame's
# plan digests as `Scan ExistingRDD` + whatever follows — the drift alarm
# was structurally blind to interior rewrites of exactly the most complex
# plans in the corpus.  The fix: each such operator records the
# PRE-checkpoint plan of its load-bearing stages via `stage_digest(name,
# df)` — a no-op unless a collector is active, so production paths pay
# one `is None` check.  bench.py / digest_stability.py activate the
# collector around query construction and persist per-stage digests next
# to the end-to-end digest in PLAN_DIGESTS.json ("q171::grid_candidates"
# style keys in the diff).
#
# Loops call stage_digest every round; the collector keeps the FIRST
# occurrence per name (round 1's plan — later rounds differ only in the
# checkpointed scan they start from), so digests stay deterministic
# regardless of round count.
# ---------------------------------------------------------------------------

_STAGE_SINK: "dict[str, tuple[str, str]] | None" = None


def stage_digest(name: str, df: DataFrame) -> None:
    """Record the plan digest of an operator stage that is about to be
    ``localCheckpoint``ed (or otherwise erased from the final plan's
    lineage).  Call BEFORE the checkpoint; no-op unless a collector is
    active (:func:`capture_stage_digests`).  Digesting plans, not
    executes: ``executedPlan()`` on a lazy frame triggers physical
    planning only."""
    global _STAGE_SINK
    if _STAGE_SINK is None or name in _STAGE_SINK:
        return
    try:
        _STAGE_SINK[name] = (plan_digest(df), normalized_plan(df))
    except Exception:  # pragma: no cover — plan unavailable
        _STAGE_SINK[name] = ("", "")


class capture_stage_digests:
    """Context manager collecting :func:`stage_digest` calls issued
    while building (and materializing) a query.  Yields the dict
    ``{stage_name: (digest, normalized_plan_text)}`` — empty for
    queries whose plan never checkpoints.  Not reentrant (the corpus
    runs queries sequentially); nested use restores the outer sink."""

    def __enter__(self) -> "dict[str, tuple[str, str]]":
        global _STAGE_SINK
        self._prev = _STAGE_SINK
        _STAGE_SINK = {}
        return _STAGE_SINK

    def __exit__(self, *exc) -> None:
        global _STAGE_SINK
        _STAGE_SINK = self._prev


@dataclass
class _Entry:
    name: str
    started_at: float
    wall_s: float
    rows: int
    plan_digest: str
    error: str | None = None


@dataclass
class QueryLog:
    """Collects one record per executed query.

    >>> qlog = QueryLog()
    >>> n = qlog.run("daily_rollup", df)         # runs df.count()
    >>> qlog.run("head", df2, action=lambda d: len(d.take(10)))
    >>> qlog.to_df(spark).show()
    """
    entries: "list[_Entry]" = field(default_factory=list)

    def run(self, name: str, df: DataFrame, action=None):
        """Execute ``action(df)`` (default ``df.count()``), recording
        wall time, row count (when the action returns an int), the plan
        digest, and any error (re-raised after logging)."""
        t0 = time.time()
        t = time.perf_counter()
        err = None
        out: object = -1
        try:
            out = action(df) if action is not None else df.count()
            return out
        except Exception as e:  # noqa: BLE001 — log then re-raise
            err = f"{type(e).__name__}: {e}"
            raise
        finally:
            try:
                digest = plan_digest(df)
            except Exception:  # pragma: no cover — plan unavailable
                digest = ""
            self.entries.append(_Entry(
                name=name, started_at=t0,
                wall_s=round(time.perf_counter() - t, 6),
                rows=out if isinstance(out, int) else -1,
                plan_digest=digest, error=err))

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The log as a DataFrame (append it next to ``ingest_log``)."""
        return spark.createDataFrame(
            [(e.name, e.started_at, e.wall_s, e.rows, e.plan_digest,
              e.error) for e in self.entries],
            "name string, started_at double, wall_s double, rows long, "
            "plan_digest string, error string")
