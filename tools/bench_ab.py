#!/usr/bin/env python
"""Interleaved A/B bench: attribute a cross-round bench drift to plans
vs host state, the SCALE.md §12 protocol as a reusable tool.

Runs the query corpus of TWO git refs (e.g. ``HEAD`` and the previous
round's final commit) strictly interleaved on one host — A, B, A, B —
so both trees see the same thermal/cache/daemon conditions, then
reports per-query best-of-runs deltas plus the position-matched
steady-state aggregate.  A real plan regression shows up as a stable
per-query delta; host drift shows up as both trees moving together
(§12 finding 1); cold-position accounting shows up only in the first
~20 canonical slots (§12 finding 2).

Usage::

    python tools/bench_ab.py <refA> <refB> [n_rounds]
    python tools/bench_ab.py --decode <refA> <refB> [n_rounds]

``--decode`` A/Bs the single-core sigmf decode tier instead of the
query corpus (one shared synthetic zip, best-of-5 per run per ref —
the §12 finding-4 comparison).

Each ref runs in its own ``git worktree`` and its own subprocess (one
Spark session per run — a shared session would import one codebase
for both).  Timed action = the full-plan ``noop`` sink after a
warm-up execution, matching bench.py's round-5 contract.  NEVER run
this concurrently with another Spark job (2-10x inflation).

Output: one JSON line per (ref, round) to stderr progress + a final
summary JSON on stdout: ``{"per_query": {q: {"a": best, "b": best}},
"sum_a": .., "sum_b": .., "worst_for_a": [...]}``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

DECODE_RUNNER = r"""
import json, sys, time, zipfile
sys.path.insert(0, sys.argv[1])
from nasctn_sea_ingest_spark.sources.sigmf import decode_sigmf
with zipfile.ZipFile(sys.argv[2]) as z:
    blobs = [z.read(n) for n in z.namelist() if n.endswith(".sigmf")]
for raw in blobs[:20]:
    decode_sigmf(raw, source="bench")          # warm imports/JIT
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    for raw in blobs:
        decode_sigmf(raw, source="bench")
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"files_per_sec": round(len(blobs) / best, 1)}))
"""

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
from nasctn_sea_ingest_spark import get_spark
from nasctn_sea_ingest_spark.plans import CORPUS
sf = sys.argv[2]
spark = get_spark(app_name="bench-ab",
                  master=f"local[{sys.argv[3]}]",
                  shuffle_partitions=int(sys.argv[3]))
spark.sparkContext.setLogLevel("ERROR")
out = {}
qs = sorted(CORPUS, key=lambda q: q.name)
only = os.environ.get("SPARK_GRAFT_AB_ONLY")   # comma-separated names:
if only:                                       # A/B a drift suspect alone
    names = set(only.split(","))
    qs = [q for q in qs if q.name in names]
for q in qs:
    try:
        df = q.spark(spark, sf)
        df.write.format("noop").mode("overwrite").save()   # warm
        t0 = time.perf_counter()
        q.spark(spark, sf).write.format("noop").mode("overwrite").save()
        out[q.name] = round(time.perf_counter() - t0, 4)
    except Exception:  # a ref may lack a query the other has
        out[q.name] = None
    spark.catalog.clearCache()
print(json.dumps(out))
"""


def _worktree(repo: str, ref: str, base: str, tag: str) -> str:
    d = os.path.join(base, tag)   # tag-named: A/B may be the same ref
    r = subprocess.run(["git", "-C", repo, "worktree", "add", "--detach",
                        d, ref], capture_output=True, text=True)
    if r.returncode:
        sys.exit(f"worktree add {ref} failed: {r.stderr.strip()}")
    return d


def _run(tree: str, sf: str, cpus: str) -> dict:
    r = subprocess.run([sys.executable, "-c", RUNNER, tree, sf, cpus],
                       capture_output=True, text=True, check=True)
    return json.loads(r.stdout.strip().splitlines()[-1])


def _decode_ab(repo: str, ref_a: str, ref_b: str, rounds: int) -> None:
    """Interleaved single-core decode-tier A/B over one shared zip."""
    base = tempfile.mkdtemp(prefix="bench_ab_dec_")
    sys.path.insert(0, repo)
    from nasctn_sea_ingest_spark.sources.synth import build_sweep_series
    zpath = build_sweep_series(base, 200, n_channels=15,
                               geometry=(625, 400, 560, 151),
                               zip_name="ab.zip")
    trees = {}
    try:
        for tag, ref in (("a", ref_a), ("b", ref_b)):
            trees[tag] = _worktree(repo, ref, base, tag)
        best: dict[str, float] = {}
        for rnd in range(rounds):
            for tag, ref in (("a", ref_a), ("b", ref_b)):
                r = subprocess.run(
                    [sys.executable, "-c", DECODE_RUNNER, trees[tag],
                     zpath], capture_output=True, text=True, check=True)
                fps = json.loads(r.stdout.strip().splitlines()[-1])[
                    "files_per_sec"]
                best[tag] = max(best.get(tag, 0.0), fps)
                print(f"# round {rnd} {tag}={ref}: {fps} files/s/core",
                      file=sys.stderr)
        print(json.dumps({"decode_fps_a": best["a"],
                          "decode_fps_b": best["b"]}))
    finally:
        for d in trees.values():
            subprocess.run(["git", "-C", repo, "worktree", "remove",
                            "--force", d], capture_output=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--decode"]
    decode = "--decode" in sys.argv[1:]
    if len(args) < 2:
        sys.exit(__doc__)
    if decode:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        _decode_ab(repo, args[0], args[1],
                   int(args[2]) if len(args) > 2 else 2)
        return
    sys.argv = [sys.argv[0]] + args
    ref_a, ref_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    base = tempfile.mkdtemp(prefix="bench_ab_")
    trees = {}
    try:
        for tag, ref in (("a", ref_a), ("b", ref_b)):
            trees[tag] = _worktree(repo, ref, base, tag)
        best: dict[str, dict[str, float]] = {}
        for rnd in range(rounds):
            for tag, ref in (("a", ref_a), ("b", ref_b)):
                res = _run(trees[tag], sf, cpus)
                for qname, dt in res.items():
                    if dt is None:
                        continue
                    slot = best.setdefault(qname, {})
                    slot[tag] = min(slot.get(tag, float("inf")), dt)
                total = sum(v for v in res.values() if v is not None)
                print(f"# round {rnd} {tag}={ref}: {total:.1f}s "
                      f"({len(res)} queries)", file=sys.stderr)
        common = {q: v for q, v in best.items()
                  if "a" in v and "b" in v}
        sum_a = round(sum(v["a"] for v in common.values()), 2)
        sum_b = round(sum(v["b"] for v in common.values()), 2)
        # most negative (b - a) = refA slowest relative to refB
        worst_for_a = sorted(common.items(),
                             key=lambda kv: kv[1]["b"] - kv[1]["a"])[:10]
        print(json.dumps({
            "per_query": common, "n_common": len(common),
            "sum_a": sum_a, "sum_b": sum_b,
            "worst_for_a": [{"q": q, "a": v["a"], "b": v["b"]}
                            for q, v in worst_for_a],
        }))
    finally:
        for d in trees.values():
            subprocess.run(["git", "-C", repo, "worktree", "remove",
                            "--force", d], capture_output=True)


if __name__ == "__main__":
    main()
