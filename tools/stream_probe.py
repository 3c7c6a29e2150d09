#!/usr/bin/env python
"""Per-trigger cost probe for semdedup_stream (SCALE.md §25's claim,
measured): land W localized waves of B vectors each and time every
trigger.  The store grows linearly (B, 2B, ... WB rows) while each
batch stays B rows concentrated around its own random direction — the
operational regime of a corpus that lands in topical bursts.  The
claim under test: per-trigger wall stays ~FLAT as the store grows
(probe reads only touched buckets; candidates stay batch-local), i.e.
the monitor is O(batch), not O(state).  A full-store rescan design
would grow linearly across the run.

    python tools/stream_probe.py [W] [B] [k]   # default 17 waves x 2000, k=2
    python tools/stream_probe.py components [W] [B] [n_buckets]
        # r12 verdict #3 probe: per-trigger wall of the BUCKETED
        # incremental components face vs the whole-rewrite face on the
        # same workload — W waves of B disjoint-range edges (each wave
        # its own fresh components, store grows linearly).  The claim:
        # the bucketed face's per-trigger cost tracks TOUCHED BUCKETS
        # (flat once every bucket is touched per wave; sublinear in
        # store size), while the whole-rewrite face grows linearly
        # with state.

Run ALONE on the host (SCALE.md §12's rule).  Prints one line per
wave plus a first-vs-last summary.  Wave directions are seeded numpy
random unit vectors in 8-dim (max pairwise |cos| well under the 0.98
threshold) with sigma=0.15 noise, so within-wave cosines sit ~0.91 —
the probe measures TRIGGER overhead + candidate-bound join work, with
the alert path exercised but not exploding.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    waves = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    kdim = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    d = 8
    from nasctn_sea_ingest_spark import get_spark
    from nasctn_sea_ingest_spark.streaming import semdedup_stream
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(waves, d))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    C = np.abs(dirs @ dirs.T) - np.eye(waves)
    print(f"# {waves} waves x {batch} vectors, d={d}, k={kdim}; max cross-wave "
          f"|cos| of centers = {C.max():.3f} (threshold 0.98)")

    root = tempfile.mkdtemp(prefix="semdedup_probe_")
    land = os.path.join(root, "land")
    store = os.path.join(root, "store")
    alerts = os.path.join(root, "alerts")
    ck = os.path.join(root, "ck")
    os.makedirs(land)
    mean = np.zeros(d)
    comps = np.eye(d)[:kdim]
    walls = []
    try:
        for w in range(waves):
            pts = dirs[w] + rng.normal(scale=0.15, size=(batch, d))
            rows = [(int(w * 10_000_000 + i), [float(x) for x in v])
                    for i, v in enumerate(pts)]
            spark.createDataFrame(
                rows, "vec_id long, embedding array<double>") \
                .coalesce(1).write.mode("append").parquet(land)
            t0 = time.perf_counter()
            stream = (spark.readStream
                      .schema("vec_id long, embedding array<double>")
                      .parquet(land))
            q = semdedup_stream(stream, store, ck, alerts, mean, comps,
                                threshold=0.98, available_now=True)
            q.awaitTermination(300)
            q.stop()
            q.awaitTermination(60)
            dt = time.perf_counter() - t0
            walls.append(dt)
            print(f"wave {w:2d}: {dt:6.2f}s  store={batch * (w + 1)}")
        head = sum(walls[1:4]) / 3
        tail = sum(walls[-3:]) / 3
        print(f"# warm head (waves 1-3) {head:.2f}s vs tail "
              f"(last 3) {tail:.2f}s -> tail/head {tail / head:.2f}x "
              f"at {waves}x store growth")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def components():
    """r12 verdict #3 probe, two regimes:

    1. GROWTH: W waves of B edges on the bucketed face — per-trigger
       wall must stay flat as the store grows (measured 1.01x at 10x
       on this host, waves=10 B=2000 n_buckets=256).
    2. SEEDED: seed a LARGE store once, then land W small waves of B
       edges on BOTH faces.  The whole-rewrite face re-clusters the
       full store every trigger (O(state)); the bucketed face reads
       and rewrites only the ~2B node-hash buckets the wave touches.
       This is the regime the bucketed face exists for — at small
       state the whole-rewrite face's single coalesce(1) job is
       cheaper (its docstring says so), so run the comparison where
       state >> batch.
    """
    argv = sys.argv[2:]
    waves = int(argv[0]) if len(argv) > 0 else 5
    batch = int(argv[1]) if len(argv) > 1 else 20
    n_buckets = int(argv[2]) if len(argv) > 2 else 1024
    seed = int(argv[3]) if len(argv) > 3 else 300_000
    from nasctn_sea_ingest_spark import get_spark
    from nasctn_sea_ingest_spark.streaming import (
        components_stream, components_stream_bucketed)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    print(f"# seed {seed} edges, then {waves} waves x {batch} edges; "
          f"n_buckets={n_buckets} (bucketed face)")
    results = {}
    for face, mk in (
            ("bucketed", lambda s, o, c: components_stream_bucketed(
                s, o, c, n_buckets=n_buckets, available_now=True)),
            ("whole-rewrite", lambda s, o, c: components_stream(
                s, o, c, available_now=True))):
        root = tempfile.mkdtemp(prefix=f"cc_probe_{face[:4]}_")
        land = os.path.join(root, "land")
        out = os.path.join(root, "cc")
        ck = os.path.join(root, "ck")
        os.makedirs(land)

        def trigger():
            stream = spark.readStream.schema(
                "d1 long, d2 long").parquet(land)
            q = mk(stream, out, ck)
            q.awaitTermination(1200)
            q.stop()
            q.awaitTermination(60)

        walls = []
        try:
            rows = [(i, i + 50_000_000) for i in range(seed)]
            spark.createDataFrame(rows, "d1 long, d2 long") \
                .coalesce(4).write.mode("append").parquet(land)
            t0 = time.perf_counter()
            trigger()
            print(f"{face} seed: {time.perf_counter() - t0:6.1f}s  "
                  f"state={2 * seed}")
            for w in range(waves):
                base = 100_000_000 + w * 10_000_000
                rows = [(base + i, base + i + 5_000_000)
                        for i in range(batch)]
                spark.createDataFrame(rows, "d1 long, d2 long") \
                    .coalesce(1).write.mode("append").parquet(land)
                t0 = time.perf_counter()
                trigger()
                dt = time.perf_counter() - t0
                walls.append(dt)
                print(f"{face} wave {w:2d}: {dt:6.2f}s")
            avg = sum(walls) / len(walls)
            results[face] = avg
            print(f"# {face}: mean small-wave trigger {avg:.2f}s "
                  f"at state={2 * seed}")
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    if len(results) == 2:
        print(f"# summary: bucketed {results['bucketed']:.2f}s vs "
              f"whole-rewrite {results['whole-rewrite']:.2f}s per "
              f"small trigger at state={2 * seed} "
              f"({results['whole-rewrite'] / results['bucketed']:.1f}x)")


def litter():
    """r13 verdict #5 probe: many (default 50) small triggers on the
    bucketed components face, auto-compaction ON vs OFF.  The claim:
    with the cadence ON the per-leaf parquet file count (the
    per-trigger read fan-in — the file COUNT, not bytes, is the scan
    bottleneck at 10^5 triggers) stays bounded near the threshold,
    while OFF it grows linearly with trigger count; per-trigger wall
    must not regress.  Disjoint waves (each its own fresh clusters)
    keep the touched set constant so litter is the only variable.

        python tools/stream_probe.py litter [W] [B] [n_buckets] [cap]
    """
    argv = sys.argv[2:]
    waves = int(argv[0]) if len(argv) > 0 else 50
    batch = int(argv[1]) if len(argv) > 1 else 50
    n_buckets = int(argv[2]) if len(argv) > 2 else 8
    cap = int(argv[3]) if len(argv) > 3 else 16
    from nasctn_sea_ingest_spark import get_spark
    from nasctn_sea_ingest_spark.streaming import (
        components_stream_bucketed)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    print(f"# {waves} waves x {batch} edges, n_buckets={n_buckets}, "
          f"auto_compact_files={cap} vs None")
    summary = {}
    for label, acf in (("on", cap), ("off", None)):
        root = tempfile.mkdtemp(prefix=f"cc_litter_{label}_")
        land = os.path.join(root, "land")
        out = os.path.join(root, "cc")
        ck = os.path.join(root, "ck")
        os.makedirs(land)

        def max_leaf_files():
            worst = 0
            for aux in ("", "_directory", "_merges"):
                base = os.path.join(out, aux) if aux else out
                if not os.path.isdir(base):
                    continue
                for d in os.listdir(base):
                    if "=" not in d or d.startswith("."):
                        continue
                    leaf = os.path.join(base, d)
                    worst = max(worst, sum(
                        1 for f in os.listdir(leaf)
                        if f.endswith(".parquet")))
            return worst

        walls = []
        try:
            for w in range(waves):
                base_id = 1_000_000 + w * 100_000
                rows = [(base_id + i, base_id + i + 50_000)
                        for i in range(batch)]
                spark.createDataFrame(rows, "d1 long, d2 long") \
                    .coalesce(1).write.mode("append").parquet(land)
                stream = spark.readStream.schema(
                    "d1 long, d2 long").parquet(land)
                t0 = time.perf_counter()
                q = components_stream_bucketed(
                    stream, out, ck, n_buckets=n_buckets,
                    auto_compact_files=acf, available_now=True)
                q.awaitTermination(600)
                q.stop()
                q.awaitTermination(60)
                walls.append(time.perf_counter() - t0)
                if (w + 1) % 10 == 0:
                    print(f"auto={label} wave {w + 1:3d}: "
                          f"max leaf files {max_leaf_files():4d}, "
                          f"trigger {walls[-1]:5.2f}s")
            import json as _json
            geom = {}
            gp = os.path.join(out, "_store_geometry.json")
            if os.path.exists(gp):
                geom = _json.load(open(gp))
            summary[label] = (max_leaf_files(),
                              sum(walls) / len(walls),
                              geom.get("n_compactions", 0))
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    for label, (mf, avg, nc) in summary.items():
        print(f"# auto={label}: final max leaf files {mf}, mean "
              f"trigger {avg:.2f}s, compactions {nc}")


def lpa():
    """r15 lpa_communities_stream cost probe (r14 verdict #6): the
    face's documented contract is an O(state) snapshot rewrite per
    trigger PLUS an LPA re-run bounded by the touched components.
    Two phases over one store seeded with a giant G-node component:

    - ``untouched``: W waves each adding a fresh DISJOINT small
      component — the giant component must stay out of the re-run
      scope, so per-trigger wall tracks only the O(state) rewrite
      term (shallow slope, no per-wave LPA blowup);
    - ``touched``: W waves each attaching one new node to the giant
      component — the whole component legitimately re-runs every
      trigger (labels may all flip); this measures that inherent
      bound so the docstring's trade is a number, not a hope.

        python tools/stream_probe.py lpa [G] [W]
    """
    argv = sys.argv[2:]
    g = int(argv[0]) if len(argv) > 0 else 20_000
    waves = int(argv[1]) if len(argv) > 1 else 10
    from nasctn_sea_ingest_spark import get_spark
    from nasctn_sea_ingest_spark.streaming import lpa_communities_stream
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    schema = "d1 long, d2 long"
    for phase in ("untouched", "touched"):
        root = tempfile.mkdtemp(prefix=f"lpa_probe_{phase}_")
        land = os.path.join(root, "land")
        out = os.path.join(root, "lpa")
        os.makedirs(land)

        def run():
            stream = spark.readStream.schema(schema).parquet(land)
            q = lpa_communities_stream(
                stream, out, os.path.join(root, "ck"), max_iter=8,
                auto_compact_files=8, available_now=True)
            q.awaitTermination(600)
            q.stop()
            q.awaitTermination(60)

        try:
            # seed: a G-node giant component (chain of cliquelets)
            giant = [(i, i + 1) for i in range(g - 1)]
            spark.createDataFrame(giant, schema) \
                .coalesce(1).write.mode("append").parquet(land)
            t0 = time.perf_counter()
            run()
            seed_wall = time.perf_counter() - t0
            walls = []
            for w in range(waves):
                if phase == "untouched":
                    base = 10**7 + w * 100
                    wave = [(base + i, base + i + 1) for i in range(9)]
                else:
                    wave = [(g + w, 0)]       # attach to the giant
                spark.createDataFrame(wave, schema) \
                    .coalesce(1).write.mode("append").parquet(land)
                t0 = time.perf_counter()
                run()
                walls.append(time.perf_counter() - t0)
            head = sum(walls[:3]) / 3
            tail = sum(walls[-3:]) / 3
            print(f"# {phase}: G={g}, seed {seed_wall:.2f}s, "
                  f"head {head:.2f}s vs tail {tail:.2f}s "
                  f"({tail / head:.2f}x), per-wave "
                  + " ".join(f"{x:.2f}" for x in walls))
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def widx():
    """duplicate_spans_stream per-trigger cost probe, two workloads:

    ``novel`` (r14's shape): W waves of B docs, half-novel
    half-recycled phrases — the index AND the distinct-hash set both
    grow linearly.  Claim: per-trigger cost tracks the (h, n) counts
    sidecar (16-byte rows, no shuffle), never the occurrence index.

    ``dup`` (r15, the r14 verdict #1 done-bar): every wave streams
    the SAME B docs verbatim (fresh doc_ids) — the occurrence index
    grows by a full wave of rows per trigger while the distinct-hash
    set stays CONSTANT after wave 1.  Claim: per-trigger wall is flat
    at 50x index growth; the old probe (prior = groupBy over the full
    occurrence store) grew linearly here.

        python tools/stream_probe.py widx [W] [B] [n_buckets] [mode]
    """
    import random
    argv = sys.argv[2:]
    waves = int(argv[0]) if len(argv) > 0 else 12
    batch = int(argv[1]) if len(argv) > 1 else 400
    n_buckets = int(argv[2]) if len(argv) > 2 else 64
    mode = argv[3] if len(argv) > 3 else "novel"
    from nasctn_sea_ingest_spark import get_spark
    from nasctn_sea_ingest_spark.streaming import (
        duplicate_spans_snapshot, duplicate_spans_stream)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    rnd = random.Random(7)
    phrases = [" ".join(f"p{rnd.randrange(500)}x{i}" for i in range(15))
               for _ in range(64)]          # the recycled boilerplate
    root = tempfile.mkdtemp(prefix="widx_probe_")
    land = os.path.join(root, "land")
    out = os.path.join(root, "widx")
    os.makedirs(land)
    print(f"# {waves} waves x {batch} docs, ~60 words/doc, "
          f"n_buckets={n_buckets}")
    fixed_docs = [" ".join(f"s{d}w{i}" for i in range(45))
                  + " " + rnd.choice(phrases) for d in range(batch)]
    walls = []
    try:
        for w in range(waves):
            rows = []
            for d in range(batch):
                if mode == "dup":
                    # same text every wave: occurrences grow, the
                    # distinct-hash set is constant after wave 1
                    rows.append((w * batch + d, fixed_docs[d]))
                else:
                    novel = " ".join(
                        f"w{w}d{d}t{i}" for i in range(45))
                    rows.append((w * batch + d,
                                 novel + " " + rnd.choice(phrases)))
            spark.createDataFrame(rows, "doc_id long, text string") \
                .coalesce(1).write.mode("append").parquet(land)
            stream = spark.readStream.schema(
                "doc_id long, text string").parquet(land)
            t0 = time.perf_counter()
            q = duplicate_spans_stream(
                stream, out, os.path.join(root, "ck"),
                os.path.join(root, "al"), window=12,
                n_buckets=n_buckets, auto_compact_files=8,
                available_now=True)
            q.awaitTermination(600)
            q.stop()
            q.awaitTermination(60)
            walls.append(time.perf_counter() - t0)
            print(f"wave {w:2d}: {walls[-1]:6.2f}s  "
                  f"index={(w + 1) * batch} docs")
        n_spans = duplicate_spans_snapshot(spark, out).count()
        idx_rows = spark.read.parquet(out).count()
        cts_rows = spark.read.parquet(
            os.path.join(out, "_counts")).count()
        head = sum(walls[1:4]) / 3
        tail = sum(walls[-3:]) / 3
        print(f"# snapshot spans={n_spans}; index rows={idx_rows}, "
              f"sidecar rows={cts_rows} "
              f"({idx_rows / max(cts_rows, 1):.1f}x occupancy)")
        print(f"# warm head {head:.2f}s vs tail {tail:.2f}s at "
              f"{waves}x index ({tail / head:.2f}x)")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "components":
        components()
    elif len(sys.argv) > 1 and sys.argv[1] == "litter":
        litter()
    elif len(sys.argv) > 1 and sys.argv[1] == "widx":
        widx()
    elif len(sys.argv) > 1 and sys.argv[1] == "lpa":
        lpa()
    else:
        main()
