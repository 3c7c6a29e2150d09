"""A/B the two duplicate_spans flag strategies under a planted viral
window (r14 verdict #4): one phrase planted at multiplicity M into a
novel base corpus, timing the one-scan COUNT-window form (whose
per-hash count partition is a single task of M rows) against the
map-side-combinable groupBy + semi-join form (two scans, no hot
task).  Results recorded in SCALE.md §41.

    python tools/viral_ab.py [base_docs] [M1 M2 ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    mults = [int(x) for x in sys.argv[2:]] or [0, 10_000, 100_000,
                                               1_000_000]
    from nasctn_sea_ingest_spark import get_spark
    from nasctn_sea_ingest_spark.operators.text import duplicate_spans
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    phrase = "vx vy vz"
    reps = 500                       # planted windows per viral doc
    for m in mults:
        rows = [(d, " ".join(f"b{d}w{i}" for i in range(60)))
                for d in range(base)]
        rows += [(10**7 + d, " ".join(phrase for _ in range(reps)))
                 for d in range(m // reps)]
        df = (spark.createDataFrame(rows, "doc_id long, text string")
              .repartition(cpus).localCheckpoint(eager=True))
        out = {}
        for strat in ("window", "groupby"):
            t0 = time.perf_counter()
            n = duplicate_spans(df, window=3,
                                flag_strategy=strat).count()
            out[strat] = time.perf_counter() - t0
            out["spans"] = n
        print(f"M={m:>9,}: window {out['window']:6.2f}s  "
              f"groupby {out['groupby']:6.2f}s  "
              f"(spans={out['spans']})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
