#!/usr/bin/env python
"""x_index standalone A/B (r12 verdict #5): bench.py's best-of-2
x_inverted_index_build_probe reported 8.04 s in the r12 driver run,
above the 6.7-7.3 s standalone band named when the metric moved to
the head-of-session slot.  This tool measures the SAME code in both
positions inside ONE process run, interleaved (the SCALE.md §12
protocol):

  A = fresh-session standalone: new Spark session, warm once, then
      best-of-2 of the exact bench block;
  B = bench-position replica: same session AFTER running the x_llm
      pipeline (the block that precedes x_index in bench.py),
      best-of-2.

Run ALONE on the host.  Prints per-round numbers and a final JSON
summary {"standalone_best": .., "post_llm_best": .., "spread": ..}.

    python tools/xindex_ab.py [n_rounds]     # default 3
"""
import gc
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _x_index_once(spark, sf_dir):
    from nasctn_sea_ingest_spark.operators.search import (
        bm25_search, build_inverted_index, load_index, write_index)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    dt = float("inf")
    for _ in range(2):                    # bench.py's best-of-2 block
        idx_tmp = tempfile.mkdtemp(prefix="ab_idx_")
        try:
            gc.collect()
            t0 = time.perf_counter()
            write_index(build_inverted_index(docs), idx_tmp,
                        n_shards=32)
            idx, _n = load_index(spark, idx_tmp)
            bm25_search(idx, ["the", "data", "model"], k=10,
                        n_shards=32).count()
            dt = min(dt, time.perf_counter() - t0)
        finally:
            shutil.rmtree(idx_tmp, ignore_errors=True)
    return dt


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from nasctn_sea_ingest_spark import get_spark
    from nasctn_sea_ingest_spark.plans.pipeline import (
        llm_corpus_pipeline)
    a_runs, b_runs = [], []
    for rnd in range(rounds):
        spark = get_spark(app_name="xindex-ab",
                          master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
        spark.sparkContext.setLogLevel("ERROR")
        # A: standalone (fresh session, only a tiny warmup ran)
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        a = _x_index_once(spark, sf_dir)
        a_runs.append(a)
        # B: bench position — after the x_llm pipeline in the SAME jvm
        packed, _m = llm_corpus_pipeline(spark, sf_dir)
        packed.unpersist(True)
        b = _x_index_once(spark, sf_dir)
        b_runs.append(b)
        print(f"# round {rnd}: standalone {a:.2f}s, post-llm {b:.2f}s",
              file=sys.stderr)
        spark.stop()
    print(json.dumps({
        "standalone_best": round(min(a_runs), 2),
        "standalone_all": [round(x, 2) for x in a_runs],
        "post_llm_best": round(min(b_runs), 2),
        "post_llm_all": [round(x, 2) for x in b_runs],
    }))


if __name__ == "__main__":
    main()
