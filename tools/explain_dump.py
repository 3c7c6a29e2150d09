#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named corpus queries to files.

    python tools/explain_dump.py plans/r15 before q163_dbscan q115_pagerank
    python tools/explain_dump.py plans/r15 after --all

Writes ``<outdir>/<qname>_<tag>.txt`` per query.  Driver-side only (no
jobs run except what plan building itself requires — checkpoint-
terminated operators DO execute their interior stages to build the final
plan; that is inherent to how they are written).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    outdir, tag, *names = sys.argv[1:]
    os.makedirs(os.path.join(REPO, outdir), exist_ok=True)

    from nasctn_sea_ingest_spark import get_spark
    from nasctn_sea_ingest_spark.plans import CORPUS

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(app_name="explain_dump", master=f"local[{cpus}]",
                      shuffle_partitions=cpus,
                      extra_conf={
                          "spark.sql.legacy.parquet.nanosAsLong": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    scope = CORPUS if "--all" in names else \
        [q for q in CORPUS if q.name in names]
    missing = set(n for n in names if n != "--all") \
        - {q.name for q in scope}
    if missing:
        print(f"unknown queries: {sorted(missing)}", file=sys.stderr)
        return 1
    for q in scope:
        df = q.spark(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(REPO, outdir, f"{q.name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({txt.count('Exchange')} Exchange refs)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
