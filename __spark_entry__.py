"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary rollup (the
capture_summary analog, SURVEY.md §2 D6) on sf0.001.  ``queries()`` /
``oracle_sql()`` expose the full declared corpus from
``nasctn_sea_ingest_spark.plans``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nasctn_sea_ingest_spark.plans import CORPUS  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    flagship = next(q for q in CORPUS if q.name == "q01_pricing_summary")
    return flagship.spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark for q in CORPUS}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.sql for q in CORPUS if q.sql is not None}
