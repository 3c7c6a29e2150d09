"""nasctn_sea_ingest_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of usnistgov/nasctn-sea-ingest.

The reference (`/root/reference/src/sea_ingest`) decodes NASCTN SEA spectrum
sensor ``.sigmf`` archives into tidy pandas/Dask tables and runs time-series
analytics over them.  This package re-expresses that entire surface — decode,
six-version schema normalization, partitioned ingest, and the notebook query
workload — as idiomatic Spark DataFrame / SQL plans, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) that a 100 TB deployment needs.

Layout
------
- ``schemas``    : StructType declarations + per-version constants
- ``sources``    : sigmf decode core, zip listing, ingest job (mapInPandas)
- ``operators``  : as-of join, array aggregates, dedup, similarity, text, ...
- ``functions``  : scalar/dB/axis helper expressions
- ``plans``      : the declared query corpus + DuckDB oracle SQL
- ``streaming``  : structured-streaming ingest of a sensor landing directory
"""

from .session import get_spark  # noqa: F401

__version__ = "0.1.0"
