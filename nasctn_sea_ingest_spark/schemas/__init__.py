"""Declared schemas and per-version constants (SURVEY.md §7 step 1).

One place for every fixed contract of the engine:

- warehouse StructTypes (re-exported from the ingest job so writers and
  readers cannot drift),
- the physical trace-axis constants verified across all six metadata
  versions (reference ``seamf.py:67-115`` and the ``read_seamf.ipynb``
  cross-version outputs),
- the normalization vocabularies (detector / statistic rename maps,
  capture-key map) used by the decode planners.
"""

from ..sources.ingest import (  # noqa: F401
    CHANNEL_META_SCHEMA,
    REF_SCHEMA,
    SWEEP_META_SCHEMA,
    TRACE_SCHEMA,
)
from ..sources.multimodal import (  # noqa: F401
    FEATURE_SCHEMA,
    MEDIA_META,
    MEDIA_SCHEMA,
)
from ..sources.sigmf import (  # noqa: F401
    CAPTURE_KEYMAP,
    DETECTOR_MAP,
    STAT_MAP,
    TRACE_TABLES,
)

# Physical trace geometry, identical across v1–v6 golden files
# (SURVEY.md §1.2; lengths verified in tests/test_sigmf_decode.py).
TRACE_GEOMETRY = {
    #        length, x_start,       x_step,                  unit
    "psd": (625, -4_992_000.0, 16_000.0),          # Hz (baseband, centered)
    "pvt": (400, 0.0, 0.01),                       # s (capture elapsed)
    "pfp": (560, 0.0, 1.7857142857142855e-05),     # s (frame elapsed)
    "apd": (151, -180.0, 1.0),                     # dBm amplitude bins (v4+)
}

#: metadata versions the decode dispatcher accepts
SUPPORTED_VERSIONS = ("v0.1", "v0.2", "v0.3", "v0.4",
                      "v0.4.0", "v0.5.0", "v0.6.0", "0.6.0")

__all__ = [
    "TRACE_SCHEMA", "CHANNEL_META_SCHEMA", "SWEEP_META_SCHEMA", "REF_SCHEMA",
    "MEDIA_SCHEMA", "MEDIA_META", "FEATURE_SCHEMA",
    "DETECTOR_MAP", "STAT_MAP", "CAPTURE_KEYMAP", "TRACE_TABLES",
    "TRACE_GEOMETRY", "SUPPORTED_VERSIONS",
]
