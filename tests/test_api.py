"""Reference-shaped API tests: golden-file decode plus zip reads, eager and
lazy, with error semantics."""

import numpy as np
import pytest
import pyspark.sql.functions as F

from nasctn_sea_ingest_spark import api
from nasctn_sea_ingest_spark.functions import trace
from nasctn_sea_ingest_spark.sources.synth import build_sigmf, build_sweep_series

GOLDEN_V6 = "/root/reference/demos/data/example_v6.sigmf"


def test_read_seamf_golden():
    out = api.read_seamf(GOLDEN_V6)
    assert {"psd", "pvt", "pfp", "apd"} <= set(out)
    assert len(out["psd"]) == 34


def test_read_seamf_meta_golden():
    meta = api.read_seamf_meta(GOLDEN_V6)
    assert meta["plan"].traces


@pytest.fixture(scope="module")
def zpath(tmp_path_factory):
    d = tmp_path_factory.mktemp("zips")
    return build_sweep_series(str(d), 4, zip_name="a.zip")


def test_zipfile_as_sdf(spark, zpath):
    sdfs = api.read_seamf_zipfile_as_sdf(spark, zpath)
    assert {"psd", "pvt", "pfp", "apd", "channel_metadata",
            "sweep_metadata"} <= set(sdfs)
    assert sdfs["psd"].count() == 4 * 3 * 2
    assert sdfs["sweep_metadata"].count() == 4
    # trace() helper composes with the dict shape, like the reference
    one = trace(sdfs, "pfp", capture_statistic="mean", detector="rms")
    assert one.count() == 4 * 3


def test_zipfile_eager(spark, zpath):
    dfs = api.read_seamf_zipfile(spark, zpath, allow=2)
    assert len(dfs["psd"]) == 2 * 3 * 2
    assert np.isfinite(np.concatenate(
        [np.asarray(v) for v in dfs["psd"]["values"]])).all()


def test_as_wide_reference_shape():
    """as_wide reproduces the reference's MultiIndex matrix layout on the
    golden v6 file (SURVEY §1.2: 34×625 psd, keyed rows, physical x axis)."""
    out = api.read_seamf(GOLDEN_V6)
    wide = api.as_wide(out["psd"], "psd")
    assert wide.shape == (34, 625)
    assert list(wide.index.names) == ["datetime", "frequency",
                                      "capture_statistic"]
    assert wide.columns[0] == -4_992_000.0
    assert wide.columns[-1] == pytest.approx(-4_992_000.0 + 624 * 16_000.0)
    # .xs-style cross-section works like the reference
    one = wide.xs("max", level="capture_statistic")
    assert one.shape == (17, 625)
    pfp = api.as_wide(out["pfp"], "pfp")
    assert pfp.shape == (102, 560)
    assert list(pfp.index.names) == ["datetime", "frequency",
                                     "capture_statistic", "detector"]


def test_zipfile_error_modes(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("poison")
    (d / "ok.sigmf").write_bytes(build_sigmf())
    (d / "bad.sigmf").write_bytes(build_sigmf(bad_hash=True))
    with pytest.raises(RuntimeError, match="sha512"):
        api.read_seamf_zipfile_as_sdf(spark, str(d))["psd"].count()
    sdfs = api.read_seamf_zipfile_as_sdf(spark, str(d), errors="log")
    assert sdfs["psd"].count() == 3 * 2        # bad file dropped
    assert sdfs["sweep_metadata"].count() == 1  # metadata dropped too
