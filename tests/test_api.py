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
            "sweep_metadata", "sensor_metadata"} <= set(sdfs)
    assert sdfs["psd"].count() == 4 * 3 * 2
    assert sdfs["sweep_metadata"].count() == 4
    # reference product-key parity: sensor_metadata = {timezone} per file
    sm = sdfs["sensor_metadata"].toPandas()
    assert list(sm.columns) == ["source_file", "timezone"]
    assert len(sm) == 4
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


def test_read_seamf_sensor_metadata_key():
    """7-key product parity with reference read_seamf (seamf.py:231):
    sensor_metadata = {timezone}, also present in arrays tier."""
    for unpack in ("frames", "arrays"):
        out = api.read_seamf(GOLDEN_V6, unpack=unpack)
        sm = out["sensor_metadata"]
        assert sm["timezone"].iloc[0] == \
            out["sweep_metadata"]["timezone"].iloc[0]


def test_read_seamf_unpack_tiers():
    """`unpack` reproduces the reference's force_loader_cls output tiers
    (BASELINE.md single-file decode rows): bytes → raw float16 payload,
    arrays → stacked ndarrays, frames (default) → dict of frames."""
    frames = api.read_seamf(GOLDEN_V6)
    arrays = api.read_seamf(GOLDEN_V6, unpack="arrays")
    raw = api.read_seamf(GOLDEN_V6, unpack="bytes")

    assert arrays["psd"].shape == (34, 625)
    assert arrays["pfp"].shape == (102, 560)
    np.testing.assert_array_equal(
        arrays["psd"][0], np.asarray(frames["psd"]["values"].iloc[0]))
    # metadata frames ride along unchanged
    assert arrays["channel_metadata"].equals(frames["channel_metadata"])

    vals = np.frombuffer(raw["data"], dtype=np.float16)
    n_frame_vals = sum(
        sum(len(v) for v in frames[t]["values"])
        for t in ("psd", "pvt", "pfp", "apd", "apd_raw") if t in frames)
    assert vals.size == n_frame_vals
    assert "core:sha512" in raw["meta"]["global"]
    with pytest.raises(ValueError, match="unpack"):
        api.read_seamf(GOLDEN_V6, unpack="wat")


def _pfunc(d):
    psd = d["psd"].copy()
    psd["vmax"] = [float(np.max(v)) for v in psd["values"]]
    return {"psd_max": psd[["datetime", "frequency", "capture_statistic",
                            "vmax"]],
            "note": "non-frame values stay driver-side"}


def test_partition_func_hook(spark, zpath):
    """partition_func sees each decoded batch dict and its frame-valued
    outputs become lazy DataFrames (reference ziparchive.py:210-273)."""
    sdfs = api.read_seamf_zipfile_as_sdf(spark, zpath, partition_func=_pfunc)
    assert set(sdfs) == {"psd_max"}
    pdf = sdfs["psd_max"].toPandas()
    assert len(pdf) == 4 * 3 * 2
    assert pdf["vmax"].notna().all()
    # row-level parity with the plain decode path
    plain = api.read_seamf_zipfile(spark, zpath)["psd"]
    want = sorted(float(np.max(v)) for v in plain["values"])
    assert want == sorted(pdf["vmax"])


def _pickle_sink(pdf, path, pid):
    import os
    out = os.path.join(path, f"part-{pid}.pkl")
    pdf.to_pickle(out)
    return out


def test_write_partitions(spark, tmp_path):
    """Custom side-effecting sink: write_fn runs once per partition and the
    returned log accounts for every row (reference map_partitions sink)."""
    import pandas as pd
    df = spark.range(0, 100, 1, 4).withColumn("v", F.col("id") * 2)
    log = api.write_partitions(df, _pickle_sink, str(tmp_path))
    assert log["n_rows"].sum() == 100
    back = pd.concat([pd.read_pickle(f) for f in log["out_file"].dropna()])
    assert sorted(back["id"]) == list(range(100))
    assert (back["v"] == back["id"] * 2).all()


def test_zipfile_error_modes(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("poison")
    (d / "ok.sigmf").write_bytes(build_sigmf())
    (d / "bad.sigmf").write_bytes(build_sigmf(bad_hash=True))
    # errors='raise' is LAZY (dask parity): the failure surfaces at the
    # first action that touches the bad file, as the executor-raised
    # SparkRuntimeException carrying the decode error text
    with pytest.raises(Exception, match="sha512"):
        api.read_seamf_zipfile_as_sdf(spark, str(d))["psd"].count()
    # ... and metadata products raise too (never silently drop the file)
    with pytest.raises(Exception, match="sha512"):
        api.read_seamf_zipfile_as_sdf(spark, str(d))["sweep_metadata"] \
            .count()
    sdfs = api.read_seamf_zipfile_as_sdf(spark, str(d), errors="log")
    assert sdfs["psd"].count() == 3 * 2        # bad file dropped
    assert sdfs["sweep_metadata"].count() == 1  # metadata dropped too


@pytest.fixture(scope="module")
def zpath12(tmp_path_factory):
    d = tmp_path_factory.mktemp("zips12")
    return build_sweep_series(str(d), 12, zip_name="b.zip")


def test_read_seamf_zipfile_as_delayed(spark, zpath12):
    """Delayed analog: list of per-partition lazy reads; each .compute()
    yields that partition's dict of pandas frames only."""
    objs = api.read_seamf_zipfile_as_delayed(spark, zpath12,
                                             limit_count=12,
                                             partition_size=5)
    assert [len(o) for o in objs] == [5, 5, 2]
    got = objs[0].compute()
    assert set(got) >= {"psd", "pvt", "pfp", "channel_metadata",
                        "sweep_metadata", "sensor_metadata"}
    assert got["sweep_metadata"].shape[0] == 5          # ONLY this batch
    assert got["psd"]["source_file"].nunique() == 5
    # compute() helper mirrors dask.compute over the list
    all_parts = api.compute(objs[1:])
    assert [p["sweep_metadata"].shape[0] for p in all_parts] == [5, 2]


def test_restore_multiindex(spark, zpath):
    dfs = api.read_seamf_zipfile(spark, zpath, allow=3, errors="log")
    out = api.restore_multiindex(dfs)
    assert list(out["psd"].index.names) == ["datetime", "frequency",
                                            "capture_statistic"]
    assert list(out["pfp"].index.names) == ["datetime", "frequency",
                                            "capture_statistic", "detector"]
    assert list(out["channel_metadata"].index.names) == ["datetime",
                                                         "frequency"]
    # sweep/sensor metadata pass through unindexed (reference skip)
    assert out["sweep_metadata"].index.name is None
