"""Decode-parity tests for the pure-Python ``.sigmf`` core against the
reference's six golden files (``/root/reference/demos/data/example_v*.sigmf``,
the same fixtures its own tests use — reference ``tests/test_seamf.py:16-34``).

The reference package itself is not importable in this container (missing
deps), so instead of output diffing these assert the *published* invariants:
per-version trace shapes and axes from SURVEY.md §1.2 / the
``read_seamf.ipynb`` cross-version outputs, plus the error contracts.
"""

import lzma
import tarfile

import numpy as np
import pytest

from nasctn_sea_ingest_spark.sources.sigmf import (
    SigmfError,
    decode_sigmf,
    decode_sigmf_meta,
    timezone_from_longitude,
)

GOLDEN = "/root/reference/demos/data/example_v{v}.sigmf"


def golden(v: int):
    tz = "America/Denver" if v <= 3 else None
    return decode_sigmf(GOLDEN.format(v=v), tz=tz)


@pytest.fixture(scope="module")
def all_versions():
    return {v: golden(v) for v in range(1, 7)}


def test_tables_per_version(all_versions):
    for v, out in all_versions.items():
        base = {"psd", "pvt", "pfp", "channel_metadata", "sweep_metadata",
                "sensor_metadata"}
        # v1-v3: variable-length APD pair (apd_raw); v4+: tabular apd
        expected = base | ({"apd_raw"} if v <= 3 else {"apd"})
        assert set(out) == expected, f"v{v}"


def test_trace_shapes_and_axes(all_versions):
    for v, out in all_versions.items():
        n_ch = len(out["channel_metadata"])
        assert n_ch == (17 if v >= 5 else 15)
        # rows per table: psd 2/ch (max,mean), pvt 2/ch (peak,rms), pfp 6/ch
        assert len(out["psd"]) == 2 * n_ch
        assert len(out["pvt"]) == 2 * n_ch
        assert len(out["pfp"]) == 6 * n_ch
        for _, r in out["psd"].iterrows():
            assert len(r["values"]) == 625
        for _, r in out["pvt"].iterrows():
            assert len(r["values"]) == 400
        for _, r in out["pfp"].iterrows():
            assert len(r["values"]) == 560
        # axes (SURVEY §1.2 table; read_seamf.ipynb cell 5: same for v1-v6)
        assert out["psd"]["x_start"].iloc[0] == -4_992_000.0
        assert out["psd"]["x_step"].iloc[0] == 16_000.0
        assert out["pvt"]["x_start"].iloc[0] == 0.0
        assert out["pvt"]["x_step"].iloc[0] == pytest.approx(0.01)
        assert out["pfp"]["x_step"].iloc[0] == pytest.approx(1.7857142857e-05)
        if v >= 4:
            apd = out["apd"]
            assert len(apd) == n_ch
            assert all(len(r) == 151 for r in apd["values"])
            assert apd["x_start"].iloc[0] == -180.0
            assert apd["x_step"].iloc[0] == 1.0


def test_vocabularies_normalized(all_versions):
    """Detector/statistic names land on one vocabulary across versions
    (reference rename maps seamf.py:118-127, :474, :824-836)."""
    for v, out in all_versions.items():
        assert set(out["psd"]["capture_statistic"]) == {"max", "mean"}, f"v{v}"
        assert set(out["pvt"]["detector"]) == {"peak", "rms"}, f"v{v}"
        assert set(out["pfp"]["capture_statistic"]) == {"min", "max", "mean"}
        assert set(out["pfp"]["detector"]) == {"peak", "rms"}


def test_cross_version_schema_equality(all_versions):
    """read_seamf.ipynb cells 3/5: identical key columns for all versions."""
    cols = {v: {t: list(out[t].columns) for t in ("psd", "pvt", "pfp")}
            for v, out in all_versions.items()}
    for v in range(2, 7):
        assert cols[v] == cols[1], f"v{v} vs v1"


def test_channel_grid(all_versions):
    for v, out in all_versions.items():
        ch = out["channel_metadata"]
        freqs = sorted(ch["frequency"])
        # 10 MHz channel grid in the 3.5 GHz CBRS band
        steps = np.diff(freqs)
        assert (steps > 0).all()
        assert np.allclose(steps % 5e6, 0)
        assert 3.5e9 < freqs[0] < 3.7e9
        # per-capture keys present and joinable to traces
        assert set(out["psd"]["frequency"]) == set(freqs)
        assert ch["datetime"].is_monotonic_increasing


def test_channel_metadata_v4plus(all_versions):
    for v in (4, 5, 6):
        ch = all_versions[v]["channel_metadata"]
        for c in ("overload", "cal_gain_dB", "cal_noise_figure_dB",
                  "cal_temperature_degC", "sigan_reference_level_dBm",
                  "sigan_attenuation_dB", "sigan_preamp_enable"):
            assert c in ch.columns, f"v{v} missing {c}"
        assert ch["cal_gain_dB"].between(0, 60).all()
        assert ch["cal_noise_figure_dB"].between(0, 30).all()


def test_values_plausible(all_versions):
    for v, out in all_versions.items():
        psd = np.concatenate(out["psd"]["values"].to_list())
        assert np.isfinite(psd).all()
        assert (psd > -250).all() and (psd < 0).all()  # dBm/Hz range
        if v >= 4:
            apd = np.concatenate(out["apd"]["values"].to_list())
            ok = apd[np.isfinite(apd)]
            assert (ok >= 0).all() and (ok <= 1).all()  # probabilities


def test_sweep_metadata(all_versions):
    for v, out in all_versions.items():
        sm = out["sweep_metadata"]
        assert len(sm) == 1
        assert sm["sample_rate"].iloc[0] == pytest.approx(14e6)
        assert sm["timezone"].iloc[0] in ("America/Denver", "America/Boston",
                                          "America/Los_Angeles")
    # v4+ carries edge-computed channel power summaries (schemas.py:284-285)
    for v in (4, 5, 6):
        sm = all_versions[v]["sweep_metadata"].iloc[0]
        n_ch = len(all_versions[v]["channel_metadata"])
        assert len(sm["max_of_max_channel_powers"]) == n_ch


def test_summary_cross_check(all_versions):
    """The edge-computed max_of_max_channel_powers equals array_max of the
    max-detector PVT trace per channel (A11 oracle cross-check)."""
    for v in (4, 5, 6):
        out = all_versions[v]
        sm = out["sweep_metadata"].iloc[0]
        pvt = out["pvt"]
        peak = (pvt[pvt["detector"] == "peak"]
                .sort_values("frequency"))
        got = [float(np.max(r)) for r in peak["values"]]
        want = [float(x) for x in sm["max_of_max_channel_powers"]]
        assert np.allclose(got, want, atol=0.51), f"v{v}"  # rounded at edge


def test_metadata_fast_path():
    for v in range(1, 7):
        tz = "America/Denver" if v <= 3 else None
        d = decode_sigmf_meta(GOLDEN.format(v=v), tz=tz)
        assert d["plan"].traces, f"v{v}"


def test_tz_required_pre_v4():
    for v in (1, 2, 3):
        with pytest.raises(SigmfError, match="timezone"):
            decode_sigmf(GOLDEN.format(v=v))


def test_tz_autodetect_v4plus(all_versions):
    # golden sensors sit in the Mountain bucket (seamf.py:38-46 parity)
    for v in (4, 5, 6):
        assert all_versions[v]["sweep_metadata"]["timezone"].iloc[0] \
            == "America/Denver"


def test_timezone_buckets():
    assert timezone_from_longitude(-117.5) == "America/Los_Angeles"
    assert timezone_from_longitude(-105.3) == "America/Denver"
    assert timezone_from_longitude(-71.0) == "America/Boston"
    assert timezone_from_longitude(100.0) is None


def _tamper(path: str) -> bytes:
    """Flip one payload byte inside the tar, keeping metadata intact."""
    import io
    with open(path, "rb") as f:
        raw = f.read()
    src = tarfile.TarFile(fileobj=io.BytesIO(raw))
    out_buf = io.BytesIO()
    dst = tarfile.TarFile(fileobj=out_buf, mode="w")
    for m in src.getmembers():
        if not m.isfile():
            continue
        data = src.extractfile(m).read()
        if m.name.endswith(".sigmf-data"):
            data = data[:-1] + bytes([data[-1] ^ 0xFF])
        info = tarfile.TarInfo(m.name)
        info.size = len(data)
        dst.addfile(info, io.BytesIO(data))
    dst.close()
    return out_buf.getvalue()


def test_hash_check():
    bad = _tamper(GOLDEN.format(v=6))
    with pytest.raises(SigmfError, match="sha512"):
        decode_sigmf(bad)
    # hash_check=False skips the gate and fails later or succeeds per lzma
    try:
        decode_sigmf(bad, hash_check=False)
    except (SigmfError, lzma.LZMAError):
        pass


def test_decode_accepts_bytes_and_path():
    with open(GOLDEN.format(v=6), "rb") as f:
        raw = f.read()
    a = decode_sigmf(raw)
    b = decode_sigmf(GOLDEN.format(v=6))
    assert np.array_equal(a["psd"]["values"].iloc[0], b["psd"]["values"].iloc[0])
