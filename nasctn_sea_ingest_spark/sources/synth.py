"""Synthetic v0.6.0-style ``.sigmf`` generator: inverts the decode path —
concatenate per-channel float16 traces, xz-compress, tar with metadata whose
``core:sha512`` matches. Layout mirrors the golden ``example_v6.sigmf``
metadata (inspected, not copied; FIXTURES.md §7).

Used by the test suite (small geometry) and by ``bench.py`` at the
reference-realistic geometry (15 channels × 5,561 halves/channel) to measure
decode throughput against BASELINE.md.

Poison options (``bad_hash`` / ``truncate`` / ``no_geolocation``) exercise
the quarantine and timezone-error paths."""

from __future__ import annotations

import hashlib
import io
import json
import lzma
import tarfile

import numpy as np

PSD_LEN, PVT_LEN, PFP_LEN, APD_LEN = 32, 20, 28, 16
PER_CH = 2 * PSD_LEN + 2 * PVT_LEN + 6 * PFP_LEN + APD_LEN


def build_sigmf(start_iso: str = "2023-09-17T00:00:00.000Z",
                n_channels: int = 3, task: int = 1, seed: int = 0,
                bad_hash: bool = False, truncate: bool = False,
                no_geolocation: bool = False,
                geometry: tuple = (PSD_LEN, PVT_LEN, PFP_LEN, APD_LEN)) -> bytes:
    psd_len, pvt_len, pfp_len, apd_len = geometry
    rng = np.random.default_rng(seed)
    per_ch = 2 * psd_len + 2 * pvt_len + 6 * pfp_len + apd_len
    freqs = [3.545e9 + 10e6 * k for k in range(n_channels)]
    base = np.datetime64(start_iso.rstrip("Z"), "ms")

    blocks, captures = [], []
    pvt_peak_max, pvt_rms_median = [], []
    for ch, freq in enumerate(freqs):
        psd = rng.normal(-170, 5, (2, psd_len))
        pvt = np.sort(rng.normal(-80, 8, (2, pvt_len)), axis=0)[::-1]  # peak>=rms
        pfp = rng.normal(-85, 6, (6, pfp_len))
        apd = np.clip(np.sort(rng.uniform(0, 1, apd_len))[::-1], 0, 1)
        chunk = np.concatenate([psd.ravel(), pvt.ravel(),
                                pfp.ravel(), apd]).astype(np.float16)
        blocks.append(chunk)
        # summaries from the float16-quantized payload (A11 cross-check)
        off_pvt = 2 * psd_len
        q = chunk[off_pvt:off_pvt + 2 * pvt_len].astype(np.float64)
        pvt_peak_max.append(float(q[:pvt_len].max()))
        pvt_rms_median.append(float(np.median(q[pvt_len:])))
        ts = base + np.timedelta64(137 * ch, "ms")
        captures.append({
            "core:frequency": freq,
            "core:datetime": str(ts) + "Z",
            "ntia-sensor:duration": 4000,
            "ntia-sensor:overload": bool(ch % 5 == 4),
            "ntia-sensor:sensor_calibration": {
                "datetime": start_iso,
                "gain": round(29.8 + 0.1 * ch, 3),
                "noise_figure": round(4.9 + 0.05 * ch, 3),
                "reference": "noise source output",
                "temperature": 29.1,
            },
            "ntia-sensor:sigan_settings": {
                "reference_level": -25.0, "attenuation": 0.0,
                "preamp_enable": True,
            },
            "core:sample_start": ch * per_ch,
        })

    payload = np.concatenate(blocks).astype(np.float16).tobytes()
    blob = lzma.compress(payload, format=lzma.FORMAT_XZ)
    digest = hashlib.sha512(blob).hexdigest()
    if bad_hash:
        digest = "0" * 128
    if truncate:
        blob = blob[: len(blob) // 2]

    meta = {
        "global": {
            "core:datatype": "rf16_le",
            "core:extensions": [
                {"name": "ntia-algorithm", "version": "v2.0.1", "optional": False},
                {"name": "ntia-nasctn-sea", "version": "v0.6.0", "optional": True},
            ],
            "core:num_channels": n_channels,
            "core:sample_rate": 14e6,
            "core:sha512": digest,
            "core:version": "v1.0.0",
            "ntia-algorithm:data_products": [
                {"name": "Power Spectral Density", "series": ["maximum", "mean"],
                 "length": psd_len, "x_units": "Hz",
                 "x_start": [-4992000.0], "x_step": [16000.0],
                 "y_units": "dBm/Hz"},
                {"name": "Power vs. Time", "series": ["maximum", "mean"],
                 "length": pvt_len, "x_units": "s",
                 "x_start": [0.0], "x_step": [0.01], "y_units": "dBm"},
                {"name": "Periodic Frame Power",
                 "series": ["mean_minimum", "mean_maximum", "mean_mean",
                            "max_minimum", "max_maximum", "max_mean"],
                 "length": pfp_len, "x_units": "s",
                 "x_start": [0.0], "x_step": [1.7857142857142855e-05],
                 "y_units": "dBm"},
                {"name": "Amplitude Probability Distribution",
                 "length": apd_len, "x_units": "percent",
                 "y_start": [-180.0], "y_step": [1.0], "y_units": "dBm"},
            ],
            "ntia-diagnostics:diagnostics": {
                "datetime": start_iso,
                "preselector": {"lna_temp": 30.5, "door_closed": True},
                "spu": {"rf_box_temp": 32.1},
            },
            "ntia-nasctn-sea:max_of_max_channel_powers": pvt_peak_max,
            "ntia-nasctn-sea:median_of_mean_channel_powers": pvt_rms_median,
            "ntia-scos:schedule": {"name": "TEST_SCHEDULE",
                                   "start": start_iso, "interval": 90},
            "ntia-scos:task": task,
        },
        "captures": captures,
        "annotations": [],
    }
    if not no_geolocation:
        meta["global"]["core:geolocation"] = {
            "type": "Point", "coordinates": [-105.27452, 39.9918, 1783.4]}

    meta_bytes = json.dumps(meta).encode()
    buf = io.BytesIO()
    with tarfile.TarFile(fileobj=buf, mode="w") as tar:
        for name, data in ((f"sweep_{task}.sigmf-meta", meta_bytes),
                           (f"sweep_{task}.sigmf-data", blob)):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def build_sweep_series(out_dir, n_sweeps: int, n_channels: int = 3,
                       start_iso: str = "2023-09-17T00:00:00.000Z",
                       interval_s: int = 90, zip_name: str | None = None,
                       prefix: str = "sweep",
                       geometry: tuple = (PSD_LEN, PVT_LEN, PFP_LEN, APD_LEN)):
    """Write ``n_sweeps`` files at a fixed cadence; optionally zip them."""
    import os
    import zipfile
    base = np.datetime64(start_iso.rstrip("Z"), "ms")
    paths = []
    blobs = []
    for i in range(n_sweeps):
        ts = str(base + np.timedelta64(interval_s * i, "s")) + "Z"
        raw = build_sigmf(start_iso=ts, n_channels=n_channels,
                          task=i + 1, seed=i, geometry=geometry)
        blobs.append((f"{prefix}_{i + 1:04d}.sigmf", raw))
    if zip_name:
        zpath = os.path.join(out_dir, zip_name)
        with zipfile.ZipFile(zpath, "w") as z:
            for name, raw in blobs:
                z.writestr(name, raw)
        return zpath
    for name, raw in blobs:
        p = os.path.join(out_dir, name)
        with open(p, "wb") as f:
            f.write(raw)
        paths.append(p)
    return paths
