"""Distributed ingest tests: listing (files + zip), mapInPandas decode,
quarantine, partitioned warehouse layout, and partition pruning."""

import os

import numpy as np
import pytest
import pyspark.sql.functions as F

from nasctn_sea_ingest_spark.sources.ingest import (
    decode_channel_metadata,
    decode_sweep_metadata,
    decode_traces,
    ingest,
    list_sigmf_refs,
    read_product,
)
from nasctn_sea_ingest_spark.sources.sigmf import decode_sigmf

from nasctn_sea_ingest_spark.sources.synth import PSD_LEN, build_sigmf, build_sweep_series

N_SWEEPS = 6
N_CH = 3
TRACES_PER_SWEEP = N_CH * 11  # 2 psd + 2 pvt + 6 pfp + 1 apd


@pytest.fixture(scope="module")
def landing(tmp_path_factory):
    """Landing dir: N loose files + a zip of N more + 2 poisoned files."""
    d = tmp_path_factory.mktemp("landing")
    build_sweep_series(str(d), N_SWEEPS)
    build_sweep_series(str(d), N_SWEEPS, start_iso="2023-09-18T00:00:00.000Z",
                       zip_name="day2.zip")
    (d / "bad_hash.sigmf").write_bytes(build_sigmf(bad_hash=True))
    (d / "truncated.sigmf").write_bytes(build_sigmf(truncate=True))
    return str(d)


@pytest.fixture(scope="module")
def warehouse(spark, landing, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wh"))
    paths = ingest(spark, [landing, os.path.join(landing, "day2.zip")], out)
    return paths


def test_listing(spark, landing):
    refs = list_sigmf_refs(spark, [landing, os.path.join(landing, "day2.zip")])
    rows = refs.collect()
    # 6 loose + 2 poisoned + 6 zip members
    assert len(rows) == N_SWEEPS * 2 + 2
    members = [r.member for r in rows if r.member is not None]
    assert len(members) == N_SWEEPS
    assert all(r.size and r.size > 0 for r in rows)
    # natural-sorted member order
    assert members == sorted(members)


def test_listing_allow_gate(spark, landing):
    refs = list_sigmf_refs(spark, landing, allow=3)
    assert refs.count() == 3


def test_decode_traces_and_quarantine(spark, landing):
    refs = list_sigmf_refs(spark, landing)  # 6 good + 2 poisoned
    tr = decode_traces(refs).cache()
    good = tr.where(F.col("error").isNull())
    bad = tr.where(F.col("error").isNotNull()).collect()
    assert good.count() == N_SWEEPS * TRACES_PER_SWEEP
    assert len(bad) == 2
    errs = {os.path.basename(r.source_file): r.error for r in bad}
    assert "sha512" in errs["bad_hash.sigmf"]
    assert "truncated.sigmf" in errs
    tr.unpersist()


def test_trace_values_match_direct_decode(spark, landing):
    f = os.path.join(landing, "sweep_0001.sigmf")
    refs = list_sigmf_refs(spark, f)
    got = decode_traces(refs).where(
        (F.col("table") == "psd") & (F.col("capture_statistic") == "max")
    ).orderBy("frequency").collect()
    want = decode_sigmf(f)
    w = want["psd"]
    w = w[w["capture_statistic"] == "max"].sort_values("frequency")
    assert len(got) == len(w) == N_CH
    for g, (_, r) in zip(got, w.iterrows()):
        assert len(g["values"]) == PSD_LEN
        assert np.allclose(g["values"], r["values"])


def test_metadata_stages(spark, landing):
    refs = list_sigmf_refs(spark, landing)
    ch = decode_channel_metadata(refs).where(F.col("error").isNull())
    sw = decode_sweep_metadata(refs).where(F.col("error").isNull()).collect()
    # payload-skipping fast path (S14): the 2 payload-corrupt files still
    # parse — whole-file quarantine happens in ingest(), not here
    assert ch.count() == (N_SWEEPS + 2) * N_CH
    assert len(sw) == N_SWEEPS + 2
    row = sw[0]
    assert row.sample_rate == pytest.approx(14e6)
    assert row.timezone == "America/Denver"
    assert row.schedule_interval == 90
    assert len(row.max_of_max_channel_powers) == N_CH
    ch_row = ch.orderBy("datetime", "frequency").first()
    assert ch_row.cal_gain_dB == pytest.approx(29.8)
    assert ch_row.sigan_preamp_enable is True


def test_warehouse_layout(warehouse):
    tr = warehouse["traces"]
    # hive-style (table, date) partition dirs → pruning at the FS level
    tables = {d.split("=")[1] for d in os.listdir(tr) if d.startswith("table=")}
    assert tables == {"psd", "pvt", "pfp", "apd"}
    dates = os.listdir(os.path.join(tr, "table=psd"))
    assert any("2023-09-17" in d for d in dates)
    assert any("2023-09-18" in d for d in dates)


def test_warehouse_counts(spark, warehouse):
    psd = read_product(spark, os.path.dirname(warehouse["traces"]), "psd")
    # 12 good sweeps (6 loose + 6 zipped) × 3 channels × 2 statistics
    assert psd.count() == 12 * N_CH * 2
    q = spark.read.parquet(warehouse["quarantine"])
    assert q.count() == 2


def test_partition_pruning(spark, warehouse):
    wh = os.path.dirname(warehouse["traces"])
    psd = read_product(spark, wh, "psd").where(F.col("date") == "2023-09-18")
    assert psd.count() == 6 * N_CH * 2  # only the zipped day
    plan = psd._jdf.queryExecution().executedPlan().toString()
    # the (table, date) predicates must reach the scan as partition filters
    assert "PartitionFilters" in plan
    assert psd.where(F.col("datetime") >= "2023-09-18 00:05:00").count() < psd.count()


def test_ingest_log(spark, warehouse):
    """S16 analog: one structured log row per ingest run with counts."""
    log = spark.read.parquet(warehouse["ingest_log"]).collect()
    assert len(log) == 1
    r = log[0]
    assert r.n_files == N_SWEEPS * 2 + 2
    assert r.n_quarantined == 2
    assert r.n_ok == N_SWEEPS * 2


def test_sweep_summary_cross_check(spark, warehouse):
    """Edge-computed max_of_max_channel_powers == array_max of peak PVT
    (A11 — recomputable from the ingested traces)."""
    wh = os.path.dirname(warehouse["traces"])
    pvt = read_product(spark, wh, "pvt").where(F.col("detector") == "peak")
    sw = spark.read.parquet(warehouse["sweep_metadata"])
    per_file = (pvt.groupBy("source_file")
                .agg(F.sort_array(F.collect_list(F.struct("frequency", "values")))
                     .alias("traces")))
    j = per_file.join(sw, "source_file")
    rows = j.select(
        "source_file",
        F.expr("transform(traces, t -> array_max(t.values))").alias("got"),
        F.col("max_of_max_channel_powers").alias("want")).collect()
    assert len(rows) == 12
    for r in rows:
        assert np.allclose(r.got, r.want, atol=1e-6)


def test_backfill_partitions(spark, tmp_path_factory):
    """Dynamic partition overwrite replaces only the partitions the
    correction touches; other partitions and re-runs are untouched/no-ops."""
    import pandas as pd

    from nasctn_sea_ingest_spark.sources.ingest import backfill_partitions

    out = str(tmp_path_factory.mktemp("bf")) + "/traces"
    base = spark.createDataFrame(pd.DataFrame({
        "table": ["psd"] * 4,
        "date": ["2023-09-16", "2023-09-16", "2023-09-17", "2023-09-17"],
        "datetime": pd.to_datetime(
            ["2023-09-16 00:00", "2023-09-16 00:01",
             "2023-09-17 00:00", "2023-09-17 00:01"]),
        "frequency": [3.5e9] * 4,
        "power": [1.0, 2.0, 3.0, 4.0],
    }))
    base.write.mode("overwrite").partitionBy("table", "date").parquet(out)

    # corrected day 2: one row, new value
    fix = spark.createDataFrame(pd.DataFrame({
        "table": ["psd"],
        "date": ["2023-09-17"],
        "datetime": pd.to_datetime(["2023-09-17 00:00"]),
        "frequency": [3.5e9],
        "power": [99.0],
    }))
    backfill_partitions(fix, out)
    got = spark.read.parquet(out)
    assert got.where("date = '2023-09-16'").count() == 2     # untouched
    d2 = got.where("date = '2023-09-17'").collect()
    assert len(d2) == 1 and d2[0].power == 99.0              # replaced

    backfill_partitions(fix, out)                            # idempotent
    assert spark.read.parquet(out).count() == 3


def test_decode_dir_binaryfile(spark, tmp_path_factory):
    """binaryFile-source batch decode matches the ref-based decode on the
    same loose files (same schema, same row multiset)."""
    from nasctn_sea_ingest_spark.sources.ingest import (
        decode_dir,
        decode_traces,
        list_sigmf_refs,
    )

    d = str(tmp_path_factory.mktemp("loose"))
    build_sweep_series(d, 4)
    via_dir = decode_dir(spark, d)
    via_refs = decode_traces(list_sigmf_refs(spark, d))
    assert via_dir.schema == via_refs.schema
    a = via_dir.where("error IS NULL") \
        .select("table", "datetime", "frequency").collect()
    b = via_refs.where("error IS NULL") \
        .select("table", "datetime", "frequency").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
