"""The bench.py plan-digest snapshot guard (r11 verdict #1): the
snapshot records the scale factor it was taken at; a bench run at any
OTHER sf must neither diff against it (145/146 false alarms in round
11) nor overwrite it (which is how the blindness happened).  Pure
file-level logic — no Spark session."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import digest_snapshot_diff  # noqa: E402


def _read(path):
    with open(path) as fh:
        return json.load(fh)


def test_fresh_snapshot_is_sf_tagged(tmp_path):
    snap = str(tmp_path / "PLAN_DIGESTS.json")
    changed, new, mism, prior_sf = digest_snapshot_diff(
        snap, {"q01": "aa", "q02": "bb"}, 0.1)
    assert (changed, mism, prior_sf) == ([], False, None)
    assert sorted(new) == ["q01", "q02"]
    assert _read(snap) == {"sf": 0.1, "stages": {},
                           "digests": {"q01": "aa", "q02": "bb"}}


def test_same_sf_diffs_and_refreshes(tmp_path):
    snap = str(tmp_path / "PLAN_DIGESTS.json")
    digest_snapshot_diff(snap, {"q01": "aa", "q02": "bb"}, 0.1)
    changed, new, mism, _ = digest_snapshot_diff(
        snap, {"q01": "aa", "q02": "CHANGED", "q03": "cc"}, 0.1)
    assert changed == ["q02"]
    assert new == ["q03"]
    assert not mism
    assert _read(snap)["digests"]["q02"] == "CHANGED"


def test_cross_sf_run_skips_diff_and_keeps_snapshot(tmp_path):
    """The round-11 failure mode, made impossible: a deliberate
    sf0.001 run after an sf0.1 snapshot reports the mismatch and
    leaves the committed baseline byte-identical."""
    snap = str(tmp_path / "PLAN_DIGESTS.json")
    digest_snapshot_diff(snap, {"q01": "aa", "q02": "bb"}, 0.1)
    before = _read(snap)
    changed, new, mism, prior_sf = digest_snapshot_diff(
        snap, {"q01": "DIFFERENT", "q99": "zz"}, 0.001)
    assert (changed, new) == ([], [])
    assert mism and prior_sf == 0.1
    assert _read(snap) == before


def test_legacy_flat_snapshot_upgrades_once(tmp_path):
    """Pre-r12 snapshots are flat name->digest maps with no sf; they
    diff one last time and come back sf-tagged."""
    snap = str(tmp_path / "PLAN_DIGESTS.json")
    with open(snap, "w") as fh:
        json.dump({"q01": "aa", "q02": "bb"}, fh)
    changed, new, mism, prior_sf = digest_snapshot_diff(
        snap, {"q01": "aa", "q02": "CHANGED"}, 0.1)
    assert changed == ["q02"] and not mism and prior_sf is None
    assert _read(snap) == {"sf": 0.1, "stages": {},
                           "digests": {"q01": "aa", "q02": "CHANGED"}}


def test_stage_digests_diff_and_persist(tmp_path):
    """r12 verdict #1: checkpoint-terminated queries persist PER-STAGE
    pre-checkpoint digests; a changed stage reports as "qname::stage"
    even when the end-to-end digest (Scan ExistingRDD) is unchanged,
    and a first run with stages on an existing stage-less snapshot
    reports them as new."""
    snap = str(tmp_path / "PLAN_DIGESTS.json")
    digest_snapshot_diff(snap, {"q171": "aa"}, 0.1)
    # first stage-bearing run after upgrade: stages are NEW
    changed, new, mism, _ = digest_snapshot_diff(
        snap, {"q171": "aa"}, 0.1,
        stage_digests={"q171": {"semdedup_exact.grid_candidates": "g1",
                                "semdedup_exact.unit": "u1"}})
    assert changed == []
    assert sorted(new) == ["q171::semdedup_exact.grid_candidates",
                           "q171::semdedup_exact.unit"]
    # interior rewrite: end-to-end digest identical, grid stage changed
    changed, new, mism, _ = digest_snapshot_diff(
        snap, {"q171": "aa"}, 0.1,
        stage_digests={"q171": {"semdedup_exact.grid_candidates": "g2",
                                "semdedup_exact.unit": "u1"}})
    assert changed == ["q171::semdedup_exact.grid_candidates"]
    assert new == []
    assert _read(snap)["stages"]["q171"][
        "semdedup_exact.grid_candidates"] == "g2"
    # cross-sf guard covers stages too (snapshot untouched)
    before = _read(snap)
    changed, new, mism, _ = digest_snapshot_diff(
        snap, {"q171": "aa"}, 0.001,
        stage_digests={"q171": {"semdedup_exact.unit": "DIFF"}})
    assert mism and (changed, new) == ([], [])
    assert _read(snap) == before
