"""The committed full-gate snapshot (VERDICT r4 ask 6): the driver
samples the same ~50 queries every round, so the repo carries the FULL
gate's machine-readable output (GATE_r{N}.json, written by
``python tools/verify_local.py <sf_dir> --json=GATE_r{N}.json``) as the
auditable hard signal for the never-driver-sampled queries. This test
keeps that snapshot honest: it must exist, be green, and cover every
currently registered query."""

import glob
import json
import os

from etlalchemy_spark.registry import all_queries

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_gate():
    files = sorted(glob.glob(os.path.join(ROOT, "GATE_r*.json")))
    assert files, "no committed GATE_r*.json — run tools/verify_local.py --json=..."
    return files[-1]


def test_gate_snapshot_is_green():
    with open(_latest_gate()) as fh:
        gate = json.load(fh)
    assert gate["n_fail"] == 0, f"committed gate has failures: {gate['n_fail']}"
    failed = [n for n, s in gate["queries"].items() if s["status"] == "fail"]
    assert failed == []


def test_gate_snapshot_covers_every_registered_query():
    with open(_latest_gate()) as fh:
        gate = json.load(fh)
    registered = set(all_queries())
    recorded = set(gate["queries"])
    missing = sorted(registered - recorded)
    assert not missing, (
        f"gate snapshot is stale — {len(missing)} registered queries have "
        f"no recorded status (first few: {missing[:5]}); re-run "
        "tools/verify_local.py --json=GATE_r<N>.json"
    )
