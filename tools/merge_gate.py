#!/usr/bin/env python
"""Merge a per-wave verify_local patch JSON into the round's committed
gate snapshot: ``python tools/merge_gate.py GATE_r11.json /tmp/patch.json``.
Counters (n_pass/n_rows_only/n_fail) are recomputed from the merged
queries dict, so repeated merges stay consistent."""

import json
import sys


def main(gate_path: str, *patch_paths: str) -> None:
    with open(gate_path) as fh:
        gate = json.load(fh)
    for p in patch_paths:
        with open(p) as fh:
            patch = json.load(fh)
        gate["queries"].update(patch["queries"])
        print(f"merged {len(patch['queries'])} entries from {p}")
    statuses = [q["status"] for q in gate["queries"].values()]
    gate["n_pass"] = statuses.count("pass")
    gate["n_rows_only"] = statuses.count("rows_only")
    gate["n_fail"] = statuses.count("fail")
    with open(gate_path, "w") as fh:
        json.dump(gate, fh, indent=1, sort_keys=True)
    print(f"{gate_path}: {gate['n_pass']} pass, {gate['n_rows_only']} rows_only, "
          f"{gate['n_fail']} fail, {len(gate['queries'])} total")


if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:])
