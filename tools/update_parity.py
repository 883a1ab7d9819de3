"""Targeted refresh of PARITY_sf01_full.json: re-run the named
queries' strict-hash certification at bench scale and merge their rows
into the existing artifact.

This is the cheap half of the round-8 certification convention
("adding an oracle-paired query obliges bench-scale certification in
the same commit", tests/test_correctness.py): a NEW or CHANGED query
re-certifies in minutes instead of re-running the whole ~20-minute
183-query sweep, while queries whose code is untouched keep their
existing rows. Use the full sweep (strict_parity_sweep.py with no
names) whenever shared infrastructure — session config, readers,
registry, tmputil — changes, since that can shift every query at once.

    PYTHONPATH=/root/repo python tools/update_parity.py q_new_one q_changed_two
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))

from strict_parity_sweep import run  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: update_parity.py QUERY [QUERY...]", file=sys.stderr)
        return 2
    artifact = os.path.join(os.path.dirname(HERE), "PARITY_sf01_full.json")
    full = json.load(open(artifact))
    part_path = "/tmp/parity_update_part.json"
    rc = run(full["sf_dir"], names, part_path)
    part = json.load(open(part_path))
    full["queries"].update(part["queries"])
    full["n_ok"] = sum(1 for r in full["queries"].values() if r["ok"])
    full["n_fail"] = sum(1 for r in full["queries"].values() if not r["ok"])
    with open(artifact, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    print(f"merged {len(part['queries'])} rows -> {artifact} "
          f"(n_ok={full['n_ok']} n_fail={full['n_fail']})")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
