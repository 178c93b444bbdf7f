"""Showcase-rotation helper: which registry entries still lack an
external driver-green row?

The driver's correctness gate hashes only the first ~50 entries of
``load_all()`` (the SHOWCASE_ORDER prefix), so cumulative external
coverage requires rotating the prefix each round toward entries no
CORRECTNESS_r*.json has ever recorded. This tool computes that set so
the rotation is generated, never hand-counted.

Usage:
    PYTHONPATH=/root/repo python tools/rotation.py [--prefix N]

Prints the never-driver-verified entries in registry order (a ready
candidate prefix for next round), then coverage stats.
"""

from __future__ import annotations

import glob
import json
import sys


def main() -> int:
    n = 50
    if "--prefix" in sys.argv:
        n = int(sys.argv[sys.argv.index("--prefix") + 1])

    from better_cdc_spark.queries import load_all

    reg = list(load_all())
    last_seen: dict[str, int] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for q in json.load(open(path)):
            last_seen[q] = max(last_seen.get(q, 0), rnd)
    never = [q for q in reg if q not in last_seen]
    print(f"# registry={len(reg)} driver-verified={len(set(last_seen) & set(reg))} "
          f"never-verified={len(never)}")
    print(f"# suggested next prefix (first {min(n, len(never))}):")
    for q in never[:n]:
        print(f'    "{q}",')
    if len(never) > n:
        print(f"# ... and {len(never) - n} more for the round after")
    if len(never) < n:
        # backlog (nearly) clear: pad with the LONGEST-unverified entries so
        # the gate keeps re-confirming the oldest rows against current code
        pads = sorted(
            (q for q in reg if q in last_seen),
            key=lambda q: (last_seen[q], reg.index(q)),
        )[: n - len(never)]
        print(f"# pads (oldest driver rows first, {len(pads)}):")
        for q in pads:
            print(f'    "{q}",  # last green r{last_seen[q]}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
