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
    seen: set[str] = set()
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        seen |= set(json.load(open(path)))
    never = [q for q in reg if q not in seen]
    print(f"# registry={len(reg)} driver-verified={len(seen & set(reg))} "
          f"never-verified={len(never)}")
    print(f"# suggested next prefix (first {min(n, len(never))}):")
    for q in never[:n]:
        print(f'    "{q}",')
    if len(never) > n:
        print(f"# ... and {len(never) - n} more for the round after")
    return 0


if __name__ == "__main__":
    sys.exit(main())
