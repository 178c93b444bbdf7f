"""Showcase-rotation helper: which registry entries need a driver row?

The driver's correctness gate hashes only the first ~50 entries of
``load_all()`` (the SHOWCASE_ORDER prefix), so cumulative external
coverage requires rotating the prefix each round toward entries that
most need a fresh external row. Three priority classes, in order:

1. NEVER-VERIFIED — no CORRECTNESS_r*.json has a row for the name.
2. CHANGED-UNCONFIRMED — the query has a driver-green row, but its
   source (function body + oracle SQL + oracle_scales + tags) hash
   differs from the hash recorded when that row was last confirmed.
   Editing already-green code silently invalidates the old row; this
   class makes that staleness structural instead of judicial.
3. PADS — oldest driver rows first, so the gate keeps re-confirming
   the longest-unverified entries against current code.

State: ``tools/rotation_state.json`` maps query name -> {green_round,
src_hash}. ``--snapshot`` refreshes an entry ONLY when the driver has
recorded a NEW green row since the state's recorded round (or the
entry is new to the state), so a mid-round edit followed by a snapshot
cannot wipe its own "changed" flag — only a fresh driver row can.

Run ``--snapshot`` at round START, before editing query code: at that
moment the working tree is byte-identical to what the driver's
end-of-round gate (and the judge's re-verification) ran against, so
"current source == verified source" holds for every newly-green row.

Usage:
    PYTHONPATH=/root/repo python tools/rotation.py [--prefix N]
    PYTHONPATH=/root/repo python tools/rotation.py --snapshot
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import sys

STATE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "rotation_state.json")
CORRECTNESS_GLOB = "/root/repo/CORRECTNESS_r*.json"


def src_hash(spec) -> str:
    """Stable hash of everything that defines a query's verified behavior:
    the Spark plan function's source, the oracle SQL, the pinned oracle
    scales, and the tags. Helper functions the body calls are not traced
    (function-level granularity); a helper-only change that alters results
    will still surface at the next full check.py sweep."""
    try:
        body = inspect.getsource(spec.fn)
    except (OSError, TypeError):  # dynamically built fn: fall back to name
        body = repr(spec.fn)
    blob = "\x00".join([
        body,
        repr(spec.oracle),
        repr(spec.oracle_scales),
        repr(tuple(spec.tags)),
    ])
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def last_green_rounds() -> dict[str, int]:
    last_seen: dict[str, int] = {}
    for path in sorted(glob.glob(CORRECTNESS_GLOB)):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for q in json.load(open(path)):
            last_seen[q] = max(last_seen.get(q, 0), rnd)
    return last_seen


def load_state() -> dict[str, dict]:
    if os.path.exists(STATE_PATH):
        return json.load(open(STATE_PATH))
    return {}


def snapshot_round(state: dict[str, dict]) -> int:
    """The latest driver round the committed snapshot has seen — the max
    green_round across its entries (0 for an empty state). CORRECTNESS
    files newer than this land AFTER the session's final snapshot commit
    by construction; coverage checks must treat their rows as "pending
    next snapshot", not as a staleness failure (round-12 verdict #1)."""
    return max((rec["green_round"] for rec in state.values()), default=0)


def green_rounds_by_query() -> dict[str, list[int]]:
    """Every round each query has a row in, ascending (cf. last_green_rounds
    which keeps only the max)."""
    seen: dict[str, list[int]] = {}
    for path in sorted(glob.glob(CORRECTNESS_GLOB)):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for q in json.load(open(path)):
            seen.setdefault(q, []).append(rnd)
    return seen


def classify(reg: dict, last_seen: dict[str, int], state: dict[str, dict]):
    """Returns (never, changed, pads) — each a list of names in priority
    order. `changed` = has a green row but current src_hash differs from
    the one recorded at that row; entries absent from state are treated
    as unchanged (pre-detector legacy rows) and land in pads."""
    never = [q for q in reg if q not in last_seen]
    changed = []
    confirmed = []
    for q in reg:
        if q in never:
            continue
        rec = state.get(q)
        if rec is not None and rec["src_hash"] != src_hash(reg[q]):
            changed.append(q)
        else:
            confirmed.append(q)
    names = list(reg)
    pads = sorted(confirmed, key=lambda q: (last_seen[q], names.index(q)))
    return never, changed, pads


def snapshot(reg: dict, last_seen: dict[str, int]) -> tuple[int, int]:
    """Refresh state entries that earned a NEW green round since their
    recorded one (or are new). Returns (updated, kept)."""
    state = load_state()
    updated = kept = 0
    for q in reg:
        if q not in last_seen:
            continue
        rec = state.get(q)
        if rec is None or last_seen[q] > rec["green_round"]:
            state[q] = {"green_round": last_seen[q], "src_hash": src_hash(reg[q])}
            updated += 1
        else:
            kept += 1
    json.dump(state, open(STATE_PATH, "w"), indent=0, sort_keys=True)
    return updated, kept


def main() -> int:
    n = 50
    if "--prefix" in sys.argv:
        n = int(sys.argv[sys.argv.index("--prefix") + 1])

    from better_cdc_spark.queries import load_all

    reg = load_all()
    last_seen = last_green_rounds()

    if "--snapshot" in sys.argv:
        updated, kept = snapshot(reg, last_seen)
        print(f"# snapshot: {updated} entries refreshed (new green round or "
              f"new to state), {kept} kept")
        return 0

    state = load_state()
    never, changed, pads = classify(reg, last_seen, state)
    print(f"# registry={len(reg)} driver-verified={len(set(last_seen) & set(reg))} "
          f"never-verified={len(never)} changed-unconfirmed={len(changed)}")
    take = []
    if never:
        print(f"# never-verified ({len(never)}):")
        for q in never[:n]:
            print(f'    "{q}",')
        take = never[:n]
    if changed and len(take) < n:
        room = n - len(take)
        print(f"# changed since last driver-green row ({len(changed)}):")
        for q in changed[:room]:
            rec = state[q]
            print(f'    "{q}",  # green r{rec["green_round"]}, source edited since')
        take += changed[:room]
    if len(take) < n:
        room = n - len(take)
        print(f"# pads (oldest driver rows first, {min(room, len(pads))}):")
        for q in pads[:room]:
            print(f'    "{q}",  # last green r{last_seen[q]}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
