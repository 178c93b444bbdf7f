"""Meta-tests for tools/rotation.py's changed-since-last-green detector.

Round-10 verdict: editing an already-driver-green query invalidates its
old row, and the gate rotation must notice structurally (source-hash
state) instead of relying on a judge re-run. These tests pin the
classify/snapshot semantics with synthetic specs, plus sanity on the
committed state file.
"""

from __future__ import annotations

import json
import os

from better_cdc_spark.queries import QuerySpec
from tools import rotation


def _fn_a(spark, sf_dir):
    return "plan-a"


def _fn_b(spark, sf_dir):
    return "plan-b"


def _spec(name, fn=_fn_a, oracle="SELECT 1 AS x"):
    return QuerySpec(name=name, fn=fn, oracle=oracle)


def test_never_verified_leads_then_changed_then_oldest_pads():
    reg = {
        "q_new": _spec("q_new"),
        "q_edited": _spec("q_edited", fn=_fn_b),
        "q_old_green": _spec("q_old_green"),
        "q_recent_green": _spec("q_recent_green"),
    }
    last_seen = {"q_edited": 9, "q_old_green": 2, "q_recent_green": 10}
    state = {
        # recorded hash from when q_edited was green — body has since changed
        "q_edited": {"green_round": 9, "src_hash": "stale-hash"},
        "q_old_green": {"green_round": 2,
                        "src_hash": rotation.src_hash(reg["q_old_green"])},
        "q_recent_green": {"green_round": 10,
                           "src_hash": rotation.src_hash(reg["q_recent_green"])},
    }
    never, changed, pads = rotation.classify(reg, last_seen, state)
    assert never == ["q_new"]
    assert changed == ["q_edited"]
    assert pads == ["q_old_green", "q_recent_green"]  # oldest row first


def test_entries_absent_from_state_are_legacy_unchanged_pads():
    """Pre-detector rows (no recorded hash) must not spuriously flag."""
    reg = {"q_legacy": _spec("q_legacy")}
    never, changed, pads = rotation.classify(reg, {"q_legacy": 3}, {})
    assert never == [] and changed == [] and pads == ["q_legacy"]


def test_oracle_edit_alone_changes_the_hash():
    a = _spec("q", oracle="SELECT 1 AS x")
    b = _spec("q", oracle="SELECT 2 AS x")
    assert rotation.src_hash(a) != rotation.src_hash(b)
    assert rotation.src_hash(a) == rotation.src_hash(_spec("q"))


def test_snapshot_refreshes_only_on_new_green_round(tmp_path, monkeypatch):
    """A mid-round edit followed by --snapshot must NOT wipe its own
    changed flag: only a fresh driver row (higher green_round) refreshes
    the recorded hash."""
    state_path = tmp_path / "rotation_state.json"
    monkeypatch.setattr(rotation, "STATE_PATH", str(state_path))
    reg = {"q_a": _spec("q_a"), "q_b": _spec("q_b", fn=_fn_b)}

    # initial snapshot at round N
    rotation.snapshot(reg, {"q_a": 5, "q_b": 5})
    state = json.load(open(state_path))
    assert state["q_a"]["green_round"] == 5

    # simulate an edit to q_a: snapshot again with the SAME green rounds
    reg_edited = {"q_a": _spec("q_a", fn=_fn_b), "q_b": reg["q_b"]}
    updated, kept = rotation.snapshot(reg_edited, {"q_a": 5, "q_b": 5})
    assert updated == 0 and kept == 2
    state = json.load(open(state_path))
    assert state["q_a"]["src_hash"] == rotation.src_hash(reg["q_a"])  # unchanged
    _, changed, _ = rotation.classify(reg_edited, {"q_a": 5, "q_b": 5}, state)
    assert changed == ["q_a"]

    # a new driver row (round 6) refreshes it
    rotation.snapshot(reg_edited, {"q_a": 6, "q_b": 5})
    state = json.load(open(state_path))
    assert state["q_a"]["src_hash"] == rotation.src_hash(reg_edited["q_a"])
    _, changed, _ = rotation.classify(reg_edited, {"q_a": 6, "q_b": 5}, state)
    assert changed == []


def test_committed_state_file_covers_every_driver_verified_entry():
    """The real tools/rotation_state.json must track the full green set —
    a missing entry silently downgrades edits on it to legacy-pad class.

    Scope (round-12 verdict #1): the driver writes CORRECTNESS_r{N}.json
    AFTER the session's final snapshot commit, so rows whose only green
    rounds post-date the snapshot's own recorded round are "pending next
    snapshot" — reported, never a failure. Only an entry the snapshot
    COULD have covered (green in some round <= its recorded round) may
    fail this test."""
    assert os.path.exists(rotation.STATE_PATH), "run rotation.py --snapshot"
    state = rotation.load_state()
    from better_cdc_spark.queries import load_all

    reg = load_all()
    rounds = rotation.green_rounds_by_query()
    snap_round = rotation.snapshot_round(state)
    green = {q for q in reg if q in rounds}
    missing = green - set(state)
    stale = sorted(q for q in missing if min(rounds[q]) <= snap_round)
    pending = sorted(q for q in missing if min(rounds[q]) > snap_round)
    if pending:  # informational: next round's snapshot will absorb these
        print(f"snapshot refresh due for {len(pending)} post-snapshot rows: "
              f"{pending[:5]}...")
    assert not stale, f"state lacks pre-snapshot entries {stale[:5]}..."


def test_pending_rows_newer_than_snapshot_do_not_fail(tmp_path, monkeypatch):
    """Synthetic pin of the scoping rule: a query green ONLY in a round
    newer than the snapshot's max recorded round is pending, not stale."""
    state = {"q_old": {"green_round": 7, "src_hash": "h"}}
    assert rotation.snapshot_round(state) == 7
    rounds = {"q_old": [5, 7], "q_new_post_snap": [8], "q_forgot": [6]}
    missing = {"q_new_post_snap", "q_forgot"}
    stale = [q for q in missing if min(rounds[q]) <= 7]
    pending = [q for q in missing if min(rounds[q]) > 7]
    assert stale == ["q_forgot"] and pending == ["q_new_post_snap"]
