"""Unit tests for tools/stamp_freshness.py round→commit mapping.

The audit's staleness verdicts hinge on which commit sha each stamp
round resolves to, so the mapping's edge cases get pinned here:

  * duplicate "round N: verdict" subjects → the OLDEST sha must win
    (commits between the duplicates are post-stamp changes);
  * a round with no verdict commit yet (mid-round state) → fall back to
    its "round N: end-of-round snapshot" commit;
  * a round with neither commit → absent from the map (the audit then
    conservatively treats its stamps as stale, never silently fresh).
"""

import importlib.util
import os

import pytest

_TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "stamp_freshness.py")


@pytest.fixture()
def freshness(monkeypatch):
    spec = importlib.util.spec_from_file_location("stamp_freshness", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_log(lines):
    # git log --format=%H %s output, NEWEST first (as git emits it)
    return "\n".join(lines) + "\n"


def test_verdict_commit_wins_over_snapshot(freshness, monkeypatch):
    monkeypatch.setattr(
        freshness,
        "_git",
        lambda *a: _fake_log(
            [
                "cccc round 3: verdict/advice/correctness/bench",
                "bbbb round 3: end-of-round snapshot (190 turns)",
                "aaaa add operator",
            ]
        ),
    )
    assert freshness.round_commits() == {3: "cccc"}


def test_snapshot_fallback_when_no_verdict_yet(freshness, monkeypatch):
    # Mid-round: round 4's verdict commit doesn't exist, but its
    # end-of-round snapshot does — stamps must resolve to the snapshot
    # instead of reading as "no commit found" (all-stale noise).
    monkeypatch.setattr(
        freshness,
        "_git",
        lambda *a: _fake_log(
            [
                "ffff work in round 5",
                "eeee round 4: end-of-round snapshot (120 turns)",
                "dddd round 3: verdict/advice/correctness/bench",
            ]
        ),
    )
    assert freshness.round_commits() == {4: "eeee", 3: "dddd"}


def test_duplicate_round_subjects_oldest_wins(freshness, monkeypatch):
    # If a round subject ever appears twice, the OLDEST sha must win so
    # commits landing between the duplicates count as post-stamp churn.
    monkeypatch.setattr(
        freshness,
        "_git",
        lambda *a: _fake_log(
            [
                "9999 round 2: verdict/advice/correctness/bench",
                "8888 touch operator between duplicates",
                "7777 round 2: verdict/advice/correctness/bench",
                "6666 round 2: end-of-round snapshot (90 turns)",
            ]
        ),
    )
    assert freshness.round_commits() == {2: "7777"}


def test_round_with_no_commits_is_absent(freshness, monkeypatch):
    monkeypatch.setattr(
        freshness,
        "_git",
        lambda *a: _fake_log(["1111 round 1: verdict/advice/correctness/bench"]),
    )
    rounds = freshness.round_commits()
    assert 1 in rounds and 2 not in rounds
