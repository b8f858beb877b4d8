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


_MOD_V1 = '''
X = 5

def helper(n):
    return n + X

def q_a(spark, sf):
    # a comment
    return helper(1)

def q_b(spark, sf):
    return 2

QUERIES = {"a": q_a, "b": q_b}
ORACLES = {"a": "SELECT 1", "b": "SELECT 2"}
'''


def test_relevant_dump_ignores_comments_and_other_queries(freshness):
    # comment edits and churn in OTHER queries' code must not change
    # query a's closure dump
    v2 = _MOD_V1.replace("# a comment", "# a different comment")
    v3 = _MOD_V1.replace("return 2", "return 3")  # q_b only
    v4 = _MOD_V1 + '\ndef q_c(spark, sf):\n    return 9\nQUERIES["c"] = q_c\n'
    base = freshness._relevant_dump(_MOD_V1, "a")
    assert base is not None
    assert freshness._relevant_dump(v2, "a") == base
    assert freshness._relevant_dump(v3, "a") == base
    assert freshness._relevant_dump(v4, "a") == base


def test_relevant_dump_sees_body_helper_and_oracle_changes(freshness):
    base = freshness._relevant_dump(_MOD_V1, "a")
    # the query's own body
    assert freshness._relevant_dump(
        _MOD_V1.replace("helper(1)", "helper(2)"), "a") != base
    # a helper in its transitive closure
    assert freshness._relevant_dump(
        _MOD_V1.replace("n + X", "n - X"), "a") != base
    # a module constant the helper reads
    assert freshness._relevant_dump(
        _MOD_V1.replace("X = 5", "X = 6"), "a") != base
    # its oracle SQL
    assert freshness._relevant_dump(
        _MOD_V1.replace('"a": "SELECT 1"', '"a": "SELECT 11"'), "a") != base


def test_relevant_dump_none_for_unbound_or_dynamic(freshness):
    # a query the module doesn't key statically -> None (caller falls
    # back to file-level staleness, never silently fresh)
    assert freshness._relevant_dump(_MOD_V1, "zzz") is None
    dyn = 'QUERIES = dict((k, k) for k in ["a"])\n'
    assert freshness._relevant_dump(dyn, "a") is None
    assert freshness._relevant_dump("def broken(:", "a") is None


def test_subscript_oracle_assign_tracked(freshness):
    # ORACLES["a"] = ... subscript-assign form (the dedup.py idiom)
    mod = 'ORACLES = {}\nORACLES["a"] = "SELECT 1"\nQUERIES = {"a": 1}\n'
    base = freshness._relevant_dump(mod, "a")
    assert base is not None
    assert freshness._relevant_dump(
        mod.replace("SELECT 1", "SELECT 2"), "a") != base


def test_relevant_dump_tracks_import_rebinds(freshness):
    """Round-13 ADVICE(medium): rebinding an imported alias the
    query's code uses changes semantics — the import node must be in
    the compared closure, so the stamp reads stale."""
    mod = (
        'from operators import dedup as DD\n'
        'import os\n'
        'import os.path as osp\n'
        'def q_a(spark, sf):\n'
        '    return DD.run(osp.join(sf, "x"))\n'
        'QUERIES = {"a": q_a}\n'
    )
    base = freshness._relevant_dump(mod, "a")
    assert base is not None
    # rebinding the alias to another module -> different closure
    assert freshness._relevant_dump(
        mod.replace("from operators import dedup as DD",
                    "from operators import dedup_v2 as DD"), "a") != base
    assert freshness._relevant_dump(
        mod.replace("import os.path as osp",
                    "import posixpath as osp"), "a") != base
    # an import the query does NOT reference stays out of the closure
    assert freshness._relevant_dump(
        mod.replace("import os\n", "import sys\n"), "a") == base
