#!/usr/bin/env python
"""Stamp-freshness audit over the driver's CORRECTNESS ledger.

The round driver certifies only the first 50 entries of
``__spark_entry__.queries()`` each round, and stamps persist across
rounds — so a query whose operator file changed AFTER its latest stamp
carries certification for code that no longer exists.  This tool makes
that visible and machine-checkable:

  * for every registered query: latest stamp round + status, the file
    that defines the query callable, and the commits touching that file
    since the stamp was taken;
  * exit non-zero when any stamped query's operator changed post-stamp
    (or was never stamped at all);
  * print a suggested ``_CERT_FIRST`` head: never-stamped first, then
    stale-stamped (oldest stamp first), then fresh-oldest-first backfill
    up to the 50-query window.

Round→commit mapping: the driver stamps the code present at the
"round N: verdict/advice/correctness/bench" commit (that commit adds
only judge artifacts, no source), so a round-N stamp is stale iff the
query's defining file has commits in ``<verdict_rN>..HEAD``.

Usage:  python tools/stamp_freshness.py [--json] [--window 50]
"""

from __future__ import annotations

import argparse
import glob
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], check=True, capture_output=True, text=True
    ).stdout


def round_commits() -> dict[int, str]:
    """round number -> commit sha whose tree the driver stamped.

    Primary boundary: the "round N: verdict/..." commit (judge artifacts
    only, no source changes).  Mid-round, the CURRENT round's verdict
    commit does not exist yet, which used to conservatively report every
    current-round stamp as stale and bury the real stale set; fall back
    to the "round N: end-of-round snapshot" commit, which equally
    post-dates all of round N's source changes (the verdict commit adds
    no source on top of it).  A round with neither commit still reads as
    stale-not-fresh downstream (sha None).

    git log is newest-first; we OVERWRITE per round so that when a round
    subject ever appears twice the OLDEST commit wins — commits landing
    between the duplicates then correctly count as post-stamp changes
    instead of being silently skipped.
    """
    verdict: dict[int, str] = {}
    snapshot: dict[int, str] = {}
    for line in _git("log", "--format=%H %s").splitlines():
        sha, _, subj = line.partition(" ")
        m = re.match(r"round (\d+): verdict/advice/correctness/bench", subj)
        if m:
            verdict[int(m.group(1))] = sha
            continue
        m = re.match(r"round (\d+): end-of-round snapshot", subj)
        if m:
            snapshot[int(m.group(1))] = sha
    out = dict(snapshot)
    out.update(verdict)
    return out


def load_ledger() -> dict[str, dict]:
    """query -> {round, hash_match, rows_match, err} at its LATEST stamp."""
    ledger: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, rec in data.items():
            prev = ledger.get(name)
            if prev is None or rnd >= prev["round"]:
                ledger[name] = {
                    "round": rnd,
                    "hash_match": rec.get("hash_match"),
                    "rows_match": rec.get("rows_match"),
                    "err": rec.get("err"),
                }
    return ledger


def query_files() -> dict[str, str]:
    """query name -> repo-relative file defining its callable."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry  # noqa: E402

    out: dict[str, str] = {}
    for name, fn in entry.queries().items():
        target = getattr(fn, "func", fn)  # unwrap functools.partial
        try:
            path = inspect.getfile(target)
        except TypeError:
            path = inspect.getfile(type(target))
        out[name] = os.path.relpath(os.path.abspath(path), REPO)
    return out


def commits_since(sha: str, path: str) -> list[str]:
    log = _git("log", "--format=%h %s", f"{sha}..HEAD", "--", path)
    return [l for l in log.splitlines() if l.strip()]


# ---------------------------------------------------------------------------
# AST-level relevance (VERDICT r11 #3): a post-stamp commit to the
# defining file only makes a stamp stale if it changed code the query
# can SEE — its wiring entry (the QUERIES/ORACLES dict values for its
# name), plus the transitive closure of module-top-level defs/assigns
# those reference.  Comment edits, unrelated operators landing in the
# same file, and dict entries for OTHER queries no longer rotate the
# whole file's stamps.


def _top_level_map(tree):
    """module-top-level name -> list of defining nodes (functions,
    classes, plain/annotated assigns, IMPORTS; augmented + subscript
    assigns attach to the base name so ``ORACLES[...] = ...`` counts
    as part of ``ORACLES``).  Imports matter (round-13 ADVICE): a
    post-stamp commit that rebinds an imported alias the query's code
    uses (``from operators import dedup as DD`` → another module)
    changes semantics, so the import node must be part of the
    compared closure dump."""
    import ast

    out: dict[str, list] = {}
    for node in tree.body:
        names = []
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            names = [node.name]
        elif isinstance(node, ast.Import):
            # ``import a.b.c`` binds ``a``; ``import a.b as m`` binds m
            names = [(a.asname or a.name.split(".")[0])
                     for a in node.names]
        elif isinstance(node, ast.ImportFrom):
            names = [(a.asname or a.name) for a in node.names
                     if a.name != "*"]
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names.append(t.id)
                elif isinstance(t, ast.Subscript) and \
                        isinstance(t.value, ast.Name):
                    names.append(t.value.id)
                elif isinstance(t, ast.Tuple):
                    names.extend(e.id for e in t.elts
                                 if isinstance(e, ast.Name))
        elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
            t = node.target
            if isinstance(t, ast.Name):
                names.append(t.id)
            elif isinstance(t, ast.Subscript) and \
                    isinstance(t.value, ast.Name):
                names.append(t.value.id)
        for n in names:
            out.setdefault(n, []).append(node)
    return out


def _query_root_exprs(tree, query: str):
    """The AST expressions that BIND ``query`` in this module: values
    under its key in any top-level dict assigned to a *QUERIES*/
    *ORACLES*-named target, and the RHS of ``X["query"] = ...``
    subscript assigns.  Empty list when the module doesn't key this
    query statically (caller falls back to file-level staleness)."""
    import ast

    roots = []
    for node in tree.body:
        if not isinstance(node, ast.Assign):
            continue
        for t in node.targets:
            base = t.value.id if (isinstance(t, ast.Subscript)
                                  and isinstance(t.value, ast.Name)) \
                else (t.id if isinstance(t, ast.Name) else None)
            if base is None or not ("QUERIES" in base or "ORACLES" in base):
                continue
            if isinstance(t, ast.Subscript):
                idx = t.slice
                if isinstance(idx, ast.Constant) and idx.value == query:
                    roots.append(node.value)
            elif isinstance(node.value, ast.Dict):
                for k, v in zip(node.value.keys, node.value.values):
                    if isinstance(k, ast.Constant) and k.value == query:
                        roots.append(v)
    return roots


def _relevant_dump(source: str, query: str) -> str | None:
    """Normalized dump of everything ``query`` can see in its defining
    module: its binding expressions plus the transitive top-level
    name closure.  None when the module can't be parsed or doesn't
    bind the query statically."""
    import ast

    try:
        tree = ast.parse(source)
    except SyntaxError:
        return None
    roots = _query_root_exprs(tree, query)
    if not roots:
        return None
    top = _top_level_map(tree)
    seen: set[str] = set()
    frontier = list(roots)
    parts = [ast.dump(r) for r in roots]
    while frontier:
        node = frontier.pop()
        for sub in ast.walk(node):
            if isinstance(sub, ast.Name) and sub.id in top \
                    and sub.id not in seen:
                seen.add(sub.id)
                frontier.extend(top[sub.id])
    for name in sorted(seen):
        parts.append(f"### {name}")
        parts.extend(ast.dump(n) for n in top[name])
    return "\n".join(parts)


def ast_relevant_unchanged(sha: str, path: str, query: str) -> bool:
    """True iff the query-visible AST closure is identical between the
    stamp commit and HEAD — i.e. the post-stamp commits could not have
    changed what this query computes or what its oracle asserts.  The
    stamp-era closure is read from ``path`` at ``sha``, falling back
    to registry.py at ``sha`` for queries that MOVED module (the r12
    parity-query extraction): a verbatim move must not read as churn.
    Any failure to prove equality (parse error, dynamic wiring, git
    error) returns False (conservative: stays stale)."""
    try:
        with open(os.path.join(REPO, path)) as fh:
            new = fh.read()
    except OSError:
        return False
    d_new = _relevant_dump(new, query)
    if d_new is None:
        return False
    for old_path in (path, REGISTRY_FILE):
        try:
            old = _git("show", f"{sha}:{old_path}")
        except Exception:  # noqa: BLE001 — file absent at stamp sha
            continue
        d_old = _relevant_dump(old, query)
        if d_old is not None:
            return d_old == d_new
    return False


REGISTRY_FILE = "logsqlite_spark/registry.py"


def audit(window: int = 50) -> dict:
    rounds = round_commits()
    ledger = load_ledger()
    files = query_files()

    rows = []
    for name, path in files.items():
        stamp = ledger.get(name)
        if stamp is None:
            rows.append(
                {
                    "query": name,
                    "file": path,
                    "stamp_round": None,
                    "status": "never-stamped",
                    "changes_since_stamp": [],
                }
            )
            continue
        rnd = stamp["round"]
        sha = rounds.get(rnd)
        if sha is None:
            # a stamp round with no matching verdict commit (regex
            # drift, shallow clone) must not silently read as fresh —
            # treat as stale so it rotates forward and the exit code
            # stays non-zero
            changes = [f"(no verdict commit found for round {rnd} — "
                       f"treating stamp as stale)"]
        else:
            changes = commits_since(sha, path)
        ast_fresh = False
        if changes and sha is not None:
            # file churned post-stamp — but only the query-visible AST
            # closure matters; comment edits and other queries' code
            # landing in the same file must not rotate this stamp
            ast_fresh = ast_relevant_unchanged(sha, path, name)
        status = "stale" if (changes and not ast_fresh) else "fresh"
        # err == "no_oracle" is the driver's rows-only marker for queries
        # that deliberately omit an oracle_sql() entry — a design property,
        # not a failure.  Real failures: hash/rows mismatch or another err.
        if (
            stamp["hash_match"] is False
            or stamp["rows_match"] is False
            or (stamp["err"] not in (None, "", "no_oracle"))
        ):
            status = "stamped-error"
        rows.append(
            {
                "query": name,
                "file": path,
                "stamp_round": rnd,
                "hash_match": stamp["hash_match"],
                "rows_match": stamp["rows_match"],
                "status": status,
                "changes_since_stamp": changes,
                "ast_fresh": ast_fresh,
            }
        )

    # r17 (VERDICT r16 #2): "code-touched since last stamp" ranks ABOVE
    # stamp age, full stop — stale is its own bucket ahead of every
    # fresh stamp.  The r16 blended-penalty ordering (stale reads
    # STALE_AGE_PENALTY rounds older, then one shared bucket) let the
    # round's riskiest rewrite (semantic_dedup_pairs' numpy Gram,
    # r16-touched) rank at position 54 — four slots outside the
    # driver's 50-query stamp window — behind old-but-unchanged
    # stamps.  A stamp on code that NO LONGER EXISTS is weaker
    # evidence than ANY stamp on live code, whatever their ages; the
    # starvation concern the blend addressed (a large churn set
    # pushing very old fresh stamps out indefinitely) is bounded by
    # the AST-closure relevance filter above, which already keeps
    # comment-only / other-query churn from reading as stale.
    # Within stale: oldest stamp first.  Within fresh: oldest stamp
    # first.  Tie-breaks: registry.py-defined lambdas last (that file
    # churns every round for wiring reasons, the weakest stale
    # signal), then higher post-stamp churn first.
    order = {"never-stamped": 0, "stamped-error": 1, "stale": 2, "fresh": 3}

    def _eff_round(r: dict) -> int:
        if r["stamp_round"] is None:
            return -(10**9)
        return r["stamp_round"]

    suggested = sorted(
        rows,
        key=lambda r: (
            order[r["status"]],
            _eff_round(r),
            r["file"] == REGISTRY_FILE,
            -len(r["changes_since_stamp"]),
            r["query"],
        ),
    )
    head = [r["query"] for r in suggested[:window]]
    full_order = [r["query"] for r in suggested]
    bad = [r for r in rows if r["status"] in ("never-stamped", "stale", "stamped-error")]
    return {"rows": rows, "suggested_head": head, "suggested_order": full_order, "bad": bad}


CERT_WINDOW_PATH = os.path.join(REPO, "logsqlite_spark", "cert_window.py")

_CERT_WINDOW_TEMPLATE = '''"""Driver-certification ordering — GENERATED, do not hand-edit.

Regenerate with:  python tools/stamp_freshness.py --write

The round driver oracle-stamps only the FIRST 50 entries of
``__spark_entry__.queries()``; stamps persist across rounds.  This
ordering front-loads queries that most need a fresh stamp:
never-stamped first, then failed-at-latest-stamp, then STALE (the
query-visible code changed after its latest stamp — a stamp on code
that no longer exists is weaker evidence than any stamp on live code;
oldest stamp first within the bucket), then fresh by stamp age;
registry.py-defined lambdas last within a bucket since that file
churns for unrelated wiring.

Living in its own module keeps window rotation from dirtying
registry.py and poisoning the very freshness signal used to rotate.
"""

CERT_FIRST: tuple[str, ...] = (
{entries})
'''


def write_cert_window(full_order: list[str]) -> None:
    entries = "".join(f'    "{name}",\n' for name in full_order)
    with open(CERT_WINDOW_PATH, "w") as fh:
        fh.write(_CERT_WINDOW_TEMPLATE.format(entries=entries))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", action="store_true", help="emit machine JSON")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument(
        "--write",
        action="store_true",
        help="regenerate logsqlite_spark/cert_window.py from the suggested order",
    )
    args = ap.parse_args()

    result = audit(window=args.window)
    if args.write:
        write_cert_window(result["suggested_order"])
        print(f"wrote {CERT_WINDOW_PATH} ({len(result['suggested_order'])} entries)")
    if args.json:
        print(json.dumps(result, indent=1))
    else:
        for r in sorted(
            result["rows"],
            key=lambda r: (r["stamp_round"] if r["stamp_round"] is not None else -1),
        ):
            mark = {"fresh": " ", "stale": "!", "never-stamped": "?", "stamped-error": "E"}[
                r["status"]
            ]
            rnd = f"r{r['stamp_round']}" if r["stamp_round"] is not None else "--"
            print(f"{mark} {rnd:>3}  {r['query']:<32} {r['file']}")
            for c in r["changes_since_stamp"]:
                print(f"        post-stamp: {c}")
        print()
        print(f"suggested _CERT_FIRST head (window={args.window}):")
        for name in result["suggested_head"]:
            print(f"    \"{name}\",")
        n_bad = len(result["bad"])
        print(f"\n{n_bad} queries never-stamped/stale/errored; {len(result['rows'])} total")
    return 1 if result["bad"] else 0


if __name__ == "__main__":
    sys.exit(main())
