"""Dump full .explain("formatted") output for bench queries to plans/r17/.

Usage:
    python tools/dump_r17_plans.py before [query ...]
    python tools/dump_r17_plans.py after  [query ...]

Writes plans/r17/<query>_<tag>.txt (one file per query, full formatted
plan, untruncated) at the bench SF (sf0.1) so the plan shapes match
what BENCH_r17.json measures. With no explicit query list, dumps every
query in bench.py's BENCH_QUERIES.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    assert tag in ("before", "after"), tag
    names = sys.argv[2:]

    from bench import BENCH_QUERIES
    from logsqlite_spark import registry
    from logsqlite_spark.plans.inspect import explain_str
    from logsqlite_spark.session import get_spark

    if not names:
        names = list(BENCH_QUERIES)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump-r17")
    qs = registry.queries()

    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r17"
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        try:
            plan = explain_str(qs[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — record, keep going
            plan = f"ERROR building plan: {exc!r}"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote plans/r17/{name}_{tag}.txt ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
