"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at a given SF, then compares row count, schema (name->normalized
type), and an order-insensitive value multiset. Use while iterating:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from logsqlite_spark.session import get_spark  # noqa: E402
from logsqlite_spark.tables import TABLE_NAMES  # noqa: E402

def _norm_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return repr(v)

def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return out

# DuckDB result types whose Arrow serialization matches what Spark emits for
# the same Python value. Anything outside this set (HUGEINT from an uncast
# sum(), DECIMAL, unsigned ints) hashes differently in the driver's typed
# (Arrow) comparison even when Python-level values are equal — the round-1..4
# q1/q12/q18 bug. Checked via DESCRIBE so it fails locally before the driver.
_ALLOWED_DUCK_TYPES = (
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "VARCHAR", "DATE", "TIMESTAMP", "BLOB",
)

def _bad_duck_types(con, sql):
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:  # noqa: BLE001 — the main execute reports the error
        return []
    bad = []
    for row in desc:
        col, ty = row[0], row[1].upper()
        base = ty.split("(")[0].strip()
        if base not in _ALLOWED_DUCK_TYPES and not base.endswith("[]"):
            bad.append(f"{col}:{ty}")
    return bad

def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {spark_s:.1f}s)")
            if not srows:
                print(f"WARN {name}: rows-only query returned 0 rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        bad_types = _bad_duck_types(con, oracles[name])
        if bad_types:
            problems.append(f"oracle result types not driver-safe: {bad_types}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sm = _multiset(srows, scols)
            dm = _multiset(drows, dcols)
            if sm != dm:
                diff = [(a, b) for a, b in zip(sm, dm) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"ok   {name}: {len(srows)} rows match ({spark_s:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0

if __name__ == "__main__":
    raise SystemExit(main())
