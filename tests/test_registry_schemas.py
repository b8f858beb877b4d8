"""Registry-wide harness-contract guard.

The round driver canonicalizes every query's output with a pandas
``sort_values`` over all columns before hashing; a list/dict cell makes
pandas' hashtable throw ``unhashable type`` and the query lands as a
hard ``err`` row whatever the math says (r9's ``embedding_pca``).  This
test constructs EVERY registered query at sf0.001 and asserts its
output schema is scalar-columned — no ArrayType/MapType/StructType ever
reaches the driver gate again.

Construction only (``.schema``), no execution: control-plane collects a
query runs while building its plan (centroid fits, artifact reads) do
run, which is also a cheap smoke that every registry callable is
constructible against the canonical tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from logsqlite_spark import registry

SF = "/root/testdata/sf0.001"

_COMPLEX = (ArrayType, MapType, StructType)


def test_no_query_emits_complex_columns(spark):
    offenders: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, fn in registry.queries().items():
        try:
            df = fn(spark, SF)
        except Exception as exc:  # noqa: BLE001 — collect all, fail once
            errors[name] = f"{type(exc).__name__}: {exc}"
            continue
        bad = [f.name for f in df.schema.fields
               if isinstance(f.dataType, _COMPLEX)]
        if bad:
            offenders[name] = bad
    assert not errors, f"unconstructible queries: {errors}"
    assert not offenders, (
        "queries emitting driver-incompatible complex columns "
        f"(pandas canonicalizer crashes on list cells): {offenders}")


def test_oracle_keys_subset_of_queries():
    qs = set(registry.queries())
    extra = set(registry.oracle_sql()) - qs
    assert not extra, f"oracle_sql keys with no queries() entry: {extra}"


def test_coverage_doc_names_every_query():
    """COVERAGE.md is the judge-facing SURVEY §2 → implementation map;
    it silently went stale for round 9's second half.  Every registry
    query key must appear (backtick-quoted) somewhere in it."""
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COVERAGE.md")
    with open(path) as fh:
        cov = fh.read()
    missing = [q for q in registry.queries() if f"`{q}`" not in cov]
    assert not missing, f"queries undocumented in COVERAGE.md: {missing}"


def test_cert_window_names_registered():
    from logsqlite_spark.cert_window import CERT_FIRST

    qs = set(registry.queries())
    missing = [n for n in CERT_FIRST if n not in qs]
    assert not missing, f"cert window references unknown queries: {missing}"
    # the window must cover every query so stamps eventually rotate
    assert set(CERT_FIRST) == qs


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))
