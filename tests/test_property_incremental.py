"""Property tests for the round-9 incremental operators: hypothesis
folds random edge/doc batches through the incremental APIs and the
result must equal the one-shot recompute over the union — a pure-
Python union-find is the model for components."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

EDGE_BATCHES = st.lists(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=30),
                  st.integers(min_value=0, max_value=30))
        .map(lambda p: (min(p), max(p)))
        .filter(lambda p: p[0] != p[1]),
        min_size=0, max_size=8,
    ),
    min_size=1, max_size=3,
)


def _model_components(edges):
    """Union-find with min-label roots."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {n: find(n) for n in parent}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batches=EDGE_BATCHES)
def test_cc_incremental_folds_match_model(spark, batches):
    """Sequentially folding edge batches through
    connected_components_incremental equals the union-find model over
    every edge (and hence the one-shot Spark recompute, separately
    pinned)."""
    from logsqlite_spark.operators.dedup import (
        connected_components_incremental,
    )

    EDGES = "a_id long, b_id long"
    labels = spark.createDataFrame([], "doc_id long, cluster_id long")
    all_edges = []
    for batch in batches:
        all_edges.extend(batch)
        bdf = spark.createDataFrame(batch, EDGES) if batch else \
            spark.createDataFrame([], EDGES)
        labels = connected_components_incremental(bdf, labels)
        # keep the fold cheap: materialize between batches
        labels = labels.localCheckpoint(eager=True)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == _model_components(all_edges)


CHAIN = st.lists(
    st.tuples(st.integers(min_value=1, max_value=40),
              st.integers(min_value=0, max_value=39)),
    min_size=0, max_size=25,
)


@settings(max_examples=200, deadline=None)
@given(raw_pairs=CHAIN)
def test_flatten_relabels_matches_naive_resolution(raw_pairs):
    """_flatten_relabels must equal naive follow-the-chain resolution
    on any DECREASING mapping (the only shape the sink produces: a
    merge maps a label to a strictly smaller one, and one old label
    is retired at most once — later batches only remap the target)."""
    from logsqlite_spark.streaming.incremental import _flatten_relabels

    raw = {}
    for a, b in raw_pairs:
        if b < a and a not in raw:
            raw[a] = b

    rows = [{"old": o, "new": n} for o, n in raw.items()]
    flat = _flatten_relabels(rows)

    def naive(x):
        while x in raw:
            x = raw[x]
        return x

    assert set(flat) == set(raw)
    for o in raw:
        assert flat[o] == naive(o)
