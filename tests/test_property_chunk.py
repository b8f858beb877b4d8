"""Property test: chunk_documents vs a pure-Python model.

Hypothesis generates adversarial token counts and chunk/overlap
configurations (doc shorter than a chunk, doc exactly one chunk,
stride-1 maximal overlap, aligned and misaligned tails) and the
Spark operator must agree exactly on the chunk set."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from logsqlite_spark.operators.textstats import chunk_documents

CASES = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=40),   # n tokens
        st.integers(min_value=2, max_value=12),   # chunk_tokens
        st.integers(min_value=0, max_value=10),   # overlap (clamped)
    ),
    min_size=1,
    max_size=8,
)


def _model(n: int, c: int, o: int) -> list[tuple[int, int, str]]:
    toks = [f"w{i}" for i in range(n)]
    stride = c - o
    out = []
    for idx, start in enumerate(range(0, max(n - o, 1), stride)):
        piece = toks[start:start + c]
        out.append((idx, len(piece), " ".join(piece)))
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(cases=CASES)
def test_chunking_matches_model(spark, cases):
    rows, want = [], {}
    for doc_id, (n, c, o) in enumerate(cases):
        o = min(o, c - 1)
        rows.append((doc_id, " ".join(f"w{i}" for i in range(n)), c, o))
        want[doc_id] = _model(n, c, o)

    for doc_id, text, c, o in rows:
        df = spark.createDataFrame([(doc_id, text)],
                                   "doc_id long, text string")
        got = sorted(
            (r["chunk_id"], r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(df, chunk_tokens=c,
                                     overlap=o).collect())
        assert got == sorted(want[doc_id]), (doc_id, c, o)
