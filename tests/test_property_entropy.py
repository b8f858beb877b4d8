"""Property test: doc_entropy's sorted-run fold vs a pure-Python
Counter model — adversarial token multisets (all-same, all-distinct,
long runs, empty docs, single tokens)."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from logsqlite_spark.operators.textstats import doc_entropy

DOCS = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "dd", "eee"]),
             min_size=0, max_size=30),
    min_size=1, max_size=6,
)


def _model(toks: list[str]):
    n = len(toks)
    if n == 0:
        return (0, 0, None)
    counts = Counter(toks)
    sl = sum(c * math.log(c) for c in counts.values())
    h = round((math.log(n) - sl / n) / math.log(2), 4)
    return (n, len(counts), h)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(docs=DOCS)
def test_entropy_matches_counter_model(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    got = {r["doc_id"]: (r["n_tokens"], r["n_unique"], r["entropy_bits"])
           for r in doc_entropy(
               spark.createDataFrame(rows, "doc_id long, text string")
           ).collect()}
    for i, toks in enumerate(docs):
        assert got[i] == _model(toks), (i, toks)
