"""Property test: theta retention_overlap vs a pure-Python set model.

Hypothesis generates adversarial little (day, user) activity logs —
gap days, single-user days, users active every day, empty overlaps —
and the one-scan Expand/conditional-sketch formulation must agree
EXACTLY with plain set algebra (theta sketches are exact at these
cardinalities; that exactness is what licenses the driver oracle)."""

from __future__ import annotations

from datetime import date, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from logsqlite_spark.operators.sketches import retention_overlap

BASE = date(2024, 1, 1)

ACTIVITY = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),    # day offset (gaps!)
        st.integers(min_value=0, max_value=9),    # user
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(raw=ACTIVITY)
def test_retention_overlap_matches_set_model(spark, raw):
    rows = [(str(BASE + timedelta(days=d)), f"u{u}") for d, u in raw]
    df = (spark.createDataFrame(rows, "day string, user_id string")
          .select(F.col("day").cast("date").alias("day"), "user_id",
                  F.lit(0).cast("long").alias("value_c"),
                  F.lit("x").alias("event_type")))

    got = {r["day"]: (r["active"], r["returning"], r["new_users"],
                      r["churned"])
           for r in retention_overlap(df).collect()}

    by_day: dict = {}
    for d, u in raw:
        by_day.setdefault(BASE + timedelta(days=d), set()).add(f"u{u}")
    want = {}
    for d, users in by_day.items():
        prev = by_day.get(d - timedelta(days=1))
        if prev is None:
            continue
        want[str(d)] = (len(users), len(users & prev),
                        len(users - prev), len(prev - users))
    assert got == want
