"""ReadLogs batch semantics (SURVEY.md §2.2-2.4, reference logger.rs:303-392)."""

from logsqlite_spark.operators.read import (
    count_logs,
    count_per_container,
    read_logs,
    tail_global,
    tail_per_container,
)

def seqs(df):
    return [r["seq"] for r in df.select("seq").collect()]

def test_both_bounds_inclusive(logs_df):
    # logger.rs:329,340 use >= and <=
    out = read_logs(
        logs_df, container_id="c1",
        since="1970-01-01T00:25:00Z",   # == 1_500_000_000_000 ns
        until="1970-01-01T00:33:20Z",   # == 2_000_000_000_000 ns
    )
    assert seqs(out) == [2, 3, 4]  # boundary rows included, arrival order

def test_arrival_order_not_ts_order(logs_df):
    # late event (seq 3, ts between 1 and 2) must stay in seq position
    out = read_logs(logs_df, container_id="c1")
    assert seqs(out) == [1, 2, 3, 4, 5]

def test_tail_clamped_when_exceeds_count(logs_df):
    # logger.rs:367: offset = max(count - tail, 0)
    out = read_logs(logs_df, container_id="c1", tail=100)
    assert seqs(out) == [1, 2, 3, 4, 5]

def test_tail_after_filters(logs_df):
    # reference resolves tail AFTER since/until (cond applies to probe)
    out = read_logs(
        logs_df, container_id="c1",
        until="1970-01-01T00:33:20Z",  # keeps seq 1,2,3,4
        tail=2,
    )
    assert seqs(out) == [3, 4]

def test_cursor_resume(logs_df):
    out = read_logs(logs_df, container_id="c1", cursor=3)
    assert seqs(out) == [3, 4, 5]  # >= cursor (logger.rs:320)

def test_sentinels_mean_no_filter(logs_df):
    out = read_logs(
        logs_df, container_id="c1",
        since="0001-01-01T00:00:00Z",
        until="0001-01-01T00:00:00Z",
        tail=-1,
    )
    assert seqs(out) == [1, 2, 3, 4, 5]

def test_unparseable_ts_drops_predicate(logs_df):
    out = read_logs(logs_df, container_id="c1", since="garbage")
    assert seqs(out) == [1, 2, 3, 4, 5]

def test_tail_global(logs_df):
    out = tail_global(logs_df.filter("container_id = 'c1'"), 2)
    assert sorted(seqs(out)) == [4, 5]

def test_tail_per_container(logs_df):
    out = tail_per_container(logs_df, 1)
    got = {(r["container_id"], r["seq"]) for r in out.collect()}
    assert got == {("c1", 5), ("c2", 2)}

def test_count_logs(logs_df):
    assert count_logs(logs_df, container_id="c1") == 5
    assert count_logs(logs_df, container_id="c1",
                      since="1970-01-01T00:33:20Z") == 3  # seq 2,4,5

def test_count_per_container(logs_df):
    got = {r["container_id"]: r["n_lines"]
           for r in count_per_container(logs_df).collect()}
    assert got == {"c1": 5, "c2": 2}
