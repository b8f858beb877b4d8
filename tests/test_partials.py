"""Partial-log reassembly (entry.proto partial metadata semantics)."""

import pytest

from logsqlite_spark.operators.partials import reassemble_partials

@pytest.fixture()
def logs_with_partials(spark):
    rows = [
        # whole lines
        (1, 10, "stdout", "short\n", False, None, "c1"),
        (5, 50, "stdout", "another\n", False, None, "c1"),
        # a 3-fragment long line (id p1), fragments arrive in order
        (2, 20, "stdout", "AAA\n", True, (False, "p1", 1), "c1"),
        (3, 21, "stdout", "BBB\n", True, (False, "p1", 2), "c1"),
        (4, 22, "stdout", "CCC\n", True, (True, "p1", 3), "c1"),
        # a 2-fragment line on another container, out-of-order arrival
        (1, 30, "stderr", "tail\n", True, (True, "q1", 2), "c2"),
        (2, 29, "stderr", "head-\n", True, (False, "q1", 1), "c2"),
    ]
    return spark.createDataFrame(
        rows,
        "seq long, ts_nanos long, source string, line string, partial boolean, "
        "partial_meta struct<last:boolean,id:string,ordinal:int>, container_id string",
    )

def test_reassembles_in_ordinal_order(logs_with_partials):
    out = {(r["container_id"], r["seq"]): r["line"]
           for r in reassemble_partials(logs_with_partials).collect()}
    assert out[("c1", 2)] == "AAABBBCCC\n"

def test_out_of_order_fragments_sort_by_ordinal(logs_with_partials):
    out = {(r["container_id"], r["seq"]): r["line"]
           for r in reassemble_partials(logs_with_partials).collect()}
    # merged row takes the first fragment's seq (min), text in ordinal order
    assert out[("c2", 1)] == "head-tail\n"

def test_whole_lines_pass_through(logs_with_partials):
    out = reassemble_partials(logs_with_partials)
    assert out.count() == 4  # 2 whole + 2 merged
    got = {(r["container_id"], r["seq"]): r["line"] for r in out.collect()}
    assert got[("c1", 1)] == "short\n"
    assert got[("c1", 5)] == "another\n"
