"""Template mining (logparse.log_templates): planted lines with real
id/counter variability collapse to the right skeletons."""

from logsqlite_spark.operators.logparse import log_templates, mask_line


def test_log_templates_planted(spark):
    rows = [
        # one logical template, three variable instances
        (1, 101, "req", 'GET /api/v1/items/42 took 13ms'),
        (2, 102, "req", 'GET /api/v1/items/977 took 240ms'),
        (3, 101, "req", 'GET /api/v2/items/8 took 7ms'),
        # hex session ids (16+ chars) mask as <HEX>, not digit-shredded
        (4, 103, "auth", 'session deadbeefdeadbeef0123 expired'),
        (5, 104, "auth", 'session 0123456789abcdef0123456789abcdef expired'),
        # short hex-looking token stays literal (below the id threshold)
        (6, 105, "auth", 'token cafe rejected'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, line string")
    got = {(r["event_type"], r["template"]):
           (r["n"], r["n_users"], r["first_event"])
           for r in log_templates(df, line_col="line").collect()}
    assert got[("req", "GET /api/v<N>/items/<N> took <N>ms")] == (3, 2, 1)
    assert got[("auth", "session <HEX> expired")] == (2, 2, 4)
    assert got[("auth", "token cafe rejected")] == (1, 1, 6)
    assert len(got) == 3


def test_mask_line_order_hex_before_digits(spark):
    df = spark.createDataFrame(
        [("id=00000000000000ff n=255",)], "line string")
    assert df.select(mask_line("line").alias("m")).first()["m"] \
        == "id=<HEX> n=<N>"
