"""Anomaly operators: z-score outliers and histograms."""

from pyspark.sql import functions as F

from logsqlite_spark.operators.anomaly import value_histogram, value_outliers


def _events(spark, vals, key=1):
    rows = [(i, key, "t", float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double")


def test_outlier_detected(spark):
    # 9 values at 10.0 and one at 1000.0 -> the spike is >2.5 sigma out
    ev = _events(spark, [10.0] * 9 + [1000.0])
    got = value_outliers(ev, cutoff=2.5).collect()
    assert [r.event_id for r in got] == [9]
    assert got[0].z > 2.5


def test_no_outliers_in_uniform_data(spark):
    ev = _events(spark, [10.0, 11.0, 10.0, 11.0, 10.5, 10.5])
    assert value_outliers(ev, cutoff=2.5).count() == 0


def test_zero_variance_key_skipped(spark):
    ev = _events(spark, [5.0] * 4)  # sigma = 0: no z is defined
    assert value_outliers(ev).count() == 0


def test_histogram_bins(spark):
    # bin width 1000 cents = $10
    ev = _events(spark, [1.0, 5.0, 9.99, 10.0, 25.0])
    got = {r.bin: (r.bin_lo_c, r.n) for r in value_histogram(ev).collect()}
    assert got[0] == (0, 3)       # $0-10
    assert got[1] == (1000, 1)    # $10-20
    assert got[2] == (2000, 1)    # $20-30


def test_seasonal_anomaly_planted_spike_and_drop(spark):
    """Five Mondays at 09:00 with counts 10,10,10,10,30 → the 30 is a
    spike (30·5 > 2·70) and the 10s stay normal (10·5·2 ≥ 70); at
    10:00 counts 10,10,10,10,1 → the 1 is a drop (1·5·2 < 41). The
    spike inflating its own baseline is part of the semantics — a
    too-small cell count cannot hold a 2x spike without dragging its
    peers under the drop line (the first planted version proved it)."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.anomaly import seasonal_volume_anomaly

    mondays = ("2024-01-01", "2024-01-08", "2024-01-15",
               "2024-01-22", "2024-01-29")
    rows = []
    for day, n9 in zip(mondays, (10, 10, 10, 10, 30)):
        rows += [(day + " 09:30:00",)] * n9
    for day, n10 in zip(mondays, (10, 10, 10, 10, 1)):
        rows += [(day + " 10:30:00",)] * n10
    ev = (spark.createDataFrame(rows, "t string")
          .select((F.unix_timestamp("t") * F.lit(1_000_000_000))
                  .alias("ts")))
    got = {(r["day"], r["hour"]): (r["n"], r["expected_milli"], r["flag"])
           for r in seasonal_volume_anomaly(ev).collect()}
    assert got[("2024-01-29", 9)] == (30, 14000, "spike")
    assert got[("2024-01-01", 9)] == (10, 14000, "normal")
    assert got[("2024-01-29", 10)] == (1, 8200, "drop")
    assert got[("2024-01-01", 10)] == (10, 8200, "normal")


def test_value_psi_zero_on_identical_distribution(spark):
    """Identical ref/cur value distributions measure PSI 0 exactly
    (every p_i == q_i, each term 0); a gross shift crosses the 0.25
    'shifted' gate."""
    from logsqlite_spark.operators.anomaly import value_psi

    split = 1705363200000000
    before = (split - 10) * 1000
    after = (split + 10) * 1000
    same = [(before, "t", float(v)) for v in (10, 60, 110, 160)] + \
           [(after, "t", float(v)) for v in (10, 60, 110, 160)]
    df = spark.createDataFrame(
        same, "ts long, event_type string, value double")
    rows = value_psi(df).collect()
    assert len(rows) == 1
    assert rows[0]["psi"] == 0.0
    assert rows[0]["n_ref"] == 4 and rows[0]["n_cur"] == 4

    shifted = [(before, "t", 10.0)] * 50 + [(after, "t", 510.0)] * 50
    df2 = spark.createDataFrame(
        shifted, "ts long, event_type string, value double")
    assert value_psi(df2).collect()[0]["psi"] > 0.25


def test_value_psi_clamps_out_of_range_values(spark):
    """Values beyond the bin grid (negative / above the top bin) fold
    into the edge bins instead of dropping or erroring."""
    from logsqlite_spark.operators.anomaly import value_psi

    split = 1705363200000000
    rows = [((split - 10) * 1000, "t", -5.0),
            ((split - 10) * 1000, "t", 9e9),
            ((split + 10) * 1000, "t", -5.0),
            ((split + 10) * 1000, "t", 9e9)]
    df = spark.createDataFrame(
        rows, "ts long, event_type string, value double")
    out = value_psi(df).collect()[0]
    assert out["n_ref"] == 2 and out["n_cur"] == 2 and out["psi"] == 0.0


def test_psi_bin_counts_merge_bit_identical(spark):
    """PSI sufficient statistics merge by exact integer sum: partials
    from any split, summed, serve a report bit-identical to one-shot
    (the streaming/incremental state contract)."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.anomaly import (
        psi_bin_counts,
        value_psi,
        value_psi_from_counts,
    )
    from logsqlite_spark.tables import table

    ev = table(spark, "/root/testdata/sf0.001", "events")
    parts = psi_bin_counts(ev.filter(F.col("event_id") % 3 == 0)) \
        .unionByName(psi_bin_counts(ev.filter(F.col("event_id") % 3 == 1))) \
        .unionByName(psi_bin_counts(ev.filter(F.col("event_id") % 3 == 2)))
    merged = (parts.groupBy("event_type", "cur", "bin")
              .agg(F.sum("n").cast("long").alias("n")))
    got = sorted(map(tuple, value_psi_from_counts(merged).collect()))
    want = sorted(map(tuple, value_psi(ev).collect()))
    assert got == want and len(want) > 0


def test_user_activity_entropy_semantics(spark):
    """Single-type user reads entropy 0; a uniform two-type user reads
    ln 2; counts and type cardinalities are exact."""
    import math

    from logsqlite_spark.operators.analytics import user_activity_entropy

    rows = [(1, "click")] * 5 + [(2, "click"), (2, "view")] * 3
    ev = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, event_type string")
    got = {r["user_id"]: r for r in user_activity_entropy(ev).collect()}
    assert got[1]["entropy"] == 0.0 and got[1]["n_types"] == 1
    assert got[1]["n_events"] == 5
    assert abs(got[2]["entropy"] - round(math.log(2), 6)) < 1e-9
    assert got[2]["n_types"] == 2 and got[2]["n_events"] == 6


def test_user_activity_gini_semantics(spark):
    """Uniform counts read Gini 0; extreme concentration approaches
    (n-1)/n; the rank formula matches the classic mean-absolute-
    difference definition on a small case."""
    from logsqlite_spark.operators.analytics import user_activity_gini

    def ev(counts):
        rows = []
        eid = 0
        for u, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, u, "t"))
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string")

    assert user_activity_gini(ev([5, 5, 5, 5])).collect()[0]["gini"] == 0.0

    xs = [1, 2, 3, 94]
    row = user_activity_gini(ev(xs)).collect()[0]
    n, s = len(xs), sum(xs)
    mad = sum(abs(a - b) for a in xs for b in xs) / (n * n)
    want = round(mad / (2 * s / n), 6)
    assert row["gini"] == want
    assert row["n_users"] == 4 and row["n_events"] == 100


def test_daily_burst_zscore_planted(spark):
    """Seven quiet days (counts 10±1) then a 60-event day: the spike
    day flags as burst with a large positive z; quiet days with a
    full window stay normal; the first 3 days emit no row."""
    from logsqlite_spark.operators.anomaly import daily_burst_zscore

    base = 1_704_067_200_000_000_000  # 2024-01-01 in ns
    day_ns = 86_400_000_000_000
    rows = []
    eid = 0
    counts = [10, 11, 10, 9, 10, 11, 10, 60]
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + d * day_ns + eid, 1, "view", 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, "
        "event_type string, value double")
    out = {r["day"]: r for r in daily_burst_zscore(ev).collect()}
    assert "2024-01-01" not in out  # no trailing window yet
    assert out["2024-01-08"]["flag"] == "burst"
    assert out["2024-01-08"]["z"] > 10
    # quiet days with a richer window read normal (the 3-day-window
    # early days are legitimately twitchy — that's what the n>=3
    # floor bounds, not eliminates)
    assert out["2024-01-06"]["flag"] == "normal"
    assert out["2024-01-07"]["flag"] == "normal"


def test_doc_length_psi_detects_planted_drift(spark):
    """First-half docs short, second-half docs long in lang 'xx':
    PSI large for xx; a stable lang stays near 0."""
    from logsqlite_spark.operators.anomaly import doc_length_psi

    # interleaved ids so the doc_id-half split divides BOTH langs
    rows = []
    for i in range(200):
        rows.append((2 * i, "xx", 50 if i < 100 else 1500))
        rows.append((2 * i + 1, "yy", 400 + (i % 5)))
    docs = spark.createDataFrame(
        [(i, "t", lang, n) for (i, lang, n) in rows],
        "doc_id long, text string, lang string, n_chars long")
    got = {r["lang"]: r for r in doc_length_psi(docs).collect()}
    assert got["xx"]["psi"] > 1.0
    assert got["yy"]["psi"] < 0.1
    assert got["xx"]["n_ref"] == got["xx"]["n_cur"] == 100
