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
