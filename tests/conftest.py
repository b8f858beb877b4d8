from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "4")

@pytest.fixture(scope="session")
def spark():
    from logsqlite_spark.session import get_spark

    s = get_spark("logsqlite-spark-tests")
    yield s

@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"

@pytest.fixture()
def logs_df(spark):
    """Tiny logs table exercising the reference's tricky semantics:
    out-of-ts-order arrivals, multiple containers, ts collisions."""
    rows = [
        # (seq, ts_nanos, container_id, source, line)
        (1, 1_000_000_000_000, "c1", "stdout", "a\n"),
        (2, 2_000_000_000_000, "c1", "stdout", "b\n"),
        (3, 1_500_000_000_000, "c1", "stderr", "late\n"),  # out of ts order
        (4, 2_000_000_000_000, "c1", "stdout", "same-ts\n"),
        (5, 3_000_000_000_000, "c1", "stdout", "c\n"),
        (1, 2_500_000_000_000, "c2", "stdout", "x\n"),
        (2, 2_600_000_000_000, "c2", "stdout", "y\n"),
    ]
    return spark.createDataFrame(
        rows, "seq long, ts_nanos long, container_id string, source string, line string"
    )
