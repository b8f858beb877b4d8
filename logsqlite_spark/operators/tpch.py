"""Engine-health queries over the star schema (TPC-H-style shapes).

Not part of the reference surface — these exercise the general engine
paths (wide aggregation, multi-way join, top-k) that the log and
LLM-pipeline operators compose, and anchor the benchmark.

Oracle determinism: money/quantity sums are computed in *cents* via
floor-quantization (``floor(cast(x as double) * 100 + 0.5)``) so both
engines quantize identically — ``round()`` differs between Spark's
BigDecimal HALF_UP and DuckDB's C-library rounding on doubles
epsilon-close to a .5 boundary (the round-1 driver flake) — and sum
exact integers in any order; top-k orderings tie-break on a key.
All quantized columns here are non-negative, so floor(x*100+0.5) is
exact half-up rounding.

Scale notes: q1 is a pure map-side-combinable aggregation (shuffle
carries one partial row per group per partition). q3 joins two big
tables on their natural keys — at 100 TB this is a shuffle join on
(custkey, orderkey) which AQE re-plans; the ``customer`` side filter
is pushed below the join, and at real scale the filtered customer dim
broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logsqlite_spark.tables import table

def _cents(col: str) -> F.Column:
    return F.floor(F.col(col).cast("double") * 100 + F.lit(0.5)).cast("bigint")

def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """Q1 shape: pricing summary report by returnflag/linestatus."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("count_order"),
            F.sum(_cents("l_quantity")).cast("long").alias("sum_qty_c"),
            F.sum(_cents("l_extendedprice")).cast("long").alias("sum_base_price_c"),
            F.sum(_cents("l_discount")).cast("long").alias("sum_discount_c"),
        )
    )

def top_revenue_orders(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: str = "BUILDING",
                       k: int = 10) -> DataFrame:
    """Q3 shape: top unshipped-revenue orders for a market segment."""
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = lineitem.filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    ).select("l_orderkey", _cents("l_extendedprice").alias("price_c"),
             _cents("l_discount").alias("disc_c"))
    rev = (F.col("price_c") * (F.lit(10000) - F.col("disc_c") * 100)).cast("bigint")
    joined = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.sum(rev).alias("revenue_u"))
    )
    return (
        joined.orderBy(F.col("revenue_u").desc(), F.col("l_orderkey"))
        .limit(k)
        .select(F.col("l_orderkey").cast("long"),
                F.col("revenue_u").cast("long"))
    )

def revenue_forecast(lineitem: DataFrame) -> DataFrame:
    """Q6 shape: pure filtered aggregation — the pushdown showcase.

    All three predicates reach the parquet scan; the aggregate is one
    partial+final sum of exact integers (cents x cents = 1e-4 dollar
    units).
    """
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_cents("l_extendedprice") * _cents("l_discount"))
            .cast("long").alias("revenue_u"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )

def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pricing_summary(table(spark, sf_dir, "lineitem"))

def _q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_revenue_orders(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"),
    )

def _q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    return revenue_forecast(table(spark, sf_dir, "lineitem"))

QUERIES = {
    "tpch_q1_pricing": _q_tpch_q1,
    "tpch_q3_top_orders": _q_tpch_q3,
    "tpch_q6_forecast": _q_tpch_q6,
}

ORACLES = {
    "tpch_q1_pricing": (
        "SELECT l_returnflag, l_linestatus, count(*) AS count_order, "
        "sum(CAST(floor(CAST(l_quantity AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS sum_qty_c, "
        "sum(CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS sum_base_price_c, "
        "sum(CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS sum_discount_c "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "tpch_q3_top_orders": (
        "SELECT l_orderkey, CAST(sum(CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) "
        "  * (10000 - CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5) AS BIGINT) * 100)) AS BIGINT) AS revenue_u "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' "
        "AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00' "
        "GROUP BY l_orderkey "
        "ORDER BY revenue_u DESC, l_orderkey LIMIT 10"
    ),
    "tpch_q6_forecast": (
        "SELECT CAST(sum(CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) "
        "  * CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_u, "
        "count(*) AS n_items FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"
    ),
}
