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

def local_supplier_volume(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, supplier: DataFrame,
                          nation: DataFrame, region: DataFrame,
                          region_name: str = "AMERICA") -> DataFrame:
    """Q5 shape: revenue by nation where customer and supplier share a
    nation, one region, one year.

    Scale shape: the only big-big join is lineitem⋈orders on orderkey
    (shuffle, AQE-replanned); supplier/nation/region and the filtered
    customer projection broadcast. The c_nationkey = s_nationkey
    equi-condition rides the customer join, not a separate shuffle.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    nat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    sup = supplier.join(F.broadcast(nat),
                        F.col("s_nationkey") == F.col("n_nationkey")) \
                  .select("s_suppkey", "s_nationkey", "n_name")
    rev = (F.col("price_c") * (F.lit(10000) - F.col("disc_c") * 100)).cast("bigint")
    li = lineitem.select("l_orderkey", "l_suppkey",
                         _cents("l_extendedprice").alias("price_c"),
                         _cents("l_discount").alias("disc_c"))
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("long").alias("revenue_u"))
        .select("n_name", "revenue_u")
    )

def promo_revenue_share(lineitem: DataFrame, part: DataFrame,
                        ym: str = "1996-03") -> DataFrame:
    """Q14 shape: promo revenue fraction for one month — conditional
    aggregation over a fact⋈dim join (part broadcasts).

    The ratio is ONE double division of two exact integer sums, so it
    is bit-identical across engines; rounded to 6 places regardless.
    """
    rev = (F.col("price_c") * (F.lit(10000) - F.col("disc_c") * 100)).cast("bigint")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(f"{ym}-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.add_months(F.lit(f"{ym}-01").cast("timestamp"), 1))
    ).select("l_partkey", _cents("l_extendedprice").alias("price_c"),
             _cents("l_discount").alias("disc_c"))
    joined = li.join(F.broadcast(part.select("p_partkey", "p_type")),
                     li.l_partkey == F.col("p_partkey"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return joined.agg(
        F.sum(promo).cast("long").alias("promo_revenue_u"),
        F.sum(rev).cast("long").alias("total_revenue_u"),
        F.round(F.sum(promo).cast("double") * 100.0
                / F.sum(rev).cast("double"), 6).alias("promo_pct"),
    )

def large_quantity_orders(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, min_qty: int = 200,
                          k: int = 20) -> DataFrame:
    """Q18 shape: largest-volume orders — self-aggregation of the fact
    table, HAVING filter, then joins + top-k.

    Scale shape: the groupBy(l_orderkey) is map-side combinable; the
    HAVING filter shrinks the fact side to a sliver BEFORE the orders
    join; top-k is TakeOrderedAndProject, never a full sort.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).alias("sum_qty_c"))
        .filter(F.col("sum_qty_c") > min_qty * 100)
    )
    joined = (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        joined.orderBy(F.col("sum_qty_c").desc(), F.col("l_orderkey"))
        .limit(k)
        .select(F.col("c_name"), F.col("l_orderkey").cast("long"),
                _cents("o_totalprice").alias("o_totalprice_c"),
                F.col("sum_qty_c").cast("long"))
    )

def nation_trade_volume(supplier: DataFrame, lineitem: DataFrame,
                        orders: DataFrame, customer: DataFrame,
                        nation: DataFrame,
                        nation_a: str = "NATION_1",
                        nation_b: str = "NATION_2") -> DataFrame:
    """Q7 shape: bilateral shipping volume between two nations by year.

    Scale shape: lineitem⋈orders is the one big-big shuffle; supplier
    and customer are pre-filtered to the two nations (a sliver) and
    broadcast, so the nation-pair predicate never rides the shuffle.
    """
    nat = nation.filter(F.col("n_name").isin(nation_a, nation_b)) \
                .select("n_nationkey", "n_name")
    sup = supplier.join(F.broadcast(nat),
                        F.col("s_nationkey") == F.col("n_nationkey")) \
                  .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(F.broadcast(nat),
                         F.col("c_nationkey") == F.col("n_nationkey")) \
                   .select("c_custkey", F.col("n_name").alias("cust_nation"))
    rev = (F.col("price_c") * (F.lit(10000) - F.col("disc_c") * 100)).cast("bigint")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey",
             F.year("l_shipdate").cast("int").alias("l_year"),
             _cents("l_extendedprice").alias("price_c"),
             _cents("l_discount").alias("disc_c"))
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(rev).cast("long").alias("revenue_u"))
    )

def market_share(part: DataFrame, supplier: DataFrame, lineitem: DataFrame,
                 orders: DataFrame, customer: DataFrame, nation: DataFrame,
                 region: DataFrame, target_nation: str = "NATION_1",
                 region_name: str = "ASIA",
                 p_type: str = "ECONOMY") -> DataFrame:
    """Q8 shape: a nation's share of regional revenue for one part
    type, by year — the double-role nation join (customer's nation
    scopes the region; supplier's nation is the share numerator).

    The share is ONE double division of two exact integer sums per
    year, so it is bit-identical across engines; rounded to 6 anyway.
    """
    pts = part.filter(F.col("p_type") == p_type).select("p_partkey")
    rnat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey")).select("n_nationkey")
    cust = customer.join(F.broadcast(rnat),
                         F.col("c_nationkey") == F.col("n_nationkey")) \
                   .select("c_custkey")
    sup = supplier.join(
        F.broadcast(nation.select("n_nationkey",
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey")).select(
            "s_suppkey", "supp_nation")
    rev = (F.col("price_c") * (F.lit(10000) - F.col("disc_c") * 100)).cast("bigint")
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey",
             F.year("o_orderdate").cast("int").alias("o_year"))
    li = lineitem.select("l_orderkey", "l_partkey", "l_suppkey",
                         _cents("l_extendedprice").alias("price_c"),
                         _cents("l_discount").alias("disc_c"))
    nation_rev = F.when(F.col("supp_nation") == target_nation, rev) \
                  .otherwise(F.lit(0))
    return (
        li.join(F.broadcast(pts), li.l_partkey == pts.p_partkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("o_year")
        .agg(F.sum(nation_rev).cast("long").alias("nation_revenue_u"),
             F.sum(rev).cast("long").alias("total_revenue_u"))
        .select(
            "o_year", "nation_revenue_u", "total_revenue_u",
            F.round(F.col("nation_revenue_u").cast("double")
                    / F.col("total_revenue_u").cast("double"), 6)
            .alias("mkt_share"),
        )
    )

def returned_item_losses(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame, nation: DataFrame,
                         quarter_start: str = "1996-01-01",
                         k: int = 20) -> DataFrame:
    """Q10 shape: customers who returned the most revenue in a
    quarter — fact⋈fact shuffle join, then dim joins, then top-k.

    The HAVING-free groupBy(custkey) is map-side combinable; top-k is
    TakeOrderedAndProject (never a full sort); nation broadcasts.
    """
    rev = (F.col("price_c") * (F.lit(10000) - F.col("disc_c") * 100)).cast("bigint")
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(quarter_start).cast("timestamp"))
        & (F.col("o_orderdate") < F.add_months(
            F.lit(quarter_start).cast("timestamp"), 3))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", _cents("l_extendedprice").alias("price_c"),
        _cents("l_discount").alias("disc_c"))
    per_cust = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(rev).alias("revenue_u"))
    )
    return (
        per_cust.join(customer.select("c_custkey", "c_name", "c_acctbal",
                                      "c_nationkey"),
                      F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .orderBy(F.col("revenue_u").desc(), F.col("c_custkey"))
        .limit(k)
        .select(F.col("c_custkey").cast("long"), "c_name",
                F.col("revenue_u").cast("long"),
                _cents("c_acctbal").alias("acctbal_c"), "n_name")
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

def _q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return local_supplier_volume(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "nation"), table(spark, sf_dir, "region"))

def _q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    return promo_revenue_share(table(spark, sf_dir, "lineitem"),
                               table(spark, sf_dir, "part"))

def _q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    return large_quantity_orders(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"))

def _q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nation_trade_volume(
        table(spark, sf_dir, "supplier"), table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "nation"))

def _q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    return market_share(
        table(spark, sf_dir, "part"), table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "nation"),
        table(spark, sf_dir, "region"))

def _q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return returned_item_losses(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "nation"))

QUERIES = {
    "tpch_q1_pricing": _q_tpch_q1,
    "tpch_q3_top_orders": _q_tpch_q3,
    "tpch_q6_forecast": _q_tpch_q6,
    "tpch_q5_local_volume": _q_tpch_q5,
    "tpch_q14_promo": _q_tpch_q14,
    "tpch_q18_large_orders": _q_tpch_q18,
    "tpch_q7_nation_trade": _q_tpch_q7,
    "tpch_q8_market_share": _q_tpch_q8,
    "tpch_q10_returned_items": _q_tpch_q10,
}

_CENTS_SQL = "CAST(floor(CAST({c} AS DOUBLE) * 100 + 0.5) AS BIGINT)"
_REV_SQL = (
    f"{_CENTS_SQL.format(c='l_extendedprice')} "
    f"* (10000 - {_CENTS_SQL.format(c='l_discount')} * 100)"
)

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
    "tpch_q5_local_volume": (
        "SELECT n_name, CAST(sum("
        "CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) "
        "  * (10000 - CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5) AS BIGINT) * 100)"
        ") AS BIGINT) AS revenue_u "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'AMERICA' "
        "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
        "GROUP BY n_name"
    ),
    "tpch_q14_promo": (
        "WITH li AS (SELECT "
        "CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) "
        "  * (10000 - CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5) AS BIGINT) * 100) AS rev, "
        "p_type FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00') "
        "SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) "
        "  AS promo_revenue_u, "
        "CAST(sum(rev) AS BIGINT) AS total_revenue_u, "
        "round(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS DOUBLE) "
        "  * 100.0 / CAST(sum(rev) AS DOUBLE), 6) AS promo_pct "
        "FROM li"
    ),
    "tpch_q18_large_orders": (
        "WITH big AS (SELECT l_orderkey, "
        "sum(CAST(floor(CAST(l_quantity AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS sum_qty_c "
        "FROM lineitem GROUP BY l_orderkey HAVING sum_qty_c > 20000) "
        "SELECT c_name, l_orderkey, "
        "CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5) AS BIGINT) AS o_totalprice_c, "
        "sum_qty_c FROM big "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "ORDER BY sum_qty_c DESC, l_orderkey LIMIT 20"
    ),
    "tpch_q7_nation_trade": (
        "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
        "CAST(year(l_shipdate) AS INT) AS l_year, "
        f"CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_u "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation sn ON s_nationkey = sn.n_nationkey "
        "JOIN nation cn ON c_nationkey = cn.n_nationkey "
        "WHERE sn.n_name IN ('NATION_1', 'NATION_2') "
        "AND cn.n_name IN ('NATION_1', 'NATION_2') "
        "AND sn.n_name <> cn.n_name "
        "AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
        "GROUP BY sn.n_name, cn.n_name, year(l_shipdate)"
    ),
    "tpch_q8_market_share": (
        "WITH li AS (SELECT CAST(year(o_orderdate) AS INT) AS o_year, "
        f"{_REV_SQL} AS rev, sn.n_name AS supp_nation "
        "FROM lineitem "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation sn ON s_nationkey = sn.n_nationkey "
        "JOIN nation cn ON c_nationkey = cn.n_nationkey "
        "JOIN region ON cn.n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' AND p_type = 'ECONOMY' "
        "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') "
        "SELECT o_year, "
        "CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev ELSE 0 END) "
        "  AS BIGINT) AS nation_revenue_u, "
        "CAST(sum(rev) AS BIGINT) AS total_revenue_u, "
        "round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev ELSE 0 END) "
        "  AS DOUBLE) / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share "
        "FROM li GROUP BY o_year"
    ),
    "tpch_q10_returned_items": (
        "WITH per_cust AS (SELECT o_custkey, "
        f"CAST(sum({_REV_SQL}) AS BIGINT) AS revenue_u "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_returnflag = 'R' "
        "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' "
        "GROUP BY o_custkey) "
        "SELECT c_custkey, c_name, revenue_u, "
        f"{_CENTS_SQL.format(c='c_acctbal')} AS acctbal_c, n_name "
        "FROM per_cust "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "ORDER BY revenue_u DESC, c_custkey LIMIT 20"
    ),
}
