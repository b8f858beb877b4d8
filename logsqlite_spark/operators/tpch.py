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

from pyspark.sql import DataFrame, SparkSession, Window
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
        .join(cust, ords.o_custkey == cust.c_custkey)
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
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(customer.select("c_custkey", "c_nationkey"),
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
    joined = li.join(part.select("p_partkey", "p_type"),
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
        .join(customer.select("c_custkey", "c_name"),
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
    and customer are pre-filtered to the two nations (a sliver); the
    join strategy is AQE-decided — a forced broadcast would be wrong
    at SF100+ where even the sliver is tens of millions of rows.
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
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
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
        li.join(pts, li.l_partkey == pts.p_partkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
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

def order_priority_check(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Q4 shape: per-priority count of orders with a late-shipped item.

    The EXISTS subquery becomes a LEFT SEMI join keyed on the order key
    with the lateness predicate evaluated inside the join, so each
    order matches at most once (no fan-out) and the probe side is the
    one-quarter orders slice. At 100 TB the semi join shuffles both
    sides on the order key once; AQE broadcasts the quarter slice when
    it fits. Date arithmetic is whole-day on UTC timestamps — exact in
    both engines.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    late = lineitem.select("l_orderkey", "l_shipdate")
    sj = ords.join(
        late,
        (ords["o_orderkey"] == late["l_orderkey"])
        & (late["l_shipdate"] > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    return sj.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count"))


def returnflag_priority_split(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Q12 shape: big-big join feeding a conditional (CASE WHEN) agg.

    lineitem is pre-filtered to one ship year before the join (filter
    below the shuffle), and the priority flag folds to 0/1 integers so
    the two counts are exact in any accumulation order. q12 proper
    groups by ship mode; the synthetic schema lacks it, so returnflag
    stands in — the aggregation shape is identical.
    """
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        li.join(orders.select("o_orderkey", "o_orderpriority"),
                li["l_orderkey"] == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).cast("long").alias("high_line_count"),
            F.sum(F.lit(1) - high).cast("long").alias("low_line_count"),
        )
    )


def customer_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Q13 shape: LEFT OUTER join + two-level aggregation (distribution).

    Customers with zero qualifying orders must appear (c_count = 0), so
    the outer join is load-bearing — count(o_orderkey) skips NULLs.
    Both aggregations are map-side combinable; the second groupBy keys
    on c_count whose cardinality is tiny, and AQE coalesces its
    shuffle. All outputs are exact integers.
    """
    ords = orders.filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        customer.select("c_custkey")
        .join(ords, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist"))


def part_supplier_variety(part: DataFrame, lineitem: DataFrame,
                          supplier: DataFrame) -> DataFrame:
    """Q16 shape: anti-join blacklist + count-distinct per part group.

    Suppliers on the blacklist (negative balance standing in for q16's
    complaints predicate) are removed with a LEFT ANTI broadcast join
    before the fact-dimension join; the part dimension also broadcasts.
    countDistinct is exact — Spark expands it to a two-phase
    distinct-then-count aggregation that partial-aggregates map-side.
    """
    pp = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size") <= 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"),
              "left_anti")
    )
    return (
        li.join(pp, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .select("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"),
                "supplier_cnt")
    )


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame,
                           brand: str = "Brand#3") -> DataFrame:
    """Q17 shape: correlated per-part average re-joined as a threshold.

    The correlated subquery ``l_quantity < 0.2 * avg(l_quantity)``
    becomes a per-part aggregate joined back to the fact rows. The
    threshold is evaluated in exact integer space — ``qty < sum/(5n)``
    cross-multiplied to ``5*n*qty_c < sum_qty_c`` over quantized cents
    — so no float division can flip a boundary row between engines.
    The brand slice of part joins AQE-decided (broadcast when small);
    the fact side is scanned once
    per use (two passes) with the partkey filter pushed down both
    times, which at 100 TB beats shuffling the unfiltered fact table.
    """
    pp = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = (
        lineitem.join(pp, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", _cents("l_quantity").alias("qty_c"),
                _cents("l_extendedprice").alias("price_c"))
    )
    stats = li.groupBy("l_partkey").agg(
        F.sum("qty_c").alias("sum_qty_c"),
        F.count(F.lit(1)).alias("n_li"),
    )
    return (
        li.join(stats, "l_partkey")
        .filter(F.lit(5) * F.col("n_li") * F.col("qty_c") < F.col("sum_qty_c"))
        .agg(
            F.sum("price_c").cast("long").alias("revenue_c"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def sole_blame_suppliers(supplier: DataFrame, lineitem: DataFrame,
                         orders: DataFrame, k: int = 20) -> DataFrame:
    """Q21 shape: semi-join (EXISTS) + anti-join (NOT EXISTS) stacked.

    Suppliers whose returned item is the *only* return in a
    multi-supplier finalized order: EXISTS another supplier's line in
    the order (LEFT SEMI with a non-equi guard), NOT EXISTS another
    supplier's *returned* line (LEFT ANTI, same key). The synthetic
    schema lacks commit/receipt dates, so l_returnflag = 'R' stands in
    for q21's late-delivery predicate — the double-correlated join
    shape is preserved exactly. All three lineitem scans prune to two
    columns; the final supplier join broadcasts.
    """
    ords = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = lineitem.select(F.col("l_orderkey").alias("o2"),
                         F.col("l_suppkey").alias("s2"))
    l3 = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    )
    cand = l1.join(
        l2, (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi")
    sole = cand.join(
        l3, (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti")
    return (
        sole.join(supplier.select("s_suppkey", "s_name"),
                  F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey"))
        .limit(k)
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name",
                "numwait")
    )


def dormant_rich_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Q22 shape: scalar-subquery threshold + NOT EXISTS anti-join.

    Customers in a nation slice whose balance exceeds the slice's
    positive-balance average and who have placed no order since 2000
    (every synthetic customer has *some* order, so q22's "no orders"
    becomes dormancy — same anti-join shape). The global
    average is a one-row aggregate cross-joined (broadcast) onto the
    slice; the comparison cross-multiplies to exact integers
    (``bal_c * n_pos > sum_pos_c``) so the scalar-subquery boundary is
    deterministic. The anti-join against orders shuffles on custkey —
    unavoidable and linear. q22 slices by phone prefix; the synthetic
    schema lacks phones, so nationkey stands in.
    """
    seg = customer.filter(F.col("c_nationkey") <= 6).select(
        "c_custkey", "c_nationkey", _cents("c_acctbal").alias("bal_c"))
    pos = seg.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("sum_pos_c"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    rich = seg.crossJoin(F.broadcast(pos)).filter(
        F.col("bal_c") * F.col("n_pos") > F.col("sum_pos_c"))
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    dormant = rich.join(recent,
                        F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("numcust"),
        F.sum("bal_c").cast("long").alias("totacctbal_c"),
    ).select(F.col("c_nationkey").cast("int").alias("c_nationkey"),
             "numcust", "totacctbal_c")


def top_supplier_by_revenue(supplier: DataFrame,
                            lineitem: DataFrame) -> DataFrame:
    """Q15 shape: revenue view + scalar MAX subquery + equality join.

    Per-supplier quarterly revenue (map-side-combinable agg), then the
    suppliers whose revenue equals the global max. The max is a
    one-row aggregate broadcast back — revenue is an exact integer so
    the equality is deterministic (the real q15's double equality is a
    correctness trap this formulation avoids).
    """
    rev = (F.col("price_c") * (F.lit(10000) - F.col("disc_c") * 100)).cast("bigint")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_suppkey", _cents("l_extendedprice").alias("price_c"),
             _cents("l_discount").alias("disc_c"))
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(rev).alias("total_revenue_u"))
    best = per_supp.agg(F.max("total_revenue_u").alias("max_rev"))
    return (
        per_supp.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue_u") == F.col("max_rev"))
        .join(supplier.select("s_suppkey", "s_name"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name",
                F.col("total_revenue_u").cast("long").alias("total_revenue_u"))
    )


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Q19 shape: OR-of-ANDs predicate spanning both join sides.

    Catalyst splits the disjunction: the part-only conjuncts stay on
    the dim scan (join strategy AQE-decided), the lineitem-only bounds (the overall
    quantity envelope 1..30) are derived and pushed to the fact scan,
    and the cross-side residual evaluates inside the join — so the
    scan never reads rows no branch could accept. The revenue sum is
    exact integer units.
    """
    li = lineitem.select("l_partkey", "l_quantity",
                         _cents("l_extendedprice").alias("price_c"),
                         _cents("l_discount").alias("disc_c"))
    pp = part.select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 20)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#4") & (F.col("p_size") <= 30)
           & (q >= 20) & (q <= 30))
    )
    rev = (F.col("price_c") * (F.lit(10000) - F.col("disc_c") * 100)).cast("bigint")
    return (
        li.join(pp, F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(F.sum(rev).cast("long").alias("revenue_u"),
             F.count(F.lit(1)).cast("long").alias("n_items"))
    )


def nation_year_profit(lineitem: DataFrame, part: DataFrame,
                       supplier: DataFrame, orders: DataFrame,
                       nation: DataFrame,
                       p_type: str = "STANDARD") -> DataFrame:
    """Q9 shape: profit-proxy by (supplier nation, order year) — a
    full-history 5-way join with NO date filter: the fact table's
    entire range flows through, which is the shape that stresses the
    shuffle planner rather than pushdown. The only big-big join is
    lineitem⋈orders on the order key; nation broadcasts, and the
    filtered part / supplier sides are AQE-decided. (The real q9 weighs in partsupp's supplycost —
    absent from the synthetic schema — so revenue stands in for
    amount; the join/agg skeleton is q9's.)
    """
    rev = (F.col("price_c") * (F.lit(10000) - F.col("disc_c") * 100)).cast("bigint")
    pp = part.filter(F.col("p_type") == p_type).select("p_partkey")
    li = lineitem.select("l_orderkey", "l_partkey", "l_suppkey",
                         _cents("l_extendedprice").alias("price_c"),
                         _cents("l_discount").alias("disc_c"))
    sup = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    return (
        li.join(pp, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name",
                 F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.sum(rev).cast("long").alias("profit_u"),
             F.count(F.lit(1)).cast("long").alias("n_items"))
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

def _q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return order_priority_check(table(spark, sf_dir, "orders"),
                                table(spark, sf_dir, "lineitem"))

def _q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return returnflag_priority_split(table(spark, sf_dir, "orders"),
                                     table(spark, sf_dir, "lineitem"))

def _q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    return customer_order_distribution(table(spark, sf_dir, "customer"),
                                       table(spark, sf_dir, "orders"))

def _q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    return part_supplier_variety(table(spark, sf_dir, "part"),
                                 table(spark, sf_dir, "lineitem"),
                                 table(spark, sf_dir, "supplier"))

def _q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    return small_quantity_revenue(table(spark, sf_dir, "lineitem"),
                                  table(spark, sf_dir, "part"))

def _q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sole_blame_suppliers(table(spark, sf_dir, "supplier"),
                                table(spark, sf_dir, "lineitem"),
                                table(spark, sf_dir, "orders"))

def _q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dormant_rich_customers(table(spark, sf_dir, "customer"),
                                  table(spark, sf_dir, "orders"))

def _q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_supplier_by_revenue(table(spark, sf_dir, "supplier"),
                                   table(spark, sf_dir, "lineitem"))

def _q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    return disjunctive_revenue(table(spark, sf_dir, "lineitem"),
                               table(spark, sf_dir, "part"))

def _q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nation_year_profit(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part"),
        table(spark, sf_dir, "supplier"), table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "nation"))

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
    "tpch_q4_priority_check": _q_tpch_q4,
    "tpch_q12_priority_split": _q_tpch_q12,
    "tpch_q13_order_distribution": _q_tpch_q13,
    "tpch_q16_part_variety": _q_tpch_q16,
    "tpch_q17_small_qty": _q_tpch_q17,
    "tpch_q21_sole_blame": _q_tpch_q21,
    "tpch_q22_dormant_rich": _q_tpch_q22,
    "tpch_q15_top_supplier": _q_tpch_q15,
    "tpch_q19_disjunctive": _q_tpch_q19,
    "tpch_q9_nation_profit": _q_tpch_q9,
}

_CENTS_SQL = "CAST(floor(CAST({c} AS DOUBLE) * 100 + 0.5) AS BIGINT)"
_REV_SQL = (
    f"{_CENTS_SQL.format(c='l_extendedprice')} "
    f"* (10000 - {_CENTS_SQL.format(c='l_discount')} * 100)"
)

ORACLES = {
    "tpch_q1_pricing": (
        "SELECT l_returnflag, l_linestatus, count(*) AS count_order, "
        "CAST(sum(CAST(floor(CAST(l_quantity AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c, "
        "CAST(sum(CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_c, "
        "CAST(sum(CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_discount_c "
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
        "CAST(sum(CAST(floor(CAST(l_quantity AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c "
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
    "tpch_q4_priority_check": (
        "SELECT o_orderpriority, count(*) AS order_count FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00' "
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
        "            AND l_shipdate > o_orderdate + INTERVAL 60 DAY) "
        "GROUP BY o_orderpriority"
    ),
    "tpch_q12_priority_split": (
        "SELECT l_returnflag, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "GROUP BY l_returnflag"
    ),
    "tpch_q13_order_distribution": (
        "WITH per_cust AS (SELECT c_custkey, count(o_orderkey) AS c_count "
        "FROM customer LEFT OUTER JOIN orders "
        "ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED' "
        "GROUP BY c_custkey) "
        "SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY c_count"
    ),
    "tpch_q16_part_variety": (
        "SELECT p_brand, p_type, p_size, "
        "count(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size <= 25 "
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p_brand, p_type, p_size"
    ),
    "tpch_q17_small_qty": (
        "WITH li AS (SELECT l_partkey, "
        f"{_CENTS_SQL.format(c='l_quantity')} AS qty_c, "
        f"{_CENTS_SQL.format(c='l_extendedprice')} AS price_c "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE p_brand = 'Brand#3'), "
        "st AS (SELECT l_partkey, sum(qty_c) AS sum_qty_c, count(*) AS n_li "
        "FROM li GROUP BY l_partkey) "
        "SELECT CAST(sum(price_c) AS BIGINT) AS revenue_c, "
        "count(*) AS n_items "
        "FROM li JOIN st USING (l_partkey) "
        "WHERE 5 * n_li * qty_c < sum_qty_c"
    ),
    "tpch_q21_sole_blame": (
        "WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_returnflag = 'R' AND o_orderstatus = 'F') "
        "SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, "
        "count(*) AS numwait "
        "FROM l1 JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE EXISTS (SELECT 1 FROM lineitem l2 "
        "  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
        "  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey "
        "  AND l3.l_returnflag = 'R') "
        "GROUP BY s_suppkey, s_name "
        "ORDER BY numwait DESC, s_suppkey LIMIT 20"
    ),
    "tpch_q22_dormant_rich": (
        "WITH seg AS (SELECT c_custkey, c_nationkey, "
        f"{_CENTS_SQL.format(c='c_acctbal')} AS bal_c "
        "FROM customer WHERE c_nationkey <= 6), "
        "pos AS (SELECT sum(bal_c) AS sum_pos_c, count(*) AS n_pos "
        "FROM seg WHERE bal_c > 0) "
        "SELECT c_nationkey, count(*) AS numcust, "
        "CAST(sum(bal_c) AS BIGINT) AS totacctbal_c "
        "FROM seg, pos "
        "WHERE bal_c * n_pos > sum_pos_c "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00') "
        "GROUP BY c_nationkey"
    ),
    "tpch_q15_top_supplier": (
        "WITH rev AS (SELECT l_suppkey, "
        "CAST(sum(CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) "
        "  * (10000 - CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5) AS BIGINT) * 100)) AS BIGINT) "
        "  AS total_revenue_u "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' "
        "GROUP BY l_suppkey) "
        "SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_revenue_u "
        "FROM rev JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE total_revenue_u = (SELECT max(total_revenue_u) FROM rev)"
    ),
    "tpch_q19_disjunctive": (
        "SELECT CAST(sum(CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) "
        "  * (10000 - CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5) AS BIGINT) * 100)) AS BIGINT) "
        "  AS revenue_u, count(*) AS n_items "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE (p_brand = 'Brand#2' AND p_size <= 10 "
        "       AND l_quantity >= 1 AND l_quantity <= 11) "
        "   OR (p_brand = 'Brand#3' AND p_size <= 20 "
        "       AND l_quantity >= 10 AND l_quantity <= 20) "
        "   OR (p_brand = 'Brand#4' AND p_size <= 30 "
        "       AND l_quantity >= 20 AND l_quantity <= 30)"
    ),
    "tpch_q9_nation_profit": (
        "SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year, "
        "CAST(sum(CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) "
        "  * (10000 - CAST(floor(CAST(l_discount AS DOUBLE) * 100 + 0.5) AS BIGINT) * 100)) AS BIGINT) "
        "  AS profit_u, count(*) AS n_items "
        "FROM lineitem "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE p_type = 'STANDARD' "
        "GROUP BY n_name, year(o_orderdate)"
    ),
}


# ---------------------------------------------------------------------------
# round 5: the three shapes that were still missing from the engine-
# health family — q2 (correlated min per group), q11 (HAVING vs a
# scalar subquery), q20 (nested semi-joins over two agg grains). The
# synthetic schema has no partsupp, so s_acctbal stands in for
# ps_supplycost (q2) and shipped quantities for availqty (q11/q20) —
# same device nation_year_profit documents for q9.


def min_cost_supplier(part: DataFrame, supplier: DataFrame,
                      lineitem: DataFrame, nation: DataFrame,
                      region: DataFrame, r_name: str = "ASIA",
                      size_max: int = 15, k: int = 100) -> DataFrame:
    """Q2 shape: per part (bounded size, one region), the supplier
    with the minimum cost proxy. The correlated scalar subquery
    (min per part) compiles to ONE per-part window rank over the
    bridge join — no second scan, no self-join; the part⋈supplier
    bridge is the distinct (l_partkey, l_suppkey) pairs actually
    shipped (q16's device). Region dims broadcast; ties break on
    s_suppkey; the final top-k orders on the unique (bal_c,
    p_partkey) pair so the limit is deterministic."""
    sup = (
        supplier
        .join(F.broadcast(nation.select("n_nationkey", "n_name",
                                        "n_regionkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == r_name)
                          .select("r_regionkey")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name",
                _cents("s_acctbal").alias("bal_c"))
    )
    bridge = lineitem.select("l_partkey", "l_suppkey").distinct()
    cand = (
        bridge
        .join(part.filter(F.col("p_size") <= size_max)
              .select("p_partkey"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey").orderBy("bal_c", "s_suppkey")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .orderBy("bal_c", "p_partkey").limit(k)
        .select(F.col("p_partkey").cast("long"),
                F.col("s_suppkey").cast("long"),
                "s_name", "n_name", F.col("bal_c").cast("long"))
    )


def important_stock(lineitem: DataFrame, supplier: DataFrame,
                    nation: DataFrame, n_name: str = "NATION_1",
                    frac_per_mille: int = 1) -> DataFrame:
    """Q11 shape: per-part shipped value for one nation's suppliers,
    keeping parts whose value exceeds ``frac_per_mille``/1000 of the
    grand total. The scalar subquery in HAVING compiles to a one-row
    broadcast cross join, and the threshold compares in exact integer
    space (value_u * 1000 > total) — no FP fraction."""
    sup = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == n_name)
                    .select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    val = (_cents("l_quantity") * _cents("l_extendedprice")).cast("bigint")
    per = (
        lineitem.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", val.alias("v"))
        .groupBy("l_partkey")
        .agg(F.sum("v").cast("long").alias("value_u"))
    )
    total = per.agg(F.sum("value_u").cast("long").alias("t"))
    # exact rational threshold: value_u/t > frac/1000 as pure integers
    return (
        per.crossJoin(F.broadcast(total))
        .filter(F.col("value_u") * F.lit(1000)
                > F.col("t") * F.lit(frac_per_mille))
        .select(F.col("l_partkey").cast("long"),
                F.col("value_u").cast("long"))
    )


def excess_shippers(part: DataFrame, supplier: DataFrame,
                    lineitem: DataFrame, nation: DataFrame,
                    p_prefix: str = "red ",
                    share_den: int = 8) -> DataFrame:
    """Q20 shape: suppliers holding an outsized share (> 1/share_den)
    of some promo-part's total shipped quantity — nested semi-joins
    over two aggregation grains. Both grains come from one scan: the
    (part, supplier) rollup feeds the per-part rollup (partial-agg
    reuse), the share test compares share_den*ps_qty > tot_qty in
    exact integers, and the supplier list is a LEFT SEMI join (the
    EXISTS of the original), so supplier rows are never duplicated.
    (Original q20 uses 1/2 of availqty; with ~25 suppliers per part
    in the synthetic bridge that set is empty, so the default share
    is 1/8 — same plan skeleton, non-vacuous result.)"""
    pp = part.filter(F.col("p_name").startswith(p_prefix)) \
        .select("p_partkey")
    li = (
        lineitem.join(pp, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey",
                _cents("l_quantity").alias("qty_c"))
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty_c").cast("long").alias("ps_qty"))
    per_p = per_ps.groupBy("l_partkey").agg(
        F.sum("ps_qty").cast("long").alias("tot_qty"))
    hot = (
        per_ps.join(per_p, "l_partkey")
        .filter(F.col("ps_qty") * share_den > F.col("tot_qty"))
        .select("l_suppkey").distinct()
    )
    return (
        supplier.join(hot, F.col("s_suppkey") == F.col("l_suppkey"),
                      "left_semi")
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_suppkey").cast("long"), "s_name", "n_name")
    )


def _q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return min_cost_supplier(
        table(spark, sf_dir, "part"), table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "nation"),
        table(spark, sf_dir, "region"))


def _q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return important_stock(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "nation"))


def _q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return excess_shippers(
        table(spark, sf_dir, "part"), table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "nation"))


QUERIES["tpch_q2_min_cost_supplier"] = _q_tpch_q2
QUERIES["tpch_q11_important_stock"] = _q_tpch_q11
QUERIES["tpch_q20_excess_shippers"] = _q_tpch_q20

_BAL_SQL = _CENTS_SQL.format(c="s_acctbal")
_QTY_SQL = _CENTS_SQL.format(c="l_quantity")
_PRICE_SQL = _CENTS_SQL.format(c="l_extendedprice")

ORACLES["tpch_q2_min_cost_supplier"] = (
    "WITH sup AS (SELECT s_suppkey, s_name, n_name, "
    f"  {_BAL_SQL} AS bal_c "
    "  FROM supplier JOIN nation ON s_nationkey = n_nationkey "
    "  JOIN region ON n_regionkey = r_regionkey "
    "  WHERE r_name = 'ASIA'), "
    "bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem), "
    "cand AS (SELECT p_partkey, s_suppkey, s_name, n_name, bal_c "
    "  FROM bridge JOIN part ON l_partkey = p_partkey AND p_size <= 15 "
    "  JOIN sup ON l_suppkey = s_suppkey), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY p_partkey "
    "  ORDER BY bal_c, s_suppkey) AS rk FROM cand) "
    "SELECT CAST(p_partkey AS BIGINT) AS p_partkey, "
    "CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name, "
    "CAST(bal_c AS BIGINT) AS bal_c "
    "FROM r WHERE rk = 1 ORDER BY bal_c, p_partkey LIMIT 100"
)

ORACLES["tpch_q11_important_stock"] = (
    "WITH sup AS (SELECT s_suppkey FROM supplier "
    "  JOIN nation ON s_nationkey = n_nationkey "
    "  WHERE n_name = 'NATION_1'), "
    "per AS (SELECT l_partkey, "
    f"  CAST(sum({_QTY_SQL} * {_PRICE_SQL}) AS BIGINT) AS value_u "
    "  FROM lineitem JOIN sup ON l_suppkey = s_suppkey "
    "  GROUP BY l_partkey) "
    "SELECT CAST(l_partkey AS BIGINT) AS l_partkey, "
    "CAST(value_u AS BIGINT) AS value_u FROM per "
    "WHERE value_u * 1000 > (SELECT sum(value_u) FROM per)"
)

ORACLES["tpch_q20_excess_shippers"] = (
    "WITH li AS (SELECT l_partkey, l_suppkey, "
    f"  {_QTY_SQL} AS qty_c "
    "  FROM lineitem JOIN part ON l_partkey = p_partkey "
    "  WHERE p_name LIKE 'red %'), "
    "per_ps AS (SELECT l_partkey, l_suppkey, "
    "  CAST(sum(qty_c) AS BIGINT) AS ps_qty FROM li "
    "  GROUP BY l_partkey, l_suppkey), "
    "per_p AS (SELECT l_partkey, CAST(sum(ps_qty) AS BIGINT) AS tot_qty "
    "  FROM per_ps GROUP BY l_partkey), "
    "hot AS (SELECT DISTINCT l_suppkey FROM per_ps "
    "  JOIN per_p USING (l_partkey) WHERE ps_qty * 8 > tot_qty) "
    "SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, n_name "
    "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
    "WHERE s_suppkey IN (SELECT l_suppkey FROM hot)"
)
