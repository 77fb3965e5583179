"""Relational closure over the star schema (SURVEY.md §2.6/§2.7, §7.2-7).

The reference performs zero joins (single-table pipeline), but the
engine must provide the standard relational surface to be a usable
query engine over the driver's TPC-H-shaped tables: multi-way joins,
keyed aggregations, window functions, top-k, rollup/pivot, set ops,
semi/anti joins, and an as-of join (the one operator Spark lacks as a
primitive).

Scale/plan notes (verified via ``.explain("formatted")`` in tests):

- Dimension joins (region/nation/customer/supplier) are broadcast —
  explicitly hinted so the plan is stable even without fresh stats.
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; AQE
  coalesces partitions and splits skew at runtime.
- Aggregations are expressed as single ``groupBy().agg()`` so partial
  (map-side) aggregation applies before the shuffle.
- Top-k uses ``orderBy().limit(k)``: Spark plans TakeOrderedAndProject
  — a per-partition heap + driver merge, no global sort materialized.
- Float outputs are rounded via ``F.round`` at the output boundary to
  make results reproducible across summation orders (documented
  determinism contract; matches the DuckDB oracle's ROUND).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from etl_gcp_spark.smalldf import small_df

def _revenue() -> F.Column:
    # built lazily: Column construction needs a live SparkContext,
    # and this module must be importable before any session exists
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def _exact_avg(col: str, scale: int = 4) -> F.Column:
    """Order-independent rounded mean: exact decimal sum ÷ count,
    rounded in decimal space (HALF_UP), then cast to double.

    ``round(avg(double))`` is a latent nondeterminism: partial-agg
    summation order varies by partitioning, and with low-precision
    inputs (money columns are 2 dp) group means frequently land
    EXACTLY on a rounding boundary, where Spark's string-repr round
    and an exact-decimal round differ by 1 ulp. Decimal end-to-end
    removes both effects (same fix as hourly_event_stats; observed
    there at sf0.1).
    """
    return F.round(
        F.sum(F.col(col).cast("decimal(28,8)")) / F.count(F.col(col)),
        scale,
    ).cast("double")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-style pricing summary: group-by returnflag/linestatus
    with 8 aggregates in one pass (single shuffle, map-side partials)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(_revenue()), 4).alias("sum_disc_price"),
            F.round(
                F.sum(_revenue() * (F.lit(1.0) + F.col("l_tax"))), 4
            ).alias("sum_charge"),
            _exact_avg("l_quantity").alias("avg_qty"),
            _exact_avg("l_extendedprice").alias("avg_price"),
            _exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-style: top-k open orders by discounted revenue.

    customer is a broadcast dimension; orders ⋈ lineitem shuffles on
    the order key. Ordering ties broken by l_orderkey so the top-k set
    is deterministic.
    """
    cut = F.lit(cutoff).cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cut)
        .join(
            orders.filter(F.col("o_orderdate") < cut),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == segment)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(k)
    )


def regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    *,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5-style: revenue per nation where supplier and customer
    share the nation, one region, one order-date year.

    All four dimension tables are broadcast; the only shuffles are the
    two fact joins and the final small aggregation.
    """
    nations_in_region = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    return (
        lineitem.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(customer),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(nations_in_region),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
    )


def top_customers(customer: DataFrame, orders: DataFrame, k: int = 10) -> DataFrame:
    """Top-k customers by total order value (agg → broadcast-joined
    name lookup → TakeOrderedAndProject)."""
    totals = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 4).alias("total_spend"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        totals.join(
            F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .select("c_custkey", "c_name", "total_spend", "n_orders")
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
        .limit(k)
    )


def customer_order_ranks(orders: DataFrame, top_n: int = 3) -> DataFrame:
    """Window-function showcase: per-customer order ranking by value.

    One shuffle on o_custkey; rank ties broken by o_orderkey for
    determinism.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("order_rank", F.row_number().over(w))
        .filter(F.col("order_rank") <= top_n)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            "order_rank",
        )
    )


def order_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP over (status, priority): subtotal + grand-total rows in
    one pass (Expand + single aggregate, no self-unions)."""
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_value"),
    )


def priority_pivot(orders: DataFrame) -> DataFrame:
    """Pivot order counts: one row per status, one column per priority.

    Values are enumerated explicitly so the output schema is static
    (no extra distinct-scan; required for plan stability at scale).
    """
    priorities = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    aliases = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]
    return (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", priorities)
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderstatus",
            *[
                F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("long").alias(a)
                for p, a in zip(priorities, aliases)
            ],
        )
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti join: customers that never ordered (NOT EXISTS).

    left_anti against the orders key set; Catalyst/AQE pick broadcast
    when the distinct key set is small.
    """
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def active_positive_balance_customers(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """Set-op showcase: positive-balance custkeys ∩ custkeys with orders.

    INTERSECT compiles to a distinct + semi-join-shaped aggregate;
    equivalently a left_semi join — both one shuffle.
    """
    with_balance = customer.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("custkey")
    )
    with_orders = orders.select(F.col("o_custkey").alias("custkey"))
    return with_balance.intersect(with_orders)


def building_customers_no_orders(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """EXCEPT showcase: BUILDING-segment custkeys minus ordering custkeys."""
    seg = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    ordered = orders.select(F.col("o_custkey").alias("custkey"))
    return seg.exceptAll(ordered.dropDuplicates()).dropDuplicates()


def late_shipment_priority(
    orders: DataFrame, lineitem: DataFrame, *, late_days: int = 60
) -> DataFrame:
    """TPC-H Q4-style: order counts per priority for orders with at
    least one line shipped > ``late_days`` after the order date.

    left_semi join: the probe side streams, the existence check never
    duplicates order rows, and only (l_orderkey, l_shipdate) flow from
    lineitem — at 100 TB the semi join ships two columns, not the row.
    """
    late_lines = lineitem.select("l_orderkey", "l_shipdate")
    hit = orders.join(
        late_lines,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        ),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def revenue_forecast(
    lineitem: DataFrame,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.02,
    disc_hi: float = 0.06,
    qty_max: float = 24.0,
) -> DataFrame:
    """TPC-H Q6-style: pure filter + scalar aggregate, zero joins.

    The whole query is one scan with every predicate pushed to
    parquet (range filters on shipdate/discount/quantity) and a
    map-side partial sum — the cheapest possible shape.
    """
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < qty_max)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue")
        )
    )


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-style: top-k customers by lost revenue on returned
    items in a quarter. customer/nation broadcast; one fact shuffle."""
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 4).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )


def large_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    qty_threshold: float = 150.0,
) -> DataFrame:
    """TPC-H Q18-style: orders whose total line quantity exceeds the
    threshold, with customer attribution.

    The HAVING runs on the pre-join aggregate (group lineitem first,
    filter, THEN join) so only qualifying orderkeys reach the join —
    at scale this is the difference between joining 1% and 100% of
    the fact table.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .filter(F.col("total_qty") > qty_threshold)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            "total_qty",
        )
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1996-02-01",
) -> DataFrame:
    """TPC-H Q14-style: % of revenue from PROMO parts in a month.

    part is broadcast; numerator/denominator computed in ONE
    conditional aggregate pass (no second scan, no self-join).
    """
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def order_value_percentiles(orders: DataFrame) -> DataFrame:
    """Exact continuous percentiles of order value per order status.

    Uses ``F.percentile`` (exact, sort-based within group). At 100 TB
    exact percentiles of a skewed column are expensive by nature —
    swap in ``percentile_approx`` (t-digest sketch, map-side
    mergeable) when a bounded error is acceptable.
    """
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


PRICE_BANDS = [
    ("budget", 0.0, 100_000.0),
    ("mid", 100_000.0, 250_000.0),
    ("premium", 250_000.0, 400_000.0),
    ("luxury", 400_000.0, 600_000.0),
]


def price_band_totals(orders: DataFrame) -> DataFrame:
    """Range join: orders banded by [lo, hi) price intervals.

    The band table is a tiny broadcast dimension joined on a non-equi
    predicate — Spark plans BroadcastNestedLoopJoin, which is the
    right physical strategy for a 4-row build side (each probe row
    tests 4 intervals; no shuffle, no sort). With a large build side
    this would need a bucketed/binned equi-join rewrite instead.
    """
    spark = orders.sparkSession
    bands = small_df(
        spark, PRICE_BANDS, "band string, lo double, hi double"
    )
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("band_value"),
        )
    )


def customer_running_totals(orders: DataFrame) -> DataFrame:
    """Window frames: per-customer running spend + 3-order moving
    average, ordered by order date.

    Both frames share one partitioning (o_custkey) and ordering, so
    Spark evaluates them in a single Window stage over one shuffle.
    """
    order = [F.col("o_orderdate"), F.col("o_orderkey")]
    running = (
        Window.partitionBy("o_custkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    moving = (
        Window.partitionBy("o_custkey").orderBy(*order).rowsBetween(-2, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        F.round(F.sum("o_totalprice").over(running), 4).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(moving), 4).alias("moving_avg_3"),
    )


def order_gap_days(orders: DataFrame) -> DataFrame:
    """lag(): days since the same customer's previous order
    (NULL for the first). One shuffle on o_custkey."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate"), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).cast("long").alias("days_since_prev"),
    )


def status_priority_cube(orders: DataFrame) -> DataFrame:
    """CUBE over (status, priority): every grouping-set combination in
    one pass (Expand feeds a single hash aggregate)."""
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _exact_avg("o_totalprice").alias("avg_value"),
    )


def nation_trade_volume(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    *,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7-style bilateral trade volume: revenue shipped between a
    supplier nation and a customer nation (both directions), per
    ship-year.

    The nation dimension is joined twice under different aliases —
    both broadcast, so the only shuffles are the two fact joins.
    The pair filter is applied after both name lookups (Catalyst pushes
    the half that references a single side below the join).
    """
    n_supp = nation.select(
        F.col("n_nationkey").alias("supp_nk"),
        F.col("n_name").alias("supp_nation"),
    )
    n_cust = nation.select(
        F.col("n_nationkey").alias("cust_nk"),
        F.col("n_name").alias("cust_nation"),
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("supp_nk"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cust_nk"))
        .filter(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
    )


def market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    *,
    target_nation: str = "NATION_5",
    region_name: str = "ASIA",
    part_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q8-style market share: the target nation's share of
    revenue for one part type sold into one region, per order year.

    Conditional-sum ÷ total-sum in a single aggregate (one pass); all
    five dimensions broadcast.
    """
    nations_in_region = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("cust_nk"))
    supp_nations = nation.select(
        F.col("n_nationkey").alias("supp_nk"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = _revenue()
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == part_type)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nations_in_region),
            F.col("c_nationkey") == F.col("cust_nk"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nations), F.col("s_nationkey") == F.col("supp_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == target_nation, vol).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


def product_type_margin(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    *,
    part_type: str = "STANDARD",
    cost_factor: float = 0.1,
) -> DataFrame:
    """TPC-H Q9-style product profit by supplier nation and order year.

    The reference schema has no partsupp/supplycost, so unit cost is
    modeled as ``cost_factor * p_retailprice`` — the oracle encodes the
    identical formula, so the adaptation stays checkable.
    """
    margin = _revenue() - F.lit(cost_factor) * F.col("p_retailprice") * F.col(
        "l_quantity"
    )
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == part_type)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(margin), 4).alias("sum_profit"))
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame, *, exclude_priority: str = "4-NOT SPECIFIED"
) -> DataFrame:
    """TPC-H Q13-style customer distribution: histogram of customers by
    how many (qualifying) orders they placed, including zero.

    Left outer join so order-less customers land in the c_count=0
    bucket; two keyed aggregations (custkey, then count-of-counts) —
    the second one is tiny.
    """
    counted = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != exclude_priority),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counted.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def supplier_part_variety(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    *,
    exclude_brand: str = "Brand#3",
    exclude_type_prefix: str = "PROMO",
    sizes: tuple = (1, 9, 14, 19, 23, 36, 45, 49),
) -> DataFrame:
    """TPC-H Q16-style supplier variety: distinct suppliers observed per
    (brand, type, size), excluding one brand, one type prefix, and
    suppliers with negative balance (the "complaints" analogue).

    Lineitem stands in for partsupp as the part↔supplier bridge.
    The exclusion list is a broadcast left_anti join (NOT IN without a
    null-trap); countDistinct shuffles once on the group keys.
    """
    bad_suppliers = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != exclude_brand)
                    & (~F.col("p_type").startswith(exclude_type_prefix))
                    & (F.col("p_size").isin(*sizes))
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(bad_suppliers),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, *, brand: str = "Brand#7"
) -> DataFrame:
    """TPC-H Q17-style: average yearly revenue lost if small-quantity
    orders (below 20% of the part's mean quantity) were not filled.

    The correlated scalar subquery becomes a per-part aggregate joined
    back to the fact rows — both sides pre-filtered to the brand's
    parts so the aggregate only touches relevant rows.
    """
    brand_parts = F.broadcast(
        part.filter(F.col("p_brand") == brand).select("p_partkey")
    )
    li = lineitem.join(brand_parts, F.col("l_partkey") == F.col("p_partkey"))
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(
            F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey")
        )
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / F.lit(7.0), 4).alias("avg_yearly")
        )
    )


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19-style disjunctive-predicate revenue: three OR'd
    brand/size/quantity branches evaluated in one scan.

    The common join key (partkey) is extracted so Catalyst plans ONE
    broadcast join with the OR residual as a post-join filter, not a
    union of three scans.
    """
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.round(F.sum(_revenue()), 4).alias("revenue"))
    )


def waiting_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    *,
    nation_name: str = "NATION_3",
    late_days: int = 90,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21-style suppliers who kept orders waiting: lines shipped
    > late_days after the order date, in multi-supplier orders where
    this supplier was the ONLY late one.

    The two correlated EXISTS / NOT EXISTS become per-order window
    aggregates (distinct suppliers, distinct late suppliers) — ONE scan
    of each fact table and one shuffle on the order key, instead of the
    textbook plan's two self-joins (asserted in tests/test_plans.py).
    Per-order supplier sets are tiny (≤ lines-per-order), so collect_set
    over the window stays O(1) per row at any scale.
    """
    w = Window.partitionBy("l_orderkey")
    lo = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "is_late",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > late_days,
        )
        .select("l_orderkey", "l_suppkey", "is_late")
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
    )
    return (
        lo.filter(
            F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == nation_name)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(k)
    )


def idle_rich_customers(
    customer: DataFrame, orders: DataFrame, *, since: str = "2001-01-01"
) -> DataFrame:
    """TPC-H Q22-style: customers with above-average positive balance
    and no RECENT orders (none since ``since``), grouped by nation.

    The scalar-average threshold is compared in exact decimal space —
    ``c_acctbal * count > sum`` — so the cut is bit-identical across
    engines and summation orders (the same class of boundary
    nondeterminism as _exact_avg, applied to a filter). The anti join
    runs against the pre-filtered (small) recent-orders key set.
    """
    stats = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(28,8)")).alias("bal_sum"),
        F.count(F.lit(1)).alias("bal_cnt"),
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(since).cast("timestamp")
    ).select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(stats))
        .filter(
            F.col("c_acctbal").cast("decimal(28,8)") * F.col("bal_cnt")
            > F.col("bal_sum")
        )
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


def min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    part_type: str = "LARGE",
    region_name: str = "EUROPE",
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2-style min-cost supplier: for each part of one type, the
    region's supplier(s) offering the lowest observed unit price.

    Lineitem stands in for partsupp (unit price = extendedprice /
    quantity — the same IEEE division on both engines, so the
    min-equality join is exact). The correlated min-subquery is a
    whole-partition window MIN over the offer set: one lineitem scan
    and one shuffle (on l_partkey), where the agg + join-back
    formulation scanned the fact and re-ran both broadcast joins
    twice (measured 0.8 s → 0.55 s steady-state at sf0.1, and at
    100 TB the second fact scan is the dominant cost). Dims broadcast;
    dropDuplicates collapses repeat offers at the same price.
    """
    region_suppliers = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        lineitem.select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
        .join(
            F.broadcast(part.filter(F.col("p_type") == part_type)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(region_suppliers), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    min_w = Window.partitionBy("l_partkey")
    return (
        offers.withColumn("min_price", F.min("unit_price").over(min_w))
        .filter(F.col("unit_price") == F.col("min_price"))
        .select(
            F.round("s_acctbal", 4).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("unit_price", 4).alias("unit_price"),
        )
        .dropDuplicates()
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(k)
    )


def grouping_sets_totals(orders: DataFrame) -> DataFrame:
    """GROUPING SETS showcase: per-status totals, per-priority totals,
    and the grand total in ONE pass (Expand + a single aggregate —
    the third member of the rollup/cube family; arbitrary set lists
    where rollup/cube are fixed hierarchies).

    ``grouping(col)`` flags distinguish "NULL because aggregated
    away" from a genuine NULL group key.
    """
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_value"),
        )
    )


def rolling_weekly_spend(orders: DataFrame, *, days: int = 7) -> DataFrame:
    """RANGE-frame window: per customer, total spend over the trailing
    ``days`` calendar days — a time-based frame (peers by timestamp),
    not a row-count frame, so same-day orders fall in the same frame
    regardless of row order.

    One shuffle on the customer key; the frame bound is epoch seconds
    (integer range), portable to the oracle's epoch()-based frame.
    Rounded sums are safe here without decimals: frames hold few
    2-dp values, so the double sum sits ~1e-11 from a 2-dp decimal,
    never near a 4-dp rounding boundary.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-days * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias(f"spend_{days}d"),
    )


def top_revenue_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    *,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15-style top supplier: revenue per supplier over one
    quarter, returning the supplier(s) whose revenue equals the global
    maximum (the reference view + scalar-max subquery collapsed into
    one aggregate reused on both sides).

    The max-equality test runs in exact decimal space — each per-row
    double product is bit-identical across engines, cast to
    DECIMAL(28,8) once, then summed order-independently — so the argmax
    never flips on a last-ulp double difference. The revenue aggregate
    is computed ONCE; the global max is a broadcast scalar crossed back
    onto it (no self-join of lineitem), and supplier attaches by
    broadcast.
    """
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                ).cast("decimal(28,8)")
            ).alias("total_rev")
        )
    )
    best = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 4).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    *,
    nation_name: str = "NATION_3",
    mean_factor: int = 2,
) -> DataFrame:
    """TPC-H Q11-style important stock: parts whose traded value through
    one nation's suppliers exceeds ``mean_factor``× the MEAN per-part
    value for that nation (lineitem value standing in for partsupp
    supplycost*availqty — the driver tables carry no partsupp).

    TPC-H's fixed share (0.0001/SF) must shrink with scale to stay
    meaningful; a mean-relative cut is scale-free, so the same query is
    non-trivial at sf0.001 and at 100 TB. The comparison is exact:
    ``value * n_parts > factor * total`` multiplies DECIMAL sums by
    integers only — independent of summation order and engine. One
    shuffle (group by partkey); the national total is a broadcast
    scalar, suppliers of the nation a broadcast semi join.
    """
    nation_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    value = (
        lineitem.join(
            F.broadcast(nation_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                ).cast("decimal(28,8)")
            ).alias("part_value")
        )
    )
    total = value.agg(
        F.sum("part_value").alias("total_value"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        value.crossJoin(F.broadcast(total))
        .filter(
            F.col("part_value") * F.col("n_parts")
            > F.col("total_value") * F.lit(mean_factor)
        )
        .select(
            "l_partkey",
            F.round(F.col("part_value").cast("double"), 4).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def bulk_shippers(
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    *,
    name_prefix: str = "red",
    nation_name: str = "NATION_3",
    start: str = "1998-01-01",
    end: str = "1999-01-01",
    min_qty: int = 30,
) -> DataFrame:
    """TPC-H Q20-style nested-IN shape: suppliers in one nation who
    shipped more than ``min_qty`` units of some prefix-named part in a
    year (lineitem shipments standing in for partsupp availability).

    The textbook double-nested IN — suppkey IN (… partkey IN (…)) —
    becomes two broadcast left-semi joins feeding ONE grouped HAVING:
    part's prefix filter broadcasts into the lineitem scan (with the
    date range pushed to parquet), the qualifying (supp, part) totals
    collapse to distinct suppkeys, and supplier is probed semi — no
    row duplication, no correlated re-scan.
    """
    prefix_parts = part.filter(F.col("p_name").startswith(name_prefix)).select(
        "p_partkey"
    )
    heavy_supp = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .join(
            F.broadcast(prefix_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > min_qty)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            heavy_supp, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(
            F.broadcast(nation.filter(F.col("n_name") == nation_name)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_name", F.round("s_acctbal", 4).alias("s_acctbal"))
        .orderBy("s_name")
    )


def shipmode_priority_counts(
    lineitem: DataFrame,
    orders: DataFrame,
    *,
    late_days: int = 30,
    start: str = "1997-01-01",
    end: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q12-style conditional-count pivot: per ship class
    (``l_returnflag`` standing in for the missing ``l_shipmode``), how
    many late-shipped lines belonged to high- vs low-priority orders.

    Both CASE branches ride the SAME grouped pass — one scan, one
    shuffle on the group key, both counts map-side combined. The
    shipdate year window is pushed to the parquet scan before the join,
    so only the window's lines are shuffled; orders contributes three
    columns. The lateness predicate is a non-equi residual on the
    orderkey equi-join, evaluated inside the join, not after it.
    """
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lines = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    return (
        lines.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
            ),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def order_value_distribution(orders: DataFrame, *, buckets: int = 4) -> DataFrame:
    """Per-priority value distribution in ONE window pass: quartile
    bucket (``ntile``), ``percent_rank`` and ``cume_dist`` for every
    order within its priority class.

    All three analytics share a single window spec, so Catalyst plans
    ONE shuffle (hash on priority) + ONE sort — three columns for the
    price of one pass. The window partitions by priority, never
    globally: a global ntile would serialize the whole table through
    one partition, the classic scale cliff this formulation avoids.
    percent_rank/cume_dist are exact rationals of row counts —
    engine-portable without rounding tricks (rounded only to tame
    display width).
    """
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(buckets).over(w).cast("bigint").alias("value_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def priority_metrics_long(orders: DataFrame) -> DataFrame:
    """Wide→long reshape (melt/UNPIVOT): one aggregated row per
    priority with (n_orders, total_value, avg_value) columns, unpivoted
    to (priority, metric, value) — the reporting shape the reference
    emits as separate validation-issue records (data_loader.py:361-371
    builds its issue list metric-by-metric; UNPIVOT is that list as a
    relational operator).

    ``unpivot`` is a zero-shuffle Expand over the already-aggregated
    (tiny) wide table — the single groupBy shuffle is the only
    exchange at any scale. avg is decimal-exact (``_exact_avg``) so
    the long table is engine-portable.
    """
    wide = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(28,8)")), 4)
        .cast("double")
        .alias("total_value"),
        _exact_avg("o_totalprice").alias("avg_value"),
    )
    return wide.unpivot(
        "o_orderpriority",
        ["n_orders", "total_value", "avg_value"],
        "metric",
        "value",
    )


def nation_balance_fullouter(
    customer: DataFrame, supplier: DataFrame
) -> DataFrame:
    """Full-outer reconciliation: per-nation customer vs supplier
    account balances side by side, keeping nations that have only one
    of the two populations (the join shape LEFT/INNER silently drop).

    Both sides aggregate BEFORE the join — the full-outer join runs on
    two ≤|nations| row inputs, not on the raw tables, so its cost is
    trivial at any scale and the row-multiplying hazard of outer joins
    on facts never arises. Sums are decimal-exact.
    """
    cust = customer.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(28,8)")), 4)
        .cast("double")
        .alias("customer_balance"),
    )
    supp = supplier.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum(F.col("s_acctbal").cast("decimal(28,8)")), 4)
        .cast("double")
        .alias("supplier_balance"),
    )
    joined = cust.join(
        supp, F.col("c_nationkey") == F.col("s_nationkey"), "full_outer"
    )
    return joined.select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("customer_balance", F.lit(0.0)).alias("customer_balance"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        F.coalesce("supplier_balance", F.lit(0.0)).alias("supplier_balance"),
    ).orderBy("nationkey")


def bulk_parts_except_returned(
    lineitem: DataFrame, *, min_qty: int = 45
) -> DataFrame:
    """Multiset difference (EXCEPT ALL): bulk-shipped part keys minus
    returned bulk shipments, KEEPING multiplicity — a part shipped in
    bulk 3× and returned once survives twice, which the distinct
    EXCEPT would collapse to one row.

    ``exceptAll`` plans as a count-per-key aggregate on each side and
    a generate of (count_left − count_right) copies — one shuffle per
    side on the part key, no join explosion, no row-at-a-time logic.
    """
    bulk = lineitem.filter(F.col("l_quantity") > min_qty).select("l_partkey")
    returned = lineitem.filter(
        (F.col("l_quantity") > min_qty) & (F.col("l_returnflag") == "R")
    ).select("l_partkey")
    return bulk.exceptAll(returned)
