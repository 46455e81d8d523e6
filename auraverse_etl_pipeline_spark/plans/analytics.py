"""Relational analytics layer over the star schema (TPC-H-ish).

The reference implements no relational algebra (SURVEY.md §2.6 — its one
aggregation is a fragment count, ``etl_parser.py:1077-1080``); this layer
is the north-star analytics surface: joins (broadcast/shuffle/semi/anti/
as-of), aggregations (group/rollup/cube/distinct), window functions
(rank/lag/cumulative), sorts/top-k, set ops, JSON extraction,
sessionization — all declarative DataFrame ops so Catalyst picks the
physical plan (broadcast joins for dims, partial aggregation map-side,
AQE for shuffle sizing).

Scale notes (100 TB mindset), applied throughout:
- Dimension tables are explicitly ``F.broadcast`` — the fact table never
  shuffles for a dim join.
- Aggregations are expressed directly on ``groupBy`` so Spark plans
  partial (map-side) aggregation; no ``collect`` anywhere.
- Window functions partition by high-cardinality keys (custkey/user_id),
  never a global unpartitioned window, except provably tiny inputs.
- Exact DECIMAL sums: determinism for the oracle AND at-scale sanity
  (double sums drift with partition count; decimals don't).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql.types import DecimalType

from auraverse_etl_pipeline_spark.plans.registry import query
from auraverse_etl_pipeline_spark.sources.tables import load_table


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Exact, order-independent sum of a double column.

    Summing doubles is non-associative: at 60k rows the result differs
    between engines / partitionings by ~1e-3 absolute. Summing as
    DECIMAL(38, scale) is exact and deterministic; cast back to DOUBLE
    for a stable output type.

    Scale choice: source money columns carry exactly 2 decimals, so any
    product of up to three of them carries ≤6 — at scale 6 the true
    value sits ON a representable decimal, ≥5e-7 away from a rounding
    boundary, while the double's representation error is ~1e-11. Both
    engines therefore round identically. Oracle twin:
    ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DecimalType(38, scale))).cast("double")


def DSUM(expr: str, scale: int = 6) -> str:
    """SQL-text twin of :func:`dsum` for the DuckDB oracle strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Aggregation-heavy scans
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity')} AS sum_qty,
           {DSUM('l_extendedprice')} AS sum_base_price,
           {DSUM('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {DSUM('l_quantity')} / COUNT(*) AS avg_qty,
           {DSUM('l_extendedprice')} / COUNT(*) AS avg_price,
           {DSUM('l_discount')} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 shape: single-pass grouped aggregation over the fact table",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
            (dsum("l_discount") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q04_revenue_forecast",
    oracle=f"""
    SELECT {DSUM('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6 shape: fully-pushed-down filter + global aggregate",
)
def q04_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "q08_parts_by_brand",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           CAST(MIN(p_size) AS BIGINT) AS min_size,
           CAST(MAX(p_size) AS BIGINT) AS max_size,
           {DSUM('p_retailprice')} AS sum_retail,
           COUNT(DISTINCT p_type) AS n_types
    FROM part
    GROUP BY p_brand
    """,
    description="dimension profiling: min/max/count-distinct per brand",
)
def q08_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.min("p_size").cast("bigint").alias("min_size"),
        F.max("p_size").cast("bigint").alias("max_size"),
        dsum("p_retailprice").alias("sum_retail"),
        F.countDistinct("p_type").alias("n_types"),
    )


@query(
    "q09_nation_year_profit",
    # TPC-H Q9 (product-type profit) adapted to the available tables:
    # the schema ships no partsupp, so the cost side is a deterministic
    # retail-price proxy (p_retailprice · l_quantity · 0.6). The float
    # expression is the same infix order on both engines, so per-row
    # amounts are bit-identical and the DECIMAL sum is exact.
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           COUNT(*) AS n_lines,
           {DSUM("l.l_extendedprice * (1 - l.l_discount)"
                 " - p.p_retailprice * l.l_quantity * 0.6")} AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%bolt%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    description="TPC-H Q9 shape: per-(supplier nation, order year) "
    "profit over a name-filtered part slice - a 5-table star join "
    "where the filtered part and the supplier/nation dims broadcast "
    "(the fact table never shuffles for the joins), then one grouped "
    "DECIMAL-exact aggregate; the cost leg is a retail-price proxy "
    "because the schema ships no partsupp",
)
def q09_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("bolt")
    )
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.6)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(amount).alias("sum_profit"),
        )
    )


@query(
    "q14_rollup_priority_status",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           {DSUM('o_totalprice')} AS sum_total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    description="hierarchical subtotals via ROLLUP",
)
def q14_rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("sum_total"),
    )


@query(
    "q15_cube_flag_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {DSUM('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    description="all grouping-set combinations via CUBE",
)
def q15_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        dsum("l_quantity").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q03_region_nation_revenue",
    oracle=f"""
    SELECT r_name, n_name,
           {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY r_name, n_name
    """,
    description="TPC-H Q5 shape: 6-table star join; dims broadcast, fact never shuffled for them",
)
def q03_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q02_top_revenue_orders",
    oracle=f"""
    SELECT o_orderkey, c_name, o_orderdate,
           {DSUM('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY o_orderkey, c_name, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3 shape: join + grouped revenue + deterministic top-k",
)
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "c_name", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q05_returned_customers",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {DSUM('l_extendedprice * (1 - l_discount)')} AS lost_revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10 shape: returned-item revenue per customer, top 20",
)
def q05_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q06_priority_with_big_items",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity > 45
    )
    GROUP BY o_orderpriority
    """,
    description="left-semi join (EXISTS) then count by priority",
)
def q06_priority_with_big_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    big_items = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey")
    )
    return (
        orders.join(big_items, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "q17_customers_without_orders",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers_no_orders
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    description="left-anti join (NOT EXISTS) aggregated by segment",
)
def q17_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_no_orders"))
    )


@query(
    "q07_acctbal_by_region",
    oracle=f"""
    SELECT r_name,
           COUNT(*) AS n_customers,
           {DSUM('c_acctbal')} AS sum_acctbal,
           {DSUM('c_acctbal')} / COUNT(*) AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    description="two broadcast dim joins + grouped average",
)
def q07_acctbal_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
            (dsum("c_acctbal") / F.count("*")).alias("avg_acctbal"),
        )
    )


@query(
    "q18_large_quantity_orders",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           {DSUM('l_quantity', 2)} AS total_qty
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) > 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 25
    """,
    description="TPC-H Q18 shape: grouped HAVING filter + deterministic top-k",
)
def q18_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg(dsum("l_quantity", 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "q13_order_count_histogram",
    oracle="""
    SELECT order_count, COUNT(*) AS n_customers
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS order_count
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    )
    GROUP BY order_count
    """,
    description="TPC-H Q13 shape: outer join + two-level aggregation",
)
def q13_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(F.count("*").alias("n_customers"))


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "q10_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
    description="per-group top-k via ROW_NUMBER window (partitioned, never global)",
)
def q10_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q11_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    WHERE o_custkey < 100
    """,
    description="cumulative windowed sum per customer (exact decimal accumulation)",
)
def q11_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DecimalType(38, 2))).over(w).cast("double").alias("running_total"),
    )


@query(
    "q19_event_lag_lead",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           date_diff('second', LAG(ts) OVER w, ts) AS secs_since_prev
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    description="LAG/LEAD navigation over per-user event streams",
)
def q19_event_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("secs_since_prev"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "q16_repeat_buyers_setop",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
    description="INTERSECT of yearly buyer sets",
)
def q16_repeat_buyers_setop(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y1996 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y1997 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y1996.intersect(y1997)


@query(
    "q21_churned_buyers_setop",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
    description="EXCEPT: buyers active in 1996 but not 1997",
)
def q21_churned_buyers_setop(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y1996 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y1997 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y1996.subtract(y1997)


# ---------------------------------------------------------------------------
# Time-series / events
# ---------------------------------------------------------------------------


@query(
    "q12_orders_monthly_kpis",
    oracle=f"""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           {DSUM('o_totalprice', 2)} AS sum_total
    FROM orders
    GROUP BY 1
    """,
    description="calendar bucketing + count-distinct per month",
)
def q12_orders_monthly_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            dsum("o_totalprice", 2).alias("sum_total"),
        )
    )


@query(
    "q20_hourly_event_windows",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           {DSUM('value', 6)} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    description="tumbling 1h windows (batch twin of the streaming aggregation)",
)
def q20_hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q22_asof_last_order",
    oracle="""
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           (SELECT max(o.o_orderdate) FROM orders o
            WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS last_order_date
    FROM events e
    WHERE e.event_type = 'purchase'
    """,
    description="as-of join: most recent order per user at each purchase event "
    "(cogrouped applyInPandas merge_asof — SURVEY.md §2.6 custom-operator path)",
)
def q22_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # window spelling, not the cogrouped pandas one: this data is
    # many-tiny-groups (one per user), where per-group pandas overhead
    # dominates (measured 28s vs 1.5s at sf0.1)
    from auraverse_etl_pipeline_spark.operators.asof import as_of_join_window

    events = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    joined = as_of_join_window(
        events,
        orders,
        on="ts",
        right_on="o_orderdate",
        by_left="user_id",
        by_right="o_custkey",
        right_cols=[],
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("o_orderdate").alias("last_order_date")
    )


@query(
    "q24_user_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               CAST(SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events,
           date_diff('second', MIN(ts), MAX(ts)) AS duration_s
    FROM sess
    GROUP BY 1, 2
    """,
    description="30-min-gap sessionization (lag + cumulative flag, one shuffle)",
)
def q24_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.operators.sessionize import session_stats

    events = load_table(spark, sf_dir, "events")
    return session_stats(events, gap_minutes=30)


@query(
    "q23_events_json_extract",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {DSUM("CAST(json_extract_string(props, '$.k') AS BIGINT)", 0)} AS sum_k,
           {DSUM("CAST(json_extract_string(props, '$.k') AS BIGINT)", 0)} / COUNT(*) AS avg_k
    FROM events
    GROUP BY event_type
    """,
    description="semi-structured JSON extraction (get_json_object) + aggregate",
)
def q23_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        dsum(k, 0).alias("sum_k"),
        (dsum(k, 0) / F.count("*")).alias("avg_k"),
    )


@query(
    "q25_salted_flag_totals",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {DSUM('l_quantity')} AS sum_qty,
           {DSUM('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="skew-resistant two-phase salted aggregation "
    "(operators/skew.py) — identity rewrite of a hot-key groupBy, "
    "proven against the plain-SQL oracle",
)
def q25_salted_flag_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        key_cols=["l_returnflag"],
        partial_aggs=[
            F.count("*").alias("_n"),
            dsum("l_quantity", 6).alias("_q"),
            dsum("l_extendedprice", 6).alias("_p"),
        ],
        final_aggs=[
            F.sum("_n").alias("n_items"),
            dsum("_q", 6).alias("sum_qty"),
            dsum("_p", 6).alias("sum_price"),
        ],
        n_salts=16,
    )


@query(
    "q26_range_join_daytime_events",
    oracle=f"""
    WITH win AS (
        SELECT s AS window_start,
               s + INTERVAL 6 HOUR AS w_start,
               s + INTERVAL 18 HOUR AS w_end
        FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-31',
                             INTERVAL 1 DAY) AS t(s)
    )
    SELECT CAST(w.window_start AS TIMESTAMP) AS window_start,
           COUNT(*) AS n_events,
           {DSUM('e.value')} AS sum_value
    FROM win w JOIN events e
      ON e.ts >= w.w_start AND e.ts <= w.w_end
    GROUP BY 1
    """,
    description="range join (operators/interval.py): events into daytime "
    "maintenance windows via bucketed equality join, never a "
    "BroadcastNestedLoopJoin",
)
def q26_range_join_daytime_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.operators.interval import range_join

    events = load_table(spark, sf_dir, "events")
    win = spark.sql(
        """
        SELECT day AS window_start,
               day + INTERVAL 6 HOUR AS w_start,
               day + INTERVAL 18 HOUR AS w_end
        FROM (SELECT explode(sequence(TIMESTAMP '2024-01-01',
                                      TIMESTAMP '2024-01-31',
                                      INTERVAL 1 DAY)) AS day)
        """
    )
    joined = range_join(events, win, point_ts="ts", start_col="w_start", end_col="w_end")
    return joined.groupBy("window_start").agg(
        F.count("*").alias("n_events"), dsum("value", 6).alias("sum_value")
    )


@query(
    "q27_rollup_cascade_daily",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, event_type,
           COUNT(*) AS n_events,
           {DSUM('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    description="hypertable rollup cascade (operators/interval.py): daily "
    "level computed minute→hour→day from partials, never re-reading raw; "
    "exact vs the direct daily aggregation",
)
def q27_rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.operators.interval import rollup_cascade

    events = load_table(spark, sf_dir, "events")
    daily = rollup_cascade(events)["1 day"]
    return daily.select(
        "bucket", "event_type", "n_events", F.col("sum_value").cast("double").alias("sum_value")
    )


@query(
    "q28_sketch_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS hll_within_5pct,
           TRUE AS p50_rank_bounded,
           TRUE AS p99_rank_bounded
    FROM events GROUP BY event_type
    """,
    description="sketch tier: approx_count_distinct (HyperLogLog++, "
    "rsd=0.01) and approx percentiles per event_type, scored with a "
    "bounded oracle: Spark computes BOTH the sketch estimate and the "
    "exact answer and emits within-bound booleans; DuckDB asserts TRUE "
    "and hash-checks the exact distinct counts, so both sketch drift "
    "and count divergence are caught by the driver. Both percentile "
    "bounds are rank-based brackets from ONE exact sorted aggregate — "
    "percentile(value, array(0.45, 0.55, 0.98)) shares a single "
    "sort-based state — so ap50 must land inside the exact p45..p55 "
    "rank bracket (a real median-drift gate, unlike the r3 [min, p98] "
    "bound which any sub-p98 estimate satisfied) and ap99 inside "
    "p98..max, while the gate still costs one sorted state per group",
)
def q28_sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    # Two aggregations joined on the (tiny) group key, NOT one: mixing
    # a distinct aggregate with imperative percentile aggregates in a
    # single groupBy forces Spark into an expand + sort-aggregate plan
    # that drags every percentile buffer through the distinct's row
    # multiplication (measured 2-3x slower at sf0.1). Split, each agg
    # keeps its best physical form and the join is 5 rows.
    users = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("hll_users"),
    )
    vals = events.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("ap50"),
        F.approx_percentile("value", F.lit(0.99), F.lit(10000)).alias("ap99"),
        # one sorted aggregate state yields all three exact brackets
        F.expr("percentile(value, array(0.45, 0.55, 0.98))").alias("pb"),
        F.max("value").alias("vmax"),
    )
    agg = users.join(vals, "event_type")
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("hll_users").cast("double") - F.col("exact_users").cast("double"))
            <= 0.05 * F.col("exact_users").cast("double")
        ).alias("hll_within_5pct"),
        ((F.col("ap50") >= F.col("pb")[0]) & (F.col("ap50") <= F.col("pb")[1])).alias(
            "p50_rank_bounded"
        ),
        ((F.col("ap99") >= F.col("pb")[2]) & (F.col("ap99") <= F.col("vmax"))).alias(
            "p99_rank_bounded"
        ),
    )


@query(
    "q29_sliding_event_windows",
    oracle=f"""
    WITH grid AS (
        SELECT s AS window_start
        FROM generate_series(TIMESTAMP '2023-12-31 23:15:00',
                             TIMESTAMP '2024-01-31 00:00:00',
                             INTERVAL 15 MINUTE) AS t(s)
    )
    SELECT CAST(g.window_start AS TIMESTAMP) AS window_start,
           COUNT(*) AS n_events,
           {DSUM('e.value')} AS sum_value
    FROM grid g JOIN events e
      ON e.ts >= g.window_start AND e.ts < g.window_start + INTERVAL 1 HOUR
    GROUP BY 1
    """,
    description="sliding windows (1h every 15min): each event lands in 4 "
    "overlapping windows via native F.window slide — no self-join",
)
def q29_sliding_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value", 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query(
    "q30_grouping_sets_revenue",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority) AS g_priority,
           GROUPING(o_orderstatus) AS g_status,
           COUNT(*) AS n_orders,
           {DSUM('o_totalprice')} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                            (o_orderpriority, o_orderstatus))
    """,
    description="explicit GROUPING SETS with GROUPING() markers "
    "(completes cube/rollup coverage from q14/q15)",
)
def q30_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderpriority, o_orderstatus,
               GROUPING(o_orderpriority) AS g_priority,
               GROUPING(o_orderstatus) AS g_status,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                                (o_orderpriority, o_orderstatus))
        """
    )


@query(
    "q31_pivot_daily_event_matrix",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           {DSUM("CASE WHEN event_type = 'click' THEN value END")} AS click,
           {DSUM("CASE WHEN event_type = 'error' THEN value END")} AS error,
           {DSUM("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase,
           {DSUM("CASE WHEN event_type = 'view' THEN value END")} AS view
    FROM events
    GROUP BY 1
    """,
    description="PIVOT: wide day x event_type value matrix (explicit "
    "pivot column list so the plan is one pass, no distinct-scan)",
)
def q31_pivot_daily_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", ["click", "error", "purchase", "view"])
        .agg(dsum("value", 6))
    )


@query(
    "q32_variant_json_extract",
    oracle=f"""
    SELECT event_type,
           {DSUM("CAST(json_extract_string(props, '$.k') AS BIGINT)", 0)} AS sum_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    description="Spark 4 VariantType path: parse_json once, variant_get "
    "typed extraction (the open-schema scale alternative to per-query "
    "string re-parsing; SURVEY §1.1 data-model mapping)",
)
def q32_variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return events.groupBy("event_type").agg(
        dsum(k, 0).alias("sum_k"), F.count("*").alias("n_events")
    )


@query(
    "q33_hll_sketch_union",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_distinct_users,
           TRUE AS union_within_5pct
    FROM events GROUP BY event_type
    """,
    description="mergeable HLL sketches (DataSketches): per-day sketches "
    "built once, unioned to per-type totals without rescanning raw — the "
    "persisted-partials pattern for 100 TB distinct counts. Bounded "
    "oracle: the unioned estimate is compared in-plan against the exact "
    "distinct count (which DuckDB hash-checks), and the within-bound "
    "boolean must be TRUE on every row",
)
def q33_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    merged = daily.groupBy("event_type").agg(
        F.hll_union_agg("sketch").alias("merged")
    ).select("event_type", F.hll_sketch_estimate("merged").alias("hll_users"))
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct_users")
    )
    return (
        exact.join(F.broadcast(merged), "event_type")
        .select(
            "event_type",
            "exact_distinct_users",
            (
                F.abs(F.col("hll_users").cast("double") - F.col("exact_distinct_users").cast("double"))
                <= 0.05 * F.col("exact_distinct_users").cast("double")
            ).alias("union_within_5pct"),
        )
    )


@query(
    "q34_full_outer_user_reconciliation",
    oracle=f"""
    WITH buyers AS (
        SELECT o_custkey AS user_id, COUNT(*) AS n_orders,
               {DSUM('o_totalprice')} AS order_value
        FROM orders WHERE o_custkey < 300 GROUP BY 1
    ),
    actives AS (
        SELECT user_id, COUNT(*) AS n_events
        FROM events GROUP BY 1
    )
    SELECT COALESCE(b.user_id, a.user_id) AS user_id,
           b.n_orders, b.order_value, a.n_events,
           CASE WHEN b.user_id IS NULL THEN 'event_only'
                WHEN a.user_id IS NULL THEN 'order_only'
                ELSE 'both' END AS presence
    FROM buyers b FULL OUTER JOIN actives a ON b.user_id = a.user_id
    """,
    description="FULL OUTER join reconciliation of two aggregated "
    "universes (order-side vs event-side users) with presence tagging",
)
def q34_full_outer_user_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    events = load_table(spark, sf_dir, "events")
    buyers = orders.groupBy(F.col("o_custkey").alias("b_user")).agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("order_value")
    )
    actives = events.groupBy(F.col("user_id").alias("a_user")).agg(
        F.count("*").alias("n_events")
    )
    joined = buyers.join(actives, F.col("b_user") == F.col("a_user"), "full_outer")
    return joined.select(
        F.coalesce("b_user", "a_user").alias("user_id"),
        "n_orders",
        "order_value",
        "n_events",
        F.when(F.col("b_user").isNull(), "event_only")
        .when(F.col("a_user").isNull(), "order_only")
        .otherwise("both")
        .alias("presence"),
    )


@query(
    "q35_profile_orders",
    oracle=f"""
    SELECT 'o_totalprice' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(o_totalprice) AS n_non_null,
           COUNT(DISTINCT o_totalprice) AS n_distinct,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_val,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           COUNT(*), COUNT(o_custkey), COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
    FROM orders
    """,
    description="data-quality profiling: per-column null/distinct/range "
    "stats in ONE scan (multi-aggregate projection, unpivoted)",
)
def q35_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # one scan computing all stats, then unpivot to one row per column —
    # N scans (one per profiled column) is the naive spelling
    agg = orders.agg(
        F.count("*").alias("n_rows"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.min("o_custkey").cast("double").alias("min_cust"),
        F.max("o_custkey").cast("double").alias("max_cust"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_totalprice").alias("column_name"),
                    F.col("n_rows"),
                    F.col("nn_price").alias("n_non_null"),
                    F.col("nd_price").alias("n_distinct"),
                    F.col("min_price").alias("min_val"),
                    F.col("max_price").alias("max_val"),
                ),
                F.struct(
                    F.lit("o_custkey").alias("column_name"),
                    F.col("n_rows"),
                    F.col("nn_cust").alias("n_non_null"),
                    F.col("nd_cust").alias("n_distinct"),
                    F.col("min_cust").alias("min_val"),
                    F.col("max_cust").alias("max_val"),
                ),
            )
        ).alias("p")
    ).select("p.*")


@query(
    "q36_trailing_7day_revenue",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               {DSUM('value')} AS day_value
        FROM events GROUP BY 1
    )
    SELECT CAST(day AS TIMESTAMP) AS day, day_value,
           CAST(SUM(CAST(day_value AS DECIMAL(38,6))) OVER (
               ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_7d
    FROM daily
    """,
    description="RANGE-frame window: 7-day trailing revenue over daily "
    "totals (value-range frame, not row-count frame - days may be missing)",
)
def q36_trailing_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        dsum("value", 6).alias("day_value")
    )
    # rangeBetween needs a numeric ordering key: epoch days
    w = (
        Window.orderBy(F.unix_date(F.col("day").cast("date")))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "day",
        "day_value",
        F.sum(F.col("day_value").cast("decimal(38,6)")).over(w).cast("double").alias("trailing_7d"),
    )


@query(
    "q37_percentile_ladder",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE) AS p25,
           CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE) AS p50,
           CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE) AS p90,
           CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="exact distribution profiling: percentile_disc ladder per "
    "return flag (discrete percentiles return actual data values, so the "
    "result is hash-exact across engines - no interpolation FP drift)",
)
def q37_percentile_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One histogram pass instead of four ``percentile_disc`` states:
    build the per-group value histogram (a codegen'd partial-aggregated
    groupBy — the shuffle carries (group, value, count), combined
    map-side), cumulative-sum it per group, and pick every ladder rung
    from the same cumulative table (value at the first cum >= ceil(p*n)
    — exactly percentile_disc's definition, hash-identical results).
    Four separate percentile_disc aggregates each hold their own
    value->count map and serialize it between partial and final phases;
    this shape holds ONE histogram and measured ~2.5x faster at sf0.1.

    Scale note: the cumulative window runs one task per group over the
    group's DISTINCT values — the same per-group memory bound as
    percentile_disc's own final aggregation map, so nothing regresses
    vs the builtin at 100 TB; for truly unbounded high-cardinality
    columns swap in approx_percentile (t-digest, bounded memory) and
    keep this as the exactness oracle at audit scale."""
    from auraverse_etl_pipeline_spark.operators.caching import release_after

    li = load_table(spark, sf_dir, "lineitem")
    # cache the histogram: both the cumulative window and the per-group
    # totals derive from it, and without the cache each consumer would
    # rescan + re-aggregate the fact table (n = sum of histogram counts
    # — never a second fact scan)
    hist = (
        li.groupBy("l_returnflag", "l_extendedprice").agg(F.count("*").alias("c")).cache()
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w))
    counts = hist.groupBy("l_returnflag").agg(F.sum("c").alias("n"))
    rung = lambda p: F.min(  # noqa: E731
        F.when(F.col("cum") >= F.ceil(F.lit(p) * F.col("n")), F.col("l_extendedprice"))
    ).cast("double")
    result = (
        cum.join(F.broadcast(counts), "l_returnflag")
        .groupBy("l_returnflag", "n")
        .agg(
            rung(0.25).alias("p25"),
            rung(0.50).alias("p50"),
            rung(0.90).alias("p90"),
            rung(0.99).alias("p99"),
        )
        .select("l_returnflag", "n", "p25", "p50", "p90", "p99")
    )
    return release_after(result, hist)


_CDC_CHANGES_SQL = """
    changes AS (
        SELECT c_custkey, c_name, c_nationkey,
               CAST(c_acctbal + 100 AS DOUBLE) AS c_acctbal,
               'UPDATED' AS c_mktsegment, 'U' AS op, 1 AS seq
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, 'D', 2
        FROM customer WHERE c_custkey % 11 = 0
        UNION ALL
        SELECT c_custkey + 1000000, 'new customer ' || c_custkey, c_nationkey,
               CAST(0.0 AS DOUBLE), 'NEW', 'I', 1
        FROM customer WHERE c_custkey % 13 = 0
    )
"""


def _cdc_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CDC fixture derived from the customer table —
    updates (%7), deletes (%11, later seq so they beat colliding
    updates), inserts (%13 under shifted keys)."""
    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    upd = cust.filter(k % 7 == 0).select(
        "c_custkey", "c_name", "c_nationkey",
        (F.col("c_acctbal") + 100).cast("double").alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    dels = cust.filter(k % 11 == 0).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        F.lit("D").alias("op"), F.lit(2).alias("seq"),
    )
    ins = cust.filter(k % 13 == 0).select(
        (k + 1000000).alias("c_custkey"),
        F.concat(F.lit("new customer "), k.cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit("I").alias("op"), F.lit(1).alias("seq"),
    )
    return upd.unionByName(dels).unionByName(ins)


@query(
    "q38_changeset_apply",
    oracle=f"""
    WITH {_CDC_CHANGES_SQL},
    latest AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY c_custkey ORDER BY seq DESC, op DESC) AS rn
            FROM changes) WHERE rn = 1
    )
    SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
    FROM customer c
    WHERE c.c_custkey NOT IN (SELECT c_custkey FROM latest)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM latest WHERE op <> 'D'
    """,
    description="CDC type-1 upsert: apply an I/U/D change log to the "
    "customer snapshot, latest change per key wins (delete beats a "
    "colliding earlier update)",
)
def q38_changeset_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.operators.changeset import apply_changeset

    cust = load_table(spark, sf_dir, "customer")
    return apply_changeset(cust, _cdc_changes(spark, sf_dir), key_col="c_custkey")


@query(
    "q39_scd2_history",
    oracle="""
    WITH chg AS (
        SELECT c_custkey, c_acctbal, 'I' AS op, 1 AS seq
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, CAST(c_acctbal + 50 AS DOUBLE), 'U', 2
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, CAST(NULL AS DOUBLE), 'D', 3
        FROM customer WHERE c_custkey % 14 = 0
    )
    SELECT c_custkey, c_acctbal, valid_from, valid_to FROM (
        SELECT c_custkey, c_acctbal, op, seq AS valid_from,
               LEAD(seq) OVER (PARTITION BY c_custkey ORDER BY seq) AS valid_to
        FROM chg
    ) WHERE op <> 'D'
    """,
    description="SCD type-2 versioned history from a change log: each "
    "version gets [valid_from, valid_to) bounds via lead(); deletes close "
    "the last version (valid_to set) without emitting a row",
)
def q39_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.operators.changeset import scd2_history

    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    chg = (
        cust.filter(k % 7 == 0)
        .select("c_custkey", "c_acctbal", F.lit("I").alias("op"), F.lit(1).alias("seq"))
        .unionByName(
            cust.filter(k % 7 == 0).select(
                "c_custkey",
                (F.col("c_acctbal") + 50).cast("double").alias("c_acctbal"),
                F.lit("U").alias("op"), F.lit(2).alias("seq"),
            )
        )
        .unionByName(
            cust.filter(k % 14 == 0).select(
                "c_custkey",
                F.lit(None).cast("double").alias("c_acctbal"),
                F.lit("D").alias("op"), F.lit(3).alias("seq"),
            )
        )
    )
    return scd2_history(chg, key_col="c_custkey").select(
        "c_custkey", "c_acctbal", "valid_from", "valid_to"
    )


@query(
    "q40_referential_audit",
    oracle="""
    SELECT 'orders_without_customer' AS check_name, COUNT(*) AS n_violations
    FROM orders o WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'lineitem_without_order', COUNT(*)
    FROM lineitem l WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    UNION ALL
    SELECT 'lineitem_without_part', COUNT(*)
    FROM lineitem l WHERE l.l_partkey NOT IN (SELECT p_partkey FROM part)
    UNION ALL
    SELECT 'customer_without_nation', COUNT(*)
    FROM customer c WHERE c.c_nationkey NOT IN (SELECT n_nationkey FROM nation)
    """,
    description="data-quality referential audit: orphan counts across the "
    "four FK edges, each a broadcast anti-join (dimension side broadcast; "
    "fact side scans map-side, no shuffle)",
)
def q40_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def orphans(name: str, fact: DataFrame, fk: str, dim: DataFrame, pk: str) -> DataFrame:
        viol = fact.join(
            F.broadcast(dim.select(F.col(pk).alias(fk)).distinct()), fk, "left_anti"
        )
        return viol.agg(
            F.lit(name).alias("check_name"), F.count("*").alias("n_violations")
        )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    checks = [
        orphans("orders_without_customer", orders, "o_custkey", customer, "c_custkey"),
        orphans("lineitem_without_order", lineitem, "l_orderkey", orders, "o_orderkey"),
        orphans("lineitem_without_part", lineitem, "l_partkey", part, "p_partkey"),
        orphans("customer_without_nation", customer, "c_nationkey", nation, "n_nationkey"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@query(
    "q41_unpivot_metrics",
    oracle=f"""
    WITH wide AS (
        SELECT l_returnflag,
               {DSUM('l_quantity')} AS sum_qty,
               {DSUM('l_extendedprice')} AS sum_price,
               CAST(COUNT(*) AS DOUBLE) AS n_items
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM wide
    UNION ALL
    SELECT l_returnflag, 'n_items', n_items FROM wide
    """,
    description="wide->long melt via native UNPIVOT (the inverse of q31's "
    "PIVOT): per-flag metric columns become (metric, value) rows; oracle "
    "spells it as the ANSI UNION ALL equivalent",
)
def q41_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        F.count("*").cast("double").alias("n_items"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "n_items"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "q42_customer_value_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(10) OVER w AS BIGINT) AS decile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(first_value(c_custkey) OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS BIGINT) AS richest_custkey
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    description="distribution window functions per segment: decile "
    "(ntile), percent_rank, cume_dist, first_value - deterministic via "
    "the custkey tie-break in the window order",
)
def q42_customer_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(10).over(w).cast("bigint").alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(w_full).cast("bigint").alias("richest_custkey"),
    )


@query(
    "q54_user_value_anomalies",
    oracle="""
    WITH per AS (
        SELECT user_id,
               CAST(COUNT(*) AS DECIMAL(10,0)) AS n_u,
               CAST(SUM(CAST(round(value * 100) AS DECIMAL(12,0)))
                    AS DECIMAL(18,0)) AS s_u
        FROM events GROUP BY user_id
    ),
    pop AS (
        SELECT CAST(COUNT(*) AS DECIMAL(10,0)) AS nn,
               CAST(SUM(CAST(round(value * 100) AS DECIMAL(12,0)))
                    AS DECIMAL(18,0)) AS ss,
               CAST(SUM(CAST(round(value * 100) AS DECIMAL(12,0))
                        * CAST(round(value * 100) AS DECIMAL(12,0)))
                    AS DECIMAL(26,0)) AS sss
        FROM events
    )
    SELECT user_id,
           CAST(n_u AS BIGINT) AS n_events,
           CAST(s_u AS DOUBLE) / CAST(n_u AS DOUBLE) / 100.0 AS user_mean,
           (CAST(s_u AS DOUBLE) / CAST(n_u AS DOUBLE)
              - CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
             / (sqrt(CAST(nn * sss - ss * ss AS DOUBLE)
                     / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
                / sqrt(CAST(n_u AS DOUBLE))) AS z,
           abs((CAST(s_u AS DOUBLE) / CAST(n_u AS DOUBLE)
                  - CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
               / (sqrt(CAST(nn * sss - ss * ss AS DOUBLE)
                       / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
                  / sqrt(CAST(n_u AS DOUBLE)))) > 3 AS anomalous
    FROM per CROSS JOIN pop
    """,
    description="statistical outlier detection: per-user mean event "
    "value z-scored against the population (z = (mu_u - mu) / "
    "(sigma/sqrt(n_u)), the standard-error test), |z| > 3 flagged. "
    "The q43 moment discipline: all sums run on exact integer-cents "
    "DECIMALs so the variance numerator is an exact integer in both "
    "engines, and the FP tail is single-rounded casts + "
    "sqrt/divide which IEEE fixes bit-identically; the population "
    "row broadcasts against the per-user aggregate",
)


def q54_user_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("decimal(12,0)")
    per = ev.groupBy("user_id").agg(
        F.count("*").cast("decimal(10,0)").alias("n_u"),
        F.sum(c).cast("decimal(18,0)").alias("s_u"),
    )
    pop = ev.agg(
        F.count("*").cast("decimal(10,0)").alias("nn"),
        F.sum(c).cast("decimal(18,0)").alias("ss"),
        F.sum(c * c).cast("decimal(26,0)").alias("sss"),
    )
    joined = per.crossJoin(F.broadcast(pop))
    mu_u = F.col("s_u").cast("double") / F.col("n_u").cast("double")
    mu = F.col("ss").cast("double") / F.col("nn").cast("double")
    var = (F.col("nn") * F.col("sss") - F.col("ss") * F.col("ss")).cast("double") / (
        F.col("nn").cast("double") * F.col("nn").cast("double")
    )
    z = (mu_u - mu) / (F.sqrt(var) / F.sqrt(F.col("n_u").cast("double")))
    return joined.select(
        "user_id",
        F.col("n_u").cast("bigint").alias("n_events"),
        (mu_u / F.lit(100.0)).alias("user_mean"),
        z.alias("z"),
        (F.abs(z) > 3).alias("anomalous"),
    )


@query(
    "q43_exact_correlation",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DECIMAL(8,0)) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(6,0))) AS DECIMAL(14,0)) AS sq,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS DECIMAL(10,0))) AS DECIMAL(19,0)) AS sp,
               CAST(SUM(CAST(l_quantity AS DECIMAL(6,0)) * CAST(l_quantity AS DECIMAL(6,0))) AS DECIMAL(16,0)) AS sqq,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS DECIMAL(10,0)) * CAST(round(l_extendedprice * 100) AS DECIMAL(10,0))) AS DECIMAL(24,0)) AS spp,
               CAST(SUM(CAST(l_quantity AS DECIMAL(6,0)) * CAST(round(l_extendedprice * 100) AS DECIMAL(10,0))) AS DECIMAL(22,0)) AS sqp
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(n * sqp - sq * sp AS DOUBLE)
             / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE))
                * sqrt(CAST(n * spp - sp * sp AS DOUBLE))) AS corr_qty_price,
           CAST(n * sqp - sq * sp AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 100.0 AS cov_pop
    FROM m
    """,
    description="exact Pearson correlation / population covariance. All "
    "moment algebra runs on integer-cents DECIMALs (quantity is integral, "
    "price is exact cents), so numerator and variance terms are exact "
    "integers in both engines; the FP tail is single-rounded casts + "
    "sqrt/multiply/divide, which IEEE fixes bit-identically. (A double "
    "spelling of n*sxy - sx*sy diverges by 1 ulp between engines via FMA "
    "contraction, and the built-in corr() is partial-order dependent.)",
)
def q43_exact_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(6,0)")
    p = F.round(F.col("l_extendedprice") * 100).cast("decimal(10,0)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("decimal(8,0)").alias("n"),
        F.sum(q).cast("decimal(14,0)").alias("sq"),
        F.sum(p).cast("decimal(19,0)").alias("sp"),
        F.sum(q * q).cast("decimal(16,0)").alias("sqq"),
        F.sum(p * p).cast("decimal(24,0)").alias("spp"),
        F.sum(q * p).cast("decimal(22,0)").alias("sqp"),
    )
    n, sq, sp = F.col("n"), F.col("sq"), F.col("sp")
    sqq, spp, sqp = F.col("sqq"), F.col("spp"), F.col("sqp")
    num = (n * sqp - sq * sp).cast("double")
    den = F.sqrt((n * sqq - sq * sq).cast("double")) * F.sqrt((n * spp - sp * sp).cast("double"))
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        (num / den).alias("corr_qty_price"),
        (num / (n.cast("double") * n.cast("double")) / F.lit(100.0)).alias("cov_pop"),
    )


@query(
    "q44_global_ids",
    oracle="""
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS global_id
    FROM documents
    """,
    description="contiguous global row ids via two-pass range-partitioned "
    "numbering (identical to the naive global window's answer, but no "
    "Exchange SinglePartition - no single-reducer funnel)",
)
def q44_global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.operators.ids import assign_global_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return assign_global_ids(docs, ["doc_id"])


_MESSY_LADDER_SQL = ", ".join(
    f"try_strptime(raw, '{f}')"
    for f in ("%Y-%m-%d", "%Y/%m/%d", "%Y.%m.%d", "%d/%m/%Y", "%d-%m-%Y",
              "%d.%m.%Y", "%m/%d/%Y", "%d-%b-%Y", "%b %-d, %Y", "%B %-d, %Y",
              "%-d %b %Y")
)


@query(
    "q45_messy_date_ladder",
    oracle=f"""
    WITH gen AS (
        SELECT o_orderkey,
               CASE o_orderkey % 5
                   WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
                   WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y')
                   WHEN 2 THEN strftime(o_orderdate, '%Y/%m/%d')
                   WHEN 3 THEN strftime(o_orderdate, '%d-%m-%Y')
                   ELSE strftime(o_orderdate, '%b ') || CAST(day(o_orderdate) AS VARCHAR)
                        || strftime(o_orderdate, ', %Y')
               END AS raw
        FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey, raw,
           CAST(COALESCE({_MESSY_LADDER_SQL}) AS TIMESTAMP) AS parsed
    FROM gen
    """,
    description="messy-date parsing ladder through the oracle gate: five "
    "deterministic renderings of o_orderdate (ISO, day-first, slash-year, "
    "dash, textual month) round-trip through the first-match-wins "
    "try_to_date cascade; the DuckDB twin runs the same ladder with "
    "try_strptime",
)
def q45_messy_date_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.functions.dates import parse_messy_date

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey") % 5
    d = F.col("o_orderdate")
    raw = (
        F.when(k == 0, F.date_format(d, "yyyy-MM-dd"))
        .when(k == 1, F.date_format(d, "dd/MM/yyyy"))
        .when(k == 2, F.date_format(d, "yyyy/MM/dd"))
        .when(k == 3, F.date_format(d, "dd-MM-yyyy"))
        .otherwise(F.date_format(d, "MMM d, yyyy"))
    )
    gen = orders.select("o_orderkey", raw.alias("raw"))
    return gen.select("o_orderkey", "raw", parse_messy_date("raw").cast("timestamp").alias("parsed"))


#: q46 percentile ladder, shared between the Spark plan and the oracle.
_Q46_PCTS = (0.25, 0.5, 0.9, 0.99)


@query(
    "q46_approx_percentile_scale_path",
    oracle=f"""
    SELECT g.l_returnflag, CAST(p.pct AS DOUBLE) AS pct, g.n,
           TRUE AS within_1pct
    FROM (SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1) g
    CROSS JOIN (VALUES {', '.join(f'({p})' for p in _Q46_PCTS)}) AS p(pct)
    """,
    description="the 100 TB companion to q37: approx_percentile "
    "(bounded-memory quantile summary, mergeable across partitions) for "
    "the same ladder, exploded to scalar rows. The tolerance-style "
    "oracle: Spark computes BOTH the approximate and the exact "
    "percentile and emits within_1pct; the DuckDB twin asserts TRUE, so "
    "a sketch drifting past 1 percent relative error hash-mismatches. "
    "Group counts are exact and hash-checked on both sides.",
)
def q46_approx_percentile_scale_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    acc = F.lit(10000)
    pct_arr = F.array(*[F.lit(p) for p in _Q46_PCTS])
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.percentile_approx("l_extendedprice", pct_arr, acc).alias("ap"),
        F.percentile("l_extendedprice", pct_arr).alias("ex"),
    )
    z = F.explode(F.arrays_zip(pct_arr.alias("pct"), F.col("ap").alias("a"), F.col("ex").alias("e")))
    return (
        agg.select("l_returnflag", "n", z.alias("z"))
        .select(
            "l_returnflag",
            F.col("z.pct").alias("pct"),
            "n",
            (F.abs(F.col("z.a") - F.col("z.e")) <= 0.01 * F.abs(F.col("z.e"))).alias("within_1pct"),
        )
    )


@query(
    "q47_cascade_delete_audit",
    oracle="""
    WITH victims AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 37 = 0
    ),
    dead_orders AS (
        SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM victims)
    )
    SELECT 'customer' AS entity,
           (SELECT COUNT(*) FROM customer) AS n_before,
           (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM victims)) AS n_after
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM victims))
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM dead_orders))
    """,
    description="right-to-be-forgotten cascade: a deletion list propagates "
    "customer -> orders -> lineitem through broadcast anti-joins (the "
    "deletion list and its order closure broadcast; the fact tables never "
    "shuffle), with before/after row counts as the erasure audit",
)
def q47_cascade_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    victims = customer.filter(F.col("c_custkey") % 37 == 0).select("c_custkey")
    cust_clean = customer.join(F.broadcast(victims), "c_custkey", "left_anti")
    ord_clean = orders.join(
        F.broadcast(victims.select(F.col("c_custkey").alias("o_custkey"))), "o_custkey", "left_anti"
    )
    dead_orders = orders.join(
        F.broadcast(victims.select(F.col("c_custkey").alias("o_custkey"))), "o_custkey"
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    li_clean = lineitem.join(F.broadcast(dead_orders), "l_orderkey", "left_anti")

    def audit(entity: str, before: DataFrame, after: DataFrame) -> DataFrame:
        return before.agg(F.count("*").alias("n_before")).crossJoin(
            after.agg(F.count("*").alias("n_after"))
        ).select(F.lit(entity).alias("entity"), "n_before", "n_after")

    out = audit("customer", customer, cust_clean)
    out = out.unionByName(audit("orders", orders, ord_clean))
    out = out.unionByName(audit("lineitem", lineitem, li_clean))
    return out


@query(
    "q48_gap_filled_daily_revenue",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day, {DSUM('value')} AS day_value,
               COUNT(*) AS n_events
        FROM events GROUP BY 1
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    cal AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
    )
    SELECT CAST(c.day AS TIMESTAMP) AS day,
           COALESCE(d.day_value, 0.0) AS day_value,
           COALESCE(d.n_events, 0) AS n_events,
           d.day IS NULL AS gap_filled
    FROM cal c LEFT JOIN daily d ON c.day = d.day
    """,
    description="time-series gap filling: a generated calendar spine "
    "(sequence over the observed min/max, broadcast - one row per day) "
    "left-joins the daily rollup so missing days appear as explicit "
    "zero-revenue rows with a gap flag",
)
def q48_gap_filled_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        dsum("value").alias("day_value"), F.count("*").alias("n_events")
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    return (
        F.broadcast(cal)
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("day_value", F.lit(0.0)).alias("day_value"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.col("day_value").isNull().alias("gap_filled"),
        )
    )


@query(
    "q49_shuffled_hash_strategy",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           {DSUM('l_extendedprice')} AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o_orderpriority
    """,
    description="deliberate join-strategy control: orders is hinted to "
    "SHUFFLE_HASH - the right call when the build side exceeds the "
    "broadcast threshold but its per-partition slice fits executor "
    "memory, saving both sort passes a sort-merge join would pay at "
    "100 TB (strategy is plan-guarded; the result is strategy-invariant)",
)
def q49_shuffled_hash_strategy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").hint("shuffle_hash")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )


_PR_ITERS = 6
_PR_DAMPING = 0.85
_PR_EDGE_SLICE = 300  # l_orderkey bound: ~1.1k distinct edges at sf0.01


def _pagerank_oracle(iters: int = _PR_ITERS, d: float = _PR_DAMPING) -> str:
    """Unrolled round-for-round DuckDB replay of ``operators.graph
    pagerank`` on the bipartite customer–part graph (the BPE-oracle
    pattern: plain chained CTEs, MATERIALIZED so DuckDB doesn't
    re-inline the chain exponentially; DECIMAL(38,12) partials make
    each round's per-node sum order-independent on both engines)."""
    teleport = 1.0 - d
    sql = [
        f"""
    WITH raw AS (
        SELECT DISTINCT o.o_custkey AS src, l.l_partkey + 1000000000 AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_orderkey < {_PR_EDGE_SLICE}
    ),
    e AS MATERIALIZED (
        SELECT src, dst FROM raw UNION SELECT dst, src FROM raw
    ),
    deg AS MATERIALIZED (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
    r0 AS MATERIALIZED (
        SELECT src AS node, CAST(1.0 AS DOUBLE) / nn.n AS rank
        FROM deg CROSS JOIN nn
    )"""
    ]
    for k in range(iters):
        sql.append(
            f""",
    r{k + 1} AS MATERIALIZED (
        SELECT e.dst AS node,
               CAST({teleport!r} AS DOUBLE) / nn.n
             + CAST({d!r} AS DOUBLE)
               * CAST(SUM(CAST(r.rank / deg.deg AS DECIMAL(38,12))) AS DOUBLE)
                 AS rank
        FROM e
        JOIN r{k} r ON e.src = r.node
        JOIN deg ON e.src = deg.src
        CROSS JOIN nn
        GROUP BY e.dst, nn.n
    )"""
        )
    sql.append(f"\n    SELECT node, rank FROM r{iters}")
    return "".join(sql)


@query(
    "q50_bipartite_pagerank",
    oracle=_pagerank_oracle(),
    description="iterative graph analytics from relational edges: "
    "PageRank over the bipartite customer-part purchase graph "
    "(lineitem x orders slice), 6 rounds of r' = (1-d)/N + "
    "d*sum(r/deg) from the uniform start - vertex-bounded state, one "
    "edges-vs-ranks join + one DECIMAL-partial sum per round, "
    "lineage cut per round (the connected-components discipline), "
    "graph read once. DuckDB replays every round digit-for-digit "
    "from an unrolled MATERIALIZED-CTE chain - the web-graph quality "
    "prior of curation pipelines, on engine-native joins",
)
def q50_bipartite_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auraverse_etl_pipeline_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < _PR_EDGE_SLICE
    )
    orders = load_table(spark, sf_dir, "orders")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_partkey") + 1000000000).alias("dst"),
    )
    return pagerank(edges, iterations=_PR_ITERS, damping=_PR_DAMPING)


@query(
    "q51_conversion_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          AND e.ts <= s2.t2 + INTERVAL 7 DAY
        GROUP BY e.user_id
    ),
    c AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n3
    )
    SELECT 'view' AS stage, n1 AS n_users,
           CAST(n1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS pct_of_start FROM c
    UNION ALL SELECT 'view>click', n2, CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) FROM c
    UNION ALL SELECT 'view>click>purchase', n3,
              CAST(n3 AS DOUBLE) / CAST(n1 AS DOUBLE) FROM c
    """,
    description="strictly-ORDERED conversion funnel with a 7-day "
    "conversion window per step (first view, then first click within "
    "7 days after it, then first purchase within 7 days of that): the "
    "sequential-milestone analysis q22/q24's joins and sessions don't "
    "express - per-stage reach + conversion share, each stage one "
    "user-keyed conditional min over the previous stage's anchor "
    "(user-keyed partial-aggregated shuffles, AQE broadcasts the "
    "shrinking stage tables), exact integers + one ratio",
)
def q51_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("interval 7 days"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("interval 7 days"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
        .crossJoin(s2.agg(F.count(F.lit(1)).cast("bigint").alias("n2")))
        .crossJoin(s3.agg(F.count(F.lit(1)).cast("bigint").alias("n3")))
    )
    row = lambda stage, n: F.struct(  # noqa: E731
        F.lit(stage).alias("stage"),
        F.col(n).alias("n_users"),
        (F.col(n).cast("double") / F.col("n1").cast("double")).alias("pct_of_start"),
    )
    return (
        counts.select(
            F.explode(
                F.array(
                    row("view", "n1"),
                    row("view>click", "n2"),
                    row("view>click>purchase", "n3"),
                )
            ).alias("r")
        ).select("r.*")
    )


@query(
    "q52_duplicate_lineage",
    oracle="""
    WITH RECURSIVE corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 100000, text FROM documents WHERE doc_id < 30
        UNION ALL
        SELECT doc_id + 200000, text FROM documents WHERE doc_id < 15
    ),
    hashed AS (SELECT doc_id, md5(text) AS h FROM corpus),
    pairs AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2
        FROM hashed a JOIN hashed b ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    parent AS (
        SELECT id2 AS id, MAX(id1) AS parent FROM pairs GROUP BY id2
    ),
    walk AS (
        SELECT id, parent AS anc, 1 AS depth FROM parent
        UNION ALL
        SELECT w.id, p.parent, w.depth + 1
        FROM walk w JOIN parent p ON w.anc = p.id
    )
    SELECT id AS doc_id,
           CAST(MIN(anc) AS BIGINT) AS root_id,
           CAST(MAX(depth) AS BIGINT) AS chain_depth
    FROM walk GROUP BY id
    """,
    description="duplicate LINEAGE via a RECURSIVE CTE run natively "
    "on the Spark SQL surface (WITH RECURSIVE landed in Spark 4): "
    "each re-ingested copy gets a single nearest ancestor (max "
    "earlier id among its exact-hash duplicates - a forest, so UNION "
    "ALL recursion terminates), and the walk surfaces every copy's "
    "original root and copy-chain depth - the provenance question an "
    "incremental ingest answers before deleting anything. Fixture "
    "plants 2-deep copy chains; identical semantically-shaped SQL "
    "replayed by DuckDB's recursive CTE",
)
def q52_duplicate_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 150)
    corpus = base.unionByName(
        base.filter(F.col("doc_id") < 30).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    ).unionByName(
        base.filter(F.col("doc_id") < 15).select(
            (F.col("doc_id") + 200000).alias("doc_id"), "text"
        )
    )
    corpus.createOrReplaceTempView("_lineage_corpus")
    return spark.sql(
        """
        WITH RECURSIVE hashed AS (
            SELECT doc_id, md5(text) AS h FROM _lineage_corpus
        ),
        pairs AS (
            SELECT a.doc_id AS id1, b.doc_id AS id2
            FROM hashed a JOIN hashed b ON a.h = b.h AND a.doc_id < b.doc_id
        ),
        parent AS (
            SELECT id2 AS id, MAX(id1) AS parent FROM pairs GROUP BY id2
        ),
        walk AS (
            SELECT id, parent AS anc, 1 AS depth FROM parent
            UNION ALL
            SELECT w.id, p.parent, w.depth + 1
            FROM walk w JOIN parent p ON w.anc = p.id
        )
        SELECT id AS doc_id,
               CAST(MIN(anc) AS BIGINT) AS root_id,
               CAST(MAX(depth) AS BIGINT) AS chain_depth
        FROM walk GROUP BY id
        """
    )


@query(
    "q53_cohort_retention",
    oracle="""
    WITH ev AS (
        SELECT user_id, strftime(CAST(date_trunc('week', ts) AS DATE), '%Y-%m-%d') AS wk FROM events
    ),
    first AS (
        SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY user_id
    ),
    act AS (SELECT DISTINCT user_id, wk FROM ev),
    sizes AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM first GROUP BY cohort_week
    ),
    cells AS (
        SELECT f.cohort_week,
               CAST(date_diff('day', CAST(f.cohort_week AS DATE),
                              CAST(a.wk AS DATE)) // 7 AS BIGINT)
                 AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM act a JOIN first f USING (user_id)
        GROUP BY f.cohort_week, week_offset
    )
    SELECT c.cohort_week, c.week_offset, s.cohort_size, c.n_active,
           CAST(c.n_active AS DOUBLE) / s.cohort_size AS retention
    FROM cells c JOIN sizes s USING (cohort_week)
    """,
    description="weekly cohort retention triangle - the classic "
    "product-analytics matrix: users bucketed by first-activity week, "
    "each later week's active share per cohort. Two fixed-width "
    "aggregates (first-seen, distinct user-weeks) + one broadcast "
    "cohort-size join; at 100 TB the user-week distinct is the only "
    "state and it is user-bounded, not event-bounded",
)
def q53_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd").alias("wk"),
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    act = ev.distinct()
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    cells = (
        act.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk").cast("date"), F.col("cohort_week").cast("date")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "cohort_size",
        "n_active",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
    )


_Q55_SQL_BODY = """
    SELECT s.s_suppkey, s.s_name,
           CAST(s.s_acctbal AS DOUBLE) AS acctbal
    FROM {supplier} s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM {lineitem} l
        WHERE l.l_partkey IN (
            SELECT p.p_partkey FROM {part} p WHERE p.p_brand = 'Brand#1'
        )
        GROUP BY l.l_suppkey
        HAVING CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) > (
            -- scale-free threshold: 1.2x the MEAN per-supplier brand
            -- volume, so selectivity holds at any SF (a fixed share
            -- of the total degenerates as the supplier count grows)
            SELECT 1.2 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                       / CAST(COUNT(DISTINCT l2.l_suppkey) AS DOUBLE)
            FROM {lineitem} l2
            WHERE l2.l_partkey IN (
                SELECT p2.p_partkey FROM {part} p2 WHERE p2.p_brand = 'Brand#1'
            )
        )
    )
      AND EXISTS (
        SELECT 1 FROM {lineitem} lx
        WHERE lx.l_suppkey = s.s_suppkey AND lx.l_discount > 0.05
    )
"""


@query(
    "q55_stock_threshold_suppliers",
    oracle=_Q55_SQL_BODY.format(
        supplier="supplier", lineitem="lineitem", part="part"
    ),
    description="TPC-H Q20-shaped NESTED/CORRELATED subquery ladder: "
    "an IN subquery over a grouped HAVING whose threshold is itself a "
    "SCALAR subquery (share of total brand volume), plus a correlated "
    "EXISTS - the decorrelation surface. Catalyst rewrites the IN to "
    "a left-semi join, the scalar subquery to a broadcast 1-row "
    "aggregate and the correlated EXISTS to a semi join (plan-guarded: "
    "no CartesianProduct, semi joins present), so the declared nested "
    "shape executes as the join DAG a hand-planner would build - the "
    "exact property that makes declarative SQL survive 100 TB. Same "
    "ANSI text runs on DuckDB as the oracle",
)
def q55_stock_threshold_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("supplier", "lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"_q55_{t}")
    return spark.sql(
        _Q55_SQL_BODY.format(
            supplier="_q55_supplier", lineitem="_q55_lineitem", part="_q55_part"
        )
    )
