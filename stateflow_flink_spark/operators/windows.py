"""Window-function operators: rank family, running totals, lag/lead,
ntile, range frames.

Every window here partitions by a key (customer) — at 100 TB the sort
happens within hash partitions, never globally.  Window ORDER BY always
carries a unique tie-break column so results are deterministic, and
windowed float sums use the same decimal-exact trick as aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..numerics import exact_wsum, sql_wsum
from ..plans.registry import query


@query(
    "q_window_rank",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    w_rn = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.row_number().over(w_rn).cast("long").alias("rn"),
    )


@query(
    "q_window_running",
    f"""
    SELECT o_orderkey, o_custkey, o_orderdate,
           {sql_wsum(
               "o_totalprice",
               "OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
           )} AS running_revenue
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = exact_wsum("o_totalprice", w)
    return orders.select(
        "o_orderkey", "o_custkey", "o_orderdate", running.alias("running_revenue")
    )


@query(
    "q_window_lag_lead",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           o_totalprice - LAG(o_totalprice) OVER w AS delta_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    prev = F.lag("o_totalprice").over(w)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - prev).alias("delta_prev"),
    )


@query(
    "q_window_ntile",
    """
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
    FROM customer
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-partitioned ntile is a single-reducer sort — fine for a dim
    table; for facts at scale you'd ntile within partitions or use
    approxQuantile instead."""
    customer = load(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return customer.select(
        "c_custkey", "c_acctbal", F.ntile(4).over(w).cast("long").alias("quartile")
    )


@query(
    "q_window_range_frame",
    f"""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER w AS n_in_range,
           {sql_wsum("o_totalprice", "OVER w")} AS sum_in_range
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC
                 RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) frame: peers are defined by o_totalprice
    distance, not row position — deterministic without a tie-break."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_totalprice"))
        .rangeBetween(-50000, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_in_range"),
        exact_wsum("o_totalprice", w).alias("sum_in_range"),
    )
