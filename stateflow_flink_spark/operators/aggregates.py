"""Aggregation operators: global / grouped / having / distinct / approx /
rollup / cube / grouping sets.

Catalyst plans every groupBy here as partial (map-side) + final hash
aggregate — at 100 TB the partial agg is what keeps the shuffle small,
so none of these queries pre-shuffle or repartition by hand.  Float
sums go through numerics.exact_sum (order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load, spread
from ..numerics import exact_avg, exact_sum, sql_avg, sql_sum
from ..plans.registry import query


@query(
    "q_agg_global",
    f"""
    SELECT {sql_sum("l_quantity")} AS sum_qty,
           {sql_avg("l_extendedprice")} AS avg_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread(load(spark, sf_dir, "lineitem"), spark)
    return li.agg(
        exact_sum("l_quantity").alias("sum_qty"),
        exact_avg("l_extendedprice").alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_agg_groupby",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_sum("l_quantity")} AS sum_qty,
           {sql_sum("l_extendedprice")} AS sum_base_price,
           {sql_sum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
           {sql_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
           {sql_avg("l_quantity")} AS avg_qty,
           {sql_avg("l_extendedprice")} AS avg_price,
           {sql_avg("l_discount")} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the classic partial+final hash aggregate."""
    # spread AFTER the filter: the predicate still pushes into the scan;
    # the exchange above it parallelizes the decimal-exact partial agg
    li = spread(
        load(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
        ),
        spark,
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        exact_sum("l_quantity").alias("sum_qty"),
        exact_sum("l_extendedprice").alias("sum_base_price"),
        exact_sum(disc_price).alias("sum_disc_price"),
        exact_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        exact_avg("l_quantity").alias("avg_qty"),
        exact_avg("l_extendedprice").alias("avg_price"),
        exact_avg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q_agg_having",
    """
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 3
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 3)
    )


@query(
    "q_agg_distinct",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q_agg_approx",
    """
    SELECT COUNT(DISTINCT l_partkey) AS n_parts_exact,
           COUNT(*) AS n_rows,
           TRUE AS hll_within_6pct
    FROM lineitem
    """,
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB substitute for exact
    COUNT(DISTINCT) when a shuffle-heavy exact answer isn't worth it.

    The raw HLL estimate is engine-specific, so the CHECKABLE output is
    the invariant: the exact count plus a boolean asserting the estimate
    landed within 3x the configured 2% relative standard deviation.  A
    broken sketch flips the boolean and the hash compare catches it;
    tests/test_edgecases.py additionally bounds the raw estimate.

    The exact twin exists ONLY to make the invariant hash-checkable at
    fixture scale — at 100 TB you emit the sketch alone.  It is kept off
    the sketch's plan: mixing countDistinct and approx_count_distinct in
    ONE agg makes Catalyst Expand every input row (one copy per distinct
    group), which measured 1.14 s at sf0.1; as two independent partial
    aggregations joined on their 1-row outputs it is 0.44 s, and
    deleting the exact branch recovers the pure-sketch plan without
    touching the sketch's own aggregation."""
    li = load(spark, sf_dir, "lineitem")
    sketch = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct("l_partkey", 0.02).alias("_hll"),
    )
    exact = (
        li.groupBy("l_partkey")
        .agg(F.lit(1))
        .agg(F.count(F.lit(1)).alias("n_parts_exact"))
    )
    return sketch.crossJoin(F.broadcast(exact)).select(
        "n_parts_exact",
        "n_rows",
        (
            F.abs(F.col("_hll") - F.col("n_parts_exact"))
            <= 0.06 * F.col("n_parts_exact")
        ).alias("hll_within_6pct"),
    )


@query(
    "q_rollup",
    f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_cust,
           {sql_sum("c_acctbal")} AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _cust_geo(spark, sf_dir)
    return df.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        exact_sum("c_acctbal").alias("sum_acctbal"),
    )


@query(
    "q_cube",
    f"""
    SELECT c_mktsegment, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_sum("o_totalprice")} AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY CUBE (c_mktsegment, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey)
    return joined.cube("c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum("o_totalprice").alias("sum_price"),
    )


@query(
    "q_grouping_sets",
    f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_cust,
           {sql_sum("c_acctbal")} AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _cust_geo(spark, sf_dir)
    df.createOrReplaceTempView("sfs_cust_geo")
    return spark.sql(
        f"""
        SELECT r_name, n_name,
               COUNT(*) AS n_cust,
               {sql_sum("c_acctbal")} AS sum_acctbal
        FROM sfs_cust_geo
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        """
    )


def _cust_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation ⋈ region with both dims broadcast."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    geo = F.broadcast(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name", "r_name"
        )
    )
    return customer.join(geo, customer.c_nationkey == F.col("n_nationkey")).select(
        "r_name", "n_name", "c_acctbal"
    )


@query(
    "q_agg_percentile",
    """
    SELECT l_returnflag,
           QUANTILE_CONT(l_quantity, 0.5) AS p50_qty,
           QUANTILE_CONT(l_quantity, 0.9) AS p90_qty,
           MEDIAN(l_extendedprice) AS p50_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation at rank (n-1)*p — the
    same definition in Spark `percentile` and DuckDB QUANTILE_CONT, so
    results are bit-identical).  At 100 TB switch to
    `approx_percentile` (t-digest) — exact percentile materializes the
    group; the approx twin is q_agg_approx's pattern."""
    li = spread(load(spark, sf_dir, "lineitem"), spark)
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("p50_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.percentile("l_extendedprice", 0.5).alias("p50_price"),
    )


@query(
    "q_agg_approx_quantile",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS median_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — the mergeable
    quantile estimator that replaces exact percentiles at 100 TB (exact
    needs a per-group sort; GK merges partial sketches map-side).

    Same oracle pattern as q_agg_approx: the raw estimate is
    engine-specific, so the checkable output is the INVARIANT — the
    estimate's rank must sit within the sketch's guaranteed error of
    the true median rank (accuracy=10000 -> rank error <= n/10000 + 1).
    One extra pass counts rows strictly below and at-or-below the
    estimate.  GK bounds the estimate's RANK, not the count of rows at
    or below its VALUE: with duplicated prices at the median, the
    returned value occupies the whole rank interval
    [count_lt + 1, count_le], so the check is interval-intersection
    with [n/2 - tol, n/2 + tol] — robust to ties (a plain
    |count_le - n/2| <= tol check can flip false on legitimate
    estimates when ties straddle the median)."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    est = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("m")
    )
    n = F.count(F.lit(1))
    count_lt = F.sum(F.when(F.col("l_extendedprice") < F.col("m"), 1).otherwise(0))
    count_le = F.sum(F.when(F.col("l_extendedprice") <= F.col("m"), 1).otherwise(0))
    tol = n / 10000 + 1
    return (
        li.join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            n.alias("n_rows"),
            (
                ((count_lt + 1) <= (n / 2 + tol)) & (count_le >= (n / 2 - tol))
            ).alias("median_within_tol"),
        )
    )


@query(
    "q_agg_mode",
    """
    WITH c AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           (MIN({'negn': -n, 't': event_type})).t AS mode_type,
           -(MIN({'negn': -n, 't': event_type})).negn AS n_mode
    FROM c GROUP BY user_id
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal value per group (most frequent event_type per user) as two
    stacked PARTIAL-aggregating hash aggregates — the scale-safe MODE()
    spelling: count per (user, type), then a min-struct argmax over
    (-count, type) so ties break to the lexicographically smallest type
    (same struct-ordering rule both engines, cf. the k-means argmin).
    No window, no sort — a per-user sort-based mode would shuffle every
    event row to its reducer; this shuffles one row per (user, type)."""
    e = load(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    return (
        c.groupBy("user_id")
        .agg(
            F.min(
                F.struct((-F.col("n")).alias("negn"), F.col("event_type").alias("t"))
            ).alias("m")
        )
        .select(
            "user_id",
            F.col("m.t").alias("mode_type"),
            (-F.col("m.negn")).alias("n_mode"),
        )
    )
