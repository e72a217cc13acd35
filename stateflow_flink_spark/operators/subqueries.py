"""Subquery surface + the flagship multiway-join benchmark shape.

These queries run through ``spark.sql`` over registered fixture views —
exercising the SQL entry path and Catalyst's subquery machinery
(correlated scalar subqueries decorrelate into aggregations + joins;
IN-subqueries become left-semi joins).  The DataFrame API queries
elsewhere and these SQL queries compile into the same plan space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..io import load
from ..numerics import exact_avg, exact_sum, sql_avg, sql_sum
from ..plans.registry import query


def _register(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "q_subquery_scalar",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
           """ + sql_sum("l.l_extendedprice") + """ AS sum_price
    FROM lineitem l
    WHERE l.l_quantity * 5 * (SELECT COUNT(*) FROM lineitem i
                              WHERE i.l_partkey = l.l_partkey)
          < (SELECT SUM(i.l_quantity) FROM lineitem i
             WHERE i.l_partkey = l.l_partkey)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below 1/5 of their part's average quantity.

    The predicate is integer-exact (qty * 5 * count < sum of whole-number
    quantities) so both engines agree on every boundary; Catalyst
    decorrelates the two scalar subqueries into one aggregate join."""
    _register(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
               CAST(SUM(CAST(l.l_extendedprice * 1000000 AS DECIMAL(38,0)))
                    AS DOUBLE) / 1000000 AS sum_price
        FROM lineitem l
        WHERE l.l_quantity * 5 * (SELECT COUNT(*) FROM lineitem i
                                  WHERE i.l_partkey = l.l_partkey)
              < (SELECT SUM(i.l_quantity) FROM lineitem i
                 WHERE i.l_partkey = l.l_partkey)
        """
    )


@query(
    "q_subquery_in",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN-subquery — planned as a left-semi join."""
    _register(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        """
    )


@query(
    "q_tpch_q5",
    """
    SELECT n_name, """ + sql_sum("l_extendedprice * (1 - l_discount)") + """ AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (2 broadcast dims + 3 shuffle joins)
    with local-supplier correlation, per-nation revenue.

    Plan shape at scale: region⋈nation broadcast, the fact-side joins
    shuffle on their equi-keys with AQE free to reorder/skew-split."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@query(
    "q_tpch_q10",
    """
    SELECT c_custkey, c_name, n_name,
           """ + sql_sum("l_extendedprice * (1 - l_discount)") + """ AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue.

    customer⋈orders⋈lineitem shuffle on their keys, nation broadcast,
    partial+final agg, then TakeOrderedAndProject — the top-20 never
    sorts the full aggregate globally.  Revenue uses the exact-sum twins
    so the ordering (and the hash) is bit-identical cross-engine."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_tpch_q18",
    """
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           CAST(sum_qty AS BIGINT) AS sum_qty
    FROM (
        SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 50
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    quantity exceeds 250, with their customer, biggest first.

    The HAVING filter runs on the partially-aggregated lineitem side
    BEFORE the joins — at 100 TB the aggregate kills ~98% of orders, so
    the join probes a tiny build side.  Quantities are whole numbers:
    the sum and threshold are integer-exact in both engines."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("qty").cast("long").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@query(
    "q_tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           """ + sql_sum("l_extendedprice") + """ AS sum_base_price,
           """ + sql_sum("l_extendedprice * (1 - l_discount)") + """ AS sum_disc_price,
           """ + sql_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)") + """
               AS sum_charge,
           """ + sql_avg("l_quantity") + """ AS avg_qty,
           """ + sql_avg("l_extendedprice") + """ AS avg_price,
           """ + sql_avg("l_discount") + """ AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report): full-scan aggregate over
    lineitem into 6 groups.

    The canonical map-side-combine showcase: at 100 TB the partial
    HashAggregate reduces each input partition to ≤6 rows before the
    exchange, so the shuffle moves KBs regardless of input size.  All
    money sums go through the exact-sum twins (``numerics``) so the
    doubles are bit-identical across engines and parallelism levels."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            exact_sum("l_extendedprice").alias("sum_base_price"),
            exact_sum(disc_price).alias("sum_disc_price"),
            exact_sum(charge).alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_tpch_q3",
    """
    SELECT l_orderkey,
           """ + sql_sum("l_extendedprice * (1 - l_discount)") + """ AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15'
      AND l_shipdate  > TIMESTAMP '1997-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): top-10 unshipped orders by
    revenue for one market segment.

    The segment filter prunes customer before the join (semi-join-sized
    build side); partial aggregation runs before the final exchange and
    the top-10 is TakeOrderedAndProject, never a global sort.  The
    reference's orders table has no ``o_shippriority`` column, so the
    query carries ``o_orderpriority`` in its place — same grouping
    structure."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
