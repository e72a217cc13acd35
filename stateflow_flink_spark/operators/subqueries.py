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
from ..numerics import exact_sum, sql_sum
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
