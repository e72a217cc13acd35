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


@query(
    "q_tpch_q6",
    """
    SELECT """ + sql_sum("l_extendedprice * l_discount") + """ AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure filter + global
    aggregate, no join, no grouping key.

    The pushdown showcase: all four predicates reach the parquet reader
    (`PushedFilters` gates in tests), the scan reads 4 columns of 11,
    and the partial aggregate reduces every partition to ONE row — at
    100 TB the exchange moves n_partitions rows total.  Discounts are
    2 dp — the band compare is exact in both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        exact_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_tpch_q4",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS over
    lineitem — planned as a LEFT-SEMI join, so lineitem rows are never
    duplicated into the aggregate (the fixture lacks
    l_commitdate/l_receiptdate; the returnflag predicate keeps the
    same EXISTS structure).

    The date filter prunes orders before the semi-join; the semi-join
    probes with at-most-one-match semantics (no fanout), then a 5-group
    aggregate.  Catalyst rewrites EXISTS to semi automatically via the
    SQL path — exercising that rewrite is the point of this query."""
    _register(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_tpch_q13",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): orders-per-customer histogram
    including zero-order customers via the outer join.

    Two-level aggregate: the first keyed by c_custkey (shuffle on the
    join key — reused straight from the join exchange), the second keyed
    by the tiny c_count domain, where partial aggregation collapses the
    histogram map-side.  COUNT(o_orderkey) counts non-NULLs, preserving
    the zero bucket — the semantic the outer join exists for."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q_tpch_q14",
    """
    SELECT 100.0 * """ + sql_sum(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END"
    ) + """ / """ + sql_sum("l_extendedprice * (1 - l_discount)") + """
        AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional revenue share over one
    month of shipments.

    The month filter cuts lineitem ~60x before the join; part joins on
    its key (broadcast-eligible at fixture scale, shuffle at 100 TB
    where part is 20 GB+).  Both sums ride ONE aggregate pass — the
    CASE lives inside the sum, not in a second scan — and both go
    through the exact-sum twins so the final division is one IEEE op on
    bit-identical operands."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (100.0 * exact_sum(promo) / exact_sum(disc)).alias("promo_revenue_pct")
        )
    )


@query(
    "q_tpch_q19",
    """
    SELECT """ + sql_sum("l_extendedprice * (1 - l_discount)") + """ AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunctive (OR-of-ANDs)
    predicate across both join sides.

    Catalyst splits the disjunction: single-side conjuncts that hold in
    EVERY branch can't be factored here, but it still derives
    `p_brand IN (...)` / quantity-range envelopes as pushable
    implications, and the equi-key join stays a hash join with the OR
    as residual — NOT a cartesian with a filter (plan-gated)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(b1 | b2 | b3).agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
