"""Set operations: union all / union distinct / intersect / except.

The reference's only set op is ``DataStream.union``
(``StateFlowFlinkJob.java:101-103``, ``:115-121``) — ``q_union_all`` is
its batch analog (schema-aligned ``unionByName``); the rest are §2B
additions.  INTERSECT / EXCEPT plan as left-semi / left-anti joins over
distinct inputs, so they shuffle once on the full row as key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query


def _halves(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return (
        orders.filter(F.col("o_orderkey") % 2 == 0),
        orders.filter(F.col("o_orderkey") % 2 == 1),
    )


@query(
    "q_union_all",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    even, odd = _halves(spark, sf_dir)
    return even.unionByName(odd)


@query(
    "q_union_distinct",
    """
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return big.unionByName(finished).distinct()


@query(
    "q_intersect",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return building.intersect(rich)


@query(
    "q_except",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT ALL
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return building.exceptAll(rich)
