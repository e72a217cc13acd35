"""Sort / limit / top-k operators.

Scale note: ``q_topk`` must plan as ``TakeOrderedAndProject`` (per-
partition heap + merge of k rows on the driver), never a global sort —
that is the difference between O(k) and O(n log n) network at 100 TB.
The driver's value-hash is order-insensitive, but LIMIT changes the row
SET, so every limit here carries a total tie-break order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query


@query(
    "q_orderby_multi",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
    FROM lineitem
    ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)
def q_orderby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
        .orderBy(
            F.asc("l_returnflag"),
            F.desc("l_extendedprice"),
            F.asc("l_orderkey"),
            F.asc("l_linenumber"),
        )
        .limit(100)
    )


@query(
    "q_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )
