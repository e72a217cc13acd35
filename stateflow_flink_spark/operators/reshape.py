"""Reshape operators: pivot (long→wide) and unpivot/melt (wide→long)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..numerics import exact_sum, sql_sum
from ..plans.registry import query

_STATUSES = ["O", "F", "P"]


@query(
    "q_pivot",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (o_orderstatus = 'P') AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts by priority, pivoted on status.  Explicit pivot
    values — with an unspecified value list Spark runs an extra distinct
    job AND the output schema becomes data-dependent (schema drift at
    100 TB); always pin the columns."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _STATUSES)
    )


@query(
    "q_unpivot",
    f"""
    SELECT measure,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_sum("value")} AS total
    FROM (
        SELECT l_orderkey, measure, value
        FROM lineitem
        UNPIVOT (value FOR measure IN (l_extendedprice, l_discount, l_tax))
    )
    GROUP BY measure
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of three lineitem measures, then per-measure
    totals (exact-decimal sums both sides)."""
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        "l_orderkey",
        ["l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum("value").alias("total"),
    )
