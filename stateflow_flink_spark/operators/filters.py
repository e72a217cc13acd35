"""Projection / filter / predicate operators (SURVEY.md §2B).

All predicates here are Catalyst-pushable: ``q_filter_pred``'s whole
conjunction reaches the parquet reader as ``PushedFilters`` and the
computed projections stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query


@query(
    "q_filter_pred",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 15
      AND l_discount > 0.05
      AND l_returnflag <> 'A'
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(5, 15)
        & (F.col("l_discount") > 0.05)
        & (F.col("l_returnflag") != "A")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "q_project_expr",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row double arithmetic is IEEE-deterministic, so no decimal
    widening is needed here (unlike aggregates — see numerics.py)."""
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charged"),
    )


@query(
    "q_case_when",
    """
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_totalprice < 100000 THEN 'S'
                WHEN o_totalprice < 300000 THEN 'M'
                ELSE 'L' END AS bucket
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "S")
        .when(F.col("o_totalprice") < 300000, "M")
        .otherwise("L")
    )
    return orders.select("o_orderkey", "o_totalprice", bucket.alias("bucket"))
