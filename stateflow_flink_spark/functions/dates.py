"""Date/time function surface.

Types are aligned with DuckDB explicitly (year() is INT in Spark,
BIGINT in DuckDB — we widen Spark side) so the driver's schema/value
hash agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query


@query(
    "q_date_funcs",
    """
    SELECT o_orderkey,
           YEAR(o_orderdate) AS o_year,
           MONTH(o_orderdate) AS o_month,
           QUARTER(o_orderdate) AS o_quarter,
           DATE_TRUNC('month', o_orderdate) AS month_start,
           DATEDIFF('day', o_orderdate, TIMESTAMP '2000-01-01') AS days_to_y2k
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
    )
