"""Math function surface.

Two determinism classes:
  * exact ops (abs/ceil/floor, decimal-based rounding) — compared raw;
  * libm-backed ops (ln/power/sqrt) — JVM and DuckDB may differ in the
    last ULP, so results are rounded to 6 dp on BOTH sides.
Rounding itself goes through DECIMAL so HALF_UP semantics match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query


@query(
    "q_math_funcs",
    """
    SELECT o_orderkey,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
           ABS(o_totalprice - 250000) AS dist_mid,
           CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           ROUND(LN(o_totalprice), 6) AS price_ln,
           ROUND(SQRT(o_totalprice), 6) AS price_sqrt,
           ROUND(POWER(o_totalprice, 0.5) + POWER(2.0, 10.0), 6) AS price_pow
    FROM orders
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(p.cast("decimal(18,2)"), 1).cast("double").alias("price_r1"),
        F.abs(p - 250000).alias("dist_mid"),
        F.ceil(p).alias("price_ceil"),
        F.floor(p).alias("price_floor"),
        F.round(F.log(p), 6).alias("price_ln"),
        F.round(F.sqrt(p), 6).alias("price_sqrt"),
        F.round(F.pow(p, 0.5) + F.pow(F.lit(2.0), 10.0), 6).alias("price_pow"),
    )
