"""String function surface — all JVM built-ins, zero Python UDFs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query


@query(
    "q_string_funcs",
    """
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           SUBSTRING(c_name, 10, 9) AS name_digits,
           CONCAT(c_mktsegment, ':', c_name) AS seg_name,
           LENGTH(c_name) AS name_len,
           TRIM(c_mktsegment) AS seg_trim,
           (c_name LIKE '%00001%') AS like_1,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits
    FROM customer
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 10, 9).alias("name_digits"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("seg_name"),
        F.length("c_name").cast("long").alias("name_len"),
        F.trim(F.col("c_mktsegment")).alias("seg_trim"),
        F.col("c_name").like("%00001%").alias("like_1"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
    )


@query(
    "q_string_distance",
    """
    SELECT p_partkey,
           LEVENSHTEIN(p_brand, p_type) AS brand_type_dist,
           LEVENSHTEIN(p_type, 'PROMO BURNISHED COPPER') AS type_dist
    FROM part
    """,
)
def q_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance functions (fuzzy matching building block — entity
    resolution joins prefilter with cheap distances before anything
    quadratic)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").cast("long").alias("brand_type_dist"),
        F.levenshtein("p_type", F.lit("PROMO BURNISHED COPPER")).cast("long").alias(
            "type_dist"
        ),
    )
