"""JSON function surface over events.props."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..io import load
from ..plans.registry import query


@query(
    "q_json_funcs",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           (CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 0) AS k_round
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select(
        "event_id",
        k.alias("k_val"),
        (k % 10 == 0).alias("k_round"),
    )


@query(
    "q_json_schema",
    """
    SELECT event_type,
           COUNT(*) AS n,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def q_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema (the structured path, vs
    get_json_object's per-field extraction)."""
    e = load(spark, sf_dir, "events")
    schema = StructType([StructField("k", LongType())])
    parsed = e.withColumn("j", F.from_json("props", schema))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.col("j.k")).alias("min_k"),
        F.max(F.col("j.k")).alias("max_k"),
    )
