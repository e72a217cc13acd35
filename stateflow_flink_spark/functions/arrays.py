"""Array / higher-order function surface over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query


@query(
    "q_array_funcs",
    """
    SELECT doc_id,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark') AS has_spark,
           STRING_SPLIT(text, ' ')[1] AS first_token,
           STRING_SPLIT(text, ' ')[-1] AS last_token,
           LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_distinct_tokens
    FROM documents
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
    )
