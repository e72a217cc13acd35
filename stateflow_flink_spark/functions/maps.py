"""Map function surface.

Spark side builds a real MapType (map_from_entries over sorted
aggregated pairs) and extracts with element_at; the oracle expresses
the same result relationally (maps themselves don't hash portably
across engines, extracted scalars do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query


@query(
    "q_map_funcs",
    """
    SELECT COUNT(*) FILTER (event_type = 'click')    AS n_click,
           COUNT(*) FILTER (event_type = 'error')    AS n_error,
           COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
           COUNT(DISTINCT event_type)                AS n_types
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    # Build one map<event_type, n> then extract — exercises
    # map_from_entries / element_at / map_keys on a real MapType.
    as_map = counts.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return as_map.select(
        F.element_at("m", "click").alias("n_click"),
        F.element_at("m", "error").alias("n_error"),
        F.element_at("m", "purchase").alias("n_purchase"),
        F.size(F.map_keys(F.col("m"))).cast("long").alias("n_types"),
    )
