"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``stateflow_flink_spark``; this module only
re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stateflow_flink_spark.io import SMOKE_SF_DIR
from stateflow_flink_spark.plans.registry import ORACLE, QUERIES, load_all_modules
from stateflow_flink_spark.session import apply_runtime_conf


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3 shape) on /root/testdata/sf0.001."""
    load_all_modules()
    apply_runtime_conf(spark)
    return QUERIES["q_join_multiway"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    load_all_modules()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted → rows-only check)."""
    load_all_modules()
    return dict(ORACLE)
