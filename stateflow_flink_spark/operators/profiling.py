"""Data profiling — the one-pass table census a pipeline runs first.

Before a 100 TB corpus is joined, deduped, or split, something has to
answer "which columns are trustworthy": null fractions, cardinalities,
ranges, and value distributions.  Warehouse engines ship this as
ANALYZE/profiling; here it is two declarative queries:

  * `q_profile_columns` — per column of mixed types: (nulls, distinct,
    min, max).  Spelled as one UNION branch per column so Catalyst
    prunes each branch's parquet scan to exactly that column: N
    single-column passes read the same bytes as one N-column pass — the
    columnar-storage identity that makes per-column profiling
    embarrassingly parallel.  Distinct counts are exact two-level
    aggregation at fixture scale; the 100 TB spelling swaps in
    `approx_count_distinct`/HLL per column without touching the shape.
  * `q_histogram` — a fixed-width value histogram (the `width_bucket`
    shape): integer bucket arithmetic shared with the oracle, one
    partial-aggregated groupBy, bucket count bounded by the literal.

Both outputs are LONG format (one row per column / bucket) — the shape
that stays stable when the profiled column list grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query

# (column, cast for min/max reporting) — mixed numeric/string/date
_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")

_PROFILE_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_value,
           CAST(MAX({c}) AS VARCHAR) AS max_value
    FROM lineitem
    """
    for c in _PROFILE_COLS
)


@query("q_profile_columns", _PROFILE_ORACLE)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of lineitem (see module docstring): one row per
    profiled column with null count, exact distinct count, and the
    min/max rendered as strings (the type-erased long format every
    profiling UI consumes)."""
    li = load(spark, sf_dir, "lineitem").select(*_PROFILE_COLS)
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            li.agg(
                F.lit(c).alias("column_name"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_HIST_BUCKETS = 20
_HIST_LO, _HIST_HI = 0.0, 600_000.0  # o_totalprice domain at any sf
_HIST_WIDTH = (_HIST_HI - _HIST_LO) / _HIST_BUCKETS

_HIST_ORACLE = f"""
    SELECT bucket,
           CAST(bucket * {_HIST_WIDTH} AS DOUBLE) AS lo,
           CAST((bucket + 1) * {_HIST_WIDTH} AS DOUBLE) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT LEAST(CAST(FLOOR(o_totalprice / {_HIST_WIDTH}) AS BIGINT),
                     {_HIST_BUCKETS - 1}) AS bucket
        FROM orders
    )
    GROUP BY bucket
"""


@query("q_histogram", _HIST_ORACLE)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of o_totalprice (`width_bucket` shape,
    top bucket clamps the tail): bucket assignment is one integer
    projection riding the scan — floor division by an exactly-
    representable width, identical in both engines — and the count is
    a partial-aggregated groupBy over at most 20 keys, so the exchange
    moves ≤ buckets×partitions rows at any data size."""
    o = load(spark, sf_dir, "orders").select("o_totalprice")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / _HIST_WIDTH).cast("long"),
        F.lit(_HIST_BUCKETS - 1),
    ).alias("bucket")
    return (
        o.select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * _HIST_WIDTH).cast("double").alias("lo"),
            ((F.col("bucket") + 1) * _HIST_WIDTH).cast("double").alias("hi"),
            "n",
        )
    )
