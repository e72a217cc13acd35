"""Skew-safe aggregation: two-stage salted groupBy.

A low-cardinality or Zipf-skewed key (event types, hot users, stop
tokens) funnels most rows of a shuffle into a few reducers — at 100 TB
one straggler partition stalls the stage.  AQE's skew-join splitting
covers joins; for AGGREGATIONS the classic fix is salting: extend the
group key with a salt, pre-aggregate (key, salt) — spreading each hot
key over `buckets` reducers — then aggregate the partial results by the
real key.  The rewrite is exact for any commutative-associative
aggregate; the engine's scaled-decimal sums (`numerics.exact_sum`) stay
bit-identical because integer sums reassociate freely.

Spark's map-side partial aggregation already fights skew for simple
plans; explicit salting is the tool when partials can't combine enough
(many distinct secondary keys per hot key, or memory-bounded partial
maps).  The helper is generic; `q_agg_salted` pins its semantics
against the plain-groupBy oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..numerics import _SCALE, _SCALE_LIT, sql_sum
from ..plans.registry import query

SALT_BUCKETS = 32


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    value: Column | str,
    salt_on: Column | str,
    buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """count(*) + exact sum(value) per key, skew-spread over `buckets`.

    `salt_on` must be a column expression with per-row variety (a row id,
    an event id) — the salt is a pure function of it, so results are
    deterministic across retries and runs."""
    value = F.col(value) if isinstance(value, str) else value
    salt = F.pmod(F.xxhash64(salt_on), F.lit(buckets)).alias("_salt")
    scaled = (value * _SCALE).cast("decimal(38,0)")
    partial = df.select(*keys, salt.alias("_salt"), scaled.alias("_scaled")).groupBy(
        *keys, "_salt"
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_scaled").alias("_sum"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n_rows"),
        (F.sum("_sum").cast("double") / _SCALE).alias("sum_value"),
    )


@query(
    "q_agg_salted",
    f"""
    SELECT event_type,
           COUNT(*) AS n_rows,
           {sql_sum("value")} AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregate over the few-valued `event_type` key —
    answer identical to a plain groupBy (the oracle), plan skew-proof."""
    e = load(spark, sf_dir, "events")
    return salted_count_sum(
        e, ["event_type"], F.col("value"), salt_on=F.col("event_id")
    )
