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
from ..numerics import _SCALE, _SCALE_LIT, exact_sum, sql_sum
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


@query(
    "q_join_salted",
    f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           {sql_sum("value")} AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-salted skew join — answer identical to the plain join (the
    oracle), with every hot key spread over SALT_BUCKETS reducers.

    When the hot side is too big to broadcast, a plain shuffle join
    sends ALL rows of a hot key to one reducer.  The salted form
    extends the key: the fact side salts each row by a pure function of
    its row id, the dim side is replicated once per salt value, and the
    join runs on (key, salt) — each hot key now lands on SALT_BUCKETS
    reducers, at the cost of a dim side x SALT_BUCKETS (still tiny).
    AQE's skew-join split covers most cases at runtime; explicit
    salting is the deterministic tool when AQE can't see the skew
    (e.g. skew materializing after a preceding stage) or when the
    target is a stateful/streaming join AQE doesn't replan.  The
    shuffle_hash hint forces the shuffle plan here so the salted
    exchange is visible and gate-able; results are exact because the
    salt is dropped before the final aggregate."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "value")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    e_salted = e.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS)).cast("int")
    )
    c_replicated = c.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1))).alias("_salt")
    )
    joined = e_salted.hint("shuffle_hash").join(
        c_replicated,
        (e_salted["user_id"] == c_replicated["c_custkey"])
        & (e_salted["_salt"] == c_replicated["_salt"]),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum(F.col("value")).alias("sum_value"),
    )
