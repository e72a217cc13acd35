"""Complex-event-processing pattern matching over keyed event streams.

The MATCH_RECOGNIZE / Flink-CEP capability re-expressed relationally:
find, per user, every occurrence of the funnel pattern

    view  click*  purchase        (restart-on-view, reset on anything else)

i.e. a purchase completes a match iff the NEAREST preceding non-click
event of the same user is a view; every event strictly between is then
a click by construction.  This "last non-click before" formulation is
exactly the NFA with restart-on-view semantics (a fresh view abandons a
pending match and starts a new one; signup/error/purchase reset to
idle), so the same definition drives the batch query, the DuckDB
oracle, and the keyed-state streaming twin
(streaming/cep.py::q_stream_cep) — one semantics, three engines.

Reference parity: the reference routes events into keyed stateful
lambdas (InvokeStatefulLambda.java:75-109) where exactly this kind of
per-key sequence logic lives; here the batch form needs no state at
all — one LOCF window per user partition.

Scale shape: a single user-keyed window sort (one exchange, one sort —
the attribution/LOCF discipline from operators/analytics.py) computes
the last-non-click struct for every event; matches are a filter over
that projection.  No self-join, no explode, per-user cost linear in
that user's events.  At 100 TB the only shuffle is the user-keyed
exchange every per-user sequence op shares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query

_CEP_ORACLE = """
    WITH numbered AS (
        SELECT user_id, event_id, event_type,
               EPOCH_US(CAST(ts AS TIMESTAMP)) AS us,
               ROW_NUMBER() OVER
                   (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                   AS rn
        FROM events
    ),
    carried AS (
        SELECT user_id, event_id, event_type, us, rn,
               LAST_VALUE(CASE WHEN event_type <> 'click' THEN event_type END
                          IGNORE NULLS) OVER w AS nc_type,
               LAST_VALUE(CASE WHEN event_type <> 'click' THEN event_id END
                          IGNORE NULLS) OVER w AS nc_id,
               LAST_VALUE(CASE WHEN event_type <> 'click' THEN rn END
                          IGNORE NULLS) OVER w AS nc_rn,
               LAST_VALUE(CASE WHEN event_type <> 'click' THEN us END
                          IGNORE NULLS) OVER w AS nc_us
        FROM numbered
        WINDOW w AS (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id,
           nc_id AS start_event_id,
           event_id AS end_event_id,
           CAST(rn - nc_rn - 1 AS BIGINT) AS n_clicks,
           CAST(us - nc_us AS BIGINT) AS span_us
    FROM carried
    WHERE event_type = 'purchase' AND nc_type = 'view'
"""


@query("q_cep_pattern", _CEP_ORACLE)
def q_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every `view click* purchase` match per user (see module
    docstring): one LOCF window carries the last non-click event
    (type, id, position, time) to each row; a purchase whose carried
    type is `view` IS a match, with the click count and wall-clock span
    read off the carried position/time.  Single window sort, zero
    joins."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    nc = F.when(
        F.col("event_type") != "click",
        F.struct(
            F.col("event_type").alias("t"),
            F.col("event_id").alias("id"),
            F.col("rn").alias("rn"),
            F.unix_micros(F.col("ts")).alias("us"),
        ),
    )
    carried = e.withColumn("rn", F.row_number().over(w)).select(
        "user_id",
        "event_id",
        "event_type",
        "rn",
        F.unix_micros(F.col("ts")).alias("us"),
        F.last(nc, ignorenulls=True).over(prior).alias("nc"),
    )
    return carried.filter(
        (F.col("event_type") == "purchase") & (F.col("nc.t") == "view")
    ).select(
        "user_id",
        F.col("nc.id").alias("start_event_id"),
        F.col("event_id").alias("end_event_id"),
        (F.col("rn") - F.col("nc.rn") - 1).cast("bigint").alias("n_clicks"),
        (F.col("us") - F.col("nc.us")).cast("bigint").alias("span_us"),
    )
