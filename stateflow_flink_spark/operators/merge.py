"""MERGE / upsert semantics as a relational composition.

The lakehouse `MERGE INTO target USING source ON key WHEN MATCHED
UPDATE / WHEN NOT MATCHED INSERT` decomposes into one FULL OUTER join
plus per-branch projections — exactly what Delta/Iceberg execute under
the hood (minus their file-level transaction log, which is storage, not
query semantics).  Expressing it relationally keeps Catalyst in charge:
the join shuffles both sides once on the merge key, every branch is a
projection over the join output, and AQE handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..numerics import exact_sum, sql_sum
from ..plans.registry import query

# Changes whose delta exceeds this migrate to a NEW surrogate key —
# giving the fixture a non-empty INSERT branch (every o_custkey already
# exists in customer, so a plain key join would only ever UPDATE).
_INSERT_DELTA = 400_000.0
_KEY_SHIFT = 1_000_000

_MERGE_ORACLE = f"""
    WITH changes AS (
        SELECT CASE WHEN delta > {_INSERT_DELTA}
                    THEN o_custkey + {_KEY_SHIFT} ELSE o_custkey END AS key,
               delta
        FROM (
            SELECT o_custkey, {sql_sum("o_totalprice")} AS delta
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '2000-01-01'
            GROUP BY o_custkey
        )
    )
    SELECT COALESCE(c.c_custkey, ch.key) AS key,
           COALESCE(c.c_name, 'NEW') AS name,
           COALESCE(c.c_acctbal, 0.0) + COALESCE(ch.delta, 0.0) AS acctbal,
           CASE WHEN ch.key IS NULL THEN 'keep'
                WHEN c.c_custkey IS NULL THEN 'insert'
                ELSE 'update' END AS op
    FROM customer c
    FULL OUTER JOIN changes ch ON c.c_custkey = ch.key
"""


@query("q_merge_upsert", _MERGE_ORACLE)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO customer USING aggregated-order deltas: matched rows
    update their balance, unmatched source rows insert, untouched
    target rows pass through — one full-outer join, three projections.

    Scale shape: source aggregates BEFORE the merge join (partial agg
    on o_custkey), so the join probes one row per changed key; both
    sides shuffle once on the merge key.  The delta is an exact-sum
    (numerics twins) and the +/COALESCE arithmetic is one IEEE add on
    bit-identical operands, so the merged balances hash-match
    cross-engine."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    changes = (
        o.groupBy("o_custkey")
        .agg(exact_sum("o_totalprice").alias("delta"))
        .select(
            F.when(
                F.col("delta") > _INSERT_DELTA, F.col("o_custkey") + _KEY_SHIFT
            )
            .otherwise(F.col("o_custkey"))
            .alias("key"),
            "delta",
        )
    )
    merged = c.join(changes, F.col("c_custkey") == F.col("key"), "full_outer")
    return merged.select(
        F.coalesce(F.col("c_custkey"), F.col("key")).alias("key"),
        F.coalesce(F.col("c_name"), F.lit("NEW")).alias("name"),
        (
            F.coalesce(F.col("c_acctbal"), F.lit(0.0))
            + F.coalesce(F.col("delta"), F.lit(0.0))
        ).alias("acctbal"),
        F.when(F.col("key").isNull(), "keep")
        .when(F.col("c_custkey").isNull(), "insert")
        .otherwise("update")
        .alias("op"),
    )


# ---------------------------------------------------------------------------
# SCD Type-2 history build (CDC change tracking)
# ---------------------------------------------------------------------------

# Kimball's open-row sentinel: current versions carry a far-future
# valid_to instead of NULL, so BETWEEN probes need no null branch (and
# the cross-engine value-hash never sees a null timestamp).  2200-01-01
# rather than the classic 9999-12-31 because pandas datetime64[ns] —
# the driver's toPandas dtype — overflows past 2262.
_SCD2_HIGH_DATE = "2200-01-01 00:00:00"

# Both windows order by (ts, event_id) — the change row's event_id
# rides along so equal-timestamp changes keep a TOTAL order in both
# engines (and in the streaming twin, which sorts the same way).
_SCD2_ORACLE = f"""
    WITH ordered AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
               LAG(event_type) OVER
                   (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                   AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           COALESCE(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    TIMESTAMP '{_SCD2_HIGH_DATE}') AS valid_to,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS version,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               AS is_current
    FROM changes
"""


@query("q_scd2_track", _SCD2_ORACLE)
def q_scd2_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 from a change stream (Kimball's
    warehouse pattern; the batch shape of a CDC pipeline): collapse
    each user's event_type sequence into validity intervals —
    consecutive repeats merge, every change opens a new version row
    with [valid_from, valid_to) stamped by LEAD, and the open-ended row
    is flagged current.

    Scale shape: both windows share ONE hash-partitioning on user_id
    (Catalyst plans a single exchange + sort for the whole query); the
    change-point filter runs before the second window, so the history
    frame LEAD/ROW_NUMBER sorts only surviving change rows.  Ordering
    inside a key is (ts, event_id) — total, so replays and engine
    differences cannot reorder equal-timestamp events."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    order = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(order))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "event_type", "ts", "event_id")
    )
    hist = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.coalesce(
            F.lead("ts").over(hist),
            F.lit(_SCD2_HIGH_DATE).cast("timestamp"),
        ).alias("valid_to"),
        F.row_number().over(hist).alias("version"),
        F.lead("ts").over(hist).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Point-in-time (temporal) join — enrich facts against SCD2 intervals
# ---------------------------------------------------------------------------

_PIT_ORACLE = f"""
    WITH dim AS ({_SCD2_ORACLE}),
    facts AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.ts,
           d.event_type AS state_type, d.version,
           d.valid_from
    FROM facts f
    JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from AND f.ts < d.valid_to
"""


@query("q_join_temporal", _PIT_ORACLE)
def q_join_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment — THE feature-store join: each purchase
    fact picks up the SCD2 dimension version active at its timestamp
    (valid_from <= ts < valid_to, half-open so version handoffs never
    double-match).  The dimension is q_scd2_track's output reused
    wholesale (Spark plan and oracle CTE alike — version semantics
    defined once, the q_knn_eval composition discipline).

    This differs from q_join_asof (nearest earlier row) in contract:
    the interval join is EXACT against versioned validity — a fact
    before the first version matches nothing, a fact during a
    zero-width clamped interval matches nothing, and is_current never
    leaks future state into past facts.

    Scale shape: an equi-join on user_id with the interval predicate as
    a post-join filter — Catalyst plans one hash-partitioned join where
    the per-key fan-out is versions-per-user (small by construction:
    versions only exist at change points).  No range-bin machinery
    needed because the equality key already co-locates; contrast
    q_join_range, where there is no equi key and binning IS the plan."""
    from ..plans.registry import QUERIES

    dim = QUERIES["q_scd2_track"](spark, sf_dir)
    facts = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
    )
    return (
        facts.join(
            dim.select(
                "user_id",
                F.col("event_type").alias("state_type"),
                "version",
                "valid_from",
                "valid_to",
            ),
            ["user_id"],
        )
        .filter((F.col("ts") >= F.col("valid_from")) & (F.col("ts") < F.col("valid_to")))
        .select("event_id", "user_id", "ts", "state_type", "version", "valid_from")
    )


# ---------------------------------------------------------------------------
# CDC MERGE with tombstones — the delete branch q_merge_upsert lacks
# ---------------------------------------------------------------------------

_CDC_CUTOFF = "2024-01-16 00:00:00"
_CDC_END = "2024-01-17 00:00:00"  # one day of changes: all four branches fire
_CDC_INSERT_CENTS = 10_000  # high-value upserts migrate to a NEW key
_CDC_KEY_SHIFT = 100_000

_CDC_ORACLE = f"""
    WITH base AS (
        SELECT user_id,
               SUM(CAST(CAST(value * 100 AS DECIMAL(38,0)) AS BIGINT))
                   AS bal_cents
        FROM events
        WHERE event_type = 'purchase'
          AND CAST(ts AS TIMESTAMP) < TIMESTAMP '{_CDC_CUTOFF}'
        GROUP BY user_id
    ),
    oplog AS (
        SELECT user_id,
               CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
               CAST(CAST(value * 100 AS DECIMAL(38,0)) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                           event_id DESC) AS rn
        FROM events
        WHERE event_type IN ('purchase', 'error')
          AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '{_CDC_CUTOFF}'
          AND CAST(ts AS TIMESTAMP) < TIMESTAMP '{_CDC_END}'
    ),
    changes AS (
        SELECT CASE WHEN op = 'u' AND cents > {_CDC_INSERT_CENTS}
                    THEN user_id + {_CDC_KEY_SHIFT} ELSE user_id END AS user_id,
               op, cents
        FROM oplog WHERE rn = 1
    ),
    merged AS (
        SELECT COALESCE(b.user_id, c.user_id) AS key,
               COALESCE(b.bal_cents, 0) + CASE WHEN c.op = 'u'
                                               THEN c.cents ELSE 0 END
                   AS cents,
               CASE WHEN c.user_id IS NULL THEN 'keep'
                    WHEN c.op = 'd' THEN 'delete'
                    WHEN b.user_id IS NULL THEN 'insert'
                    ELSE 'update' END AS op
        FROM base b FULL OUTER JOIN changes c USING (user_id)
    )
    SELECT key, CAST(cents AS DOUBLE) / 100 AS balance, op
    FROM merged
    WHERE op <> 'delete'
"""


@query("q_merge_cdc_delete", _CDC_ORACLE)
def q_merge_cdc_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CDC MERGE: a change log with UPSERTS AND TOMBSTONES applied
    to a base table — WHEN MATCHED AND op='d' THEN DELETE / WHEN
    MATCHED THEN UPDATE / WHEN NOT MATCHED AND op<>'d' THEN INSERT —
    the Debezium→lakehouse apply step q_merge_upsert (update/insert
    only) cannot express.  Base = per-user purchase balances before the
    cutoff; change = each user's LATEST post-cutoff op ('error' is the
    tombstone), last-writer-wins on the total (ts, event_id) order.
    High-value upserts migrate to a shifted surrogate key (the
    q_merge_upsert trick) so the INSERT branch is live in the fixture;
    a one-day change window keeps KEEP and DELETE populated too.

    Deletes are observable as absent keys; survivors carry the branch
    label so the oracle checks which clause fired for every row.

    Scale shape: the op log compacts to one row per key BEFORE the
    merge (row_number over the user-keyed change window — CDC readers
    do exactly this compaction), then ONE full-outer hash join on the
    merge key; every branch is a projection over the join output.
    Balances stay in integer cents end to end."""
    e = load(spark, sf_dir, "events")
    cutoff = F.lit(_CDC_CUTOFF).cast("timestamp")
    cents = (F.col("value") * 100).cast("decimal(38,0)").cast("bigint")
    base = (
        e.filter((F.col("event_type") == "purchase") & (F.col("ts") < cutoff))
        .groupBy("user_id")
        .agg(F.sum(cents).alias("bal_cents"))
    )
    end = F.lit(_CDC_END).cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    changes = (
        e.filter(
            F.col("event_type").isin("purchase", "error")
            & (F.col("ts") >= cutoff)
            & (F.col("ts") < end)
        )
        .select(
            "user_id",
            F.when(F.col("event_type") == "error", "d").otherwise("u").alias("op"),
            cents.alias("cents"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.when(
                (F.col("op") == "u") & (F.col("cents") > _CDC_INSERT_CENTS),
                F.col("user_id") + _CDC_KEY_SHIFT,
            )
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            "op",
            "cents",
        )
    )
    b = base.alias("b")
    c = changes.alias("c")
    merged = b.join(c, "user_id", "full_outer").select(
        F.col("user_id").alias("key"),
        (
            F.coalesce(F.col("bal_cents"), F.lit(0))
            + F.when(F.col("op") == "u", F.col("cents")).otherwise(F.lit(0))
        ).alias("cents"),
        F.when(F.col("op").isNull(), "keep")
        .when(F.col("op") == "d", "delete")
        .when(F.col("bal_cents").isNull(), "insert")
        .otherwise("update")
        .alias("op"),
    )
    return merged.filter(F.col("op") != "delete").select(
        "key",
        (F.col("cents").cast("double") / 100).alias("balance"),
        "op",
    )
