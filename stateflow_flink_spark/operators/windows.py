"""Window-function operators: rank family, running totals, lag/lead,
ntile, range frames.

Every window here partitions by a key (customer) — at 100 TB the sort
happens within hash partitions, never globally.  Window ORDER BY always
carries a unique tie-break column so results are deterministic, and
windowed float sums use the same decimal-exact trick as aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..io import load
from ..numerics import exact_sum, exact_wsum, sql_sum, sql_wsum
from ..plans.registry import query


@query(
    "q_window_rank",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    w_rn = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.row_number().over(w_rn).cast("long").alias("rn"),
    )


@query(
    "q_window_running",
    f"""
    SELECT o_orderkey, o_custkey, o_orderdate,
           {sql_wsum(
               "o_totalprice",
               "OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC "
               "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
           )} AS running_revenue
    FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = exact_wsum("o_totalprice", w)
    return orders.select(
        "o_orderkey", "o_custkey", "o_orderdate", running.alias("running_revenue")
    )


@query(
    "q_window_lag_lead",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           o_totalprice - LAG(o_totalprice) OVER w AS delta_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    prev = F.lag("o_totalprice").over(w)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - prev).alias("delta_prev"),
    )


@query(
    "q_window_first_last",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           FIRST_VALUE(o_orderkey) OVER w AS top_order,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS bottom_order,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE navigation: per customer,
    the keys of the priciest, cheapest and second-priciest orders on
    every row.  LAST/NTH use the full-partition frame explicitly — the
    default frame stops at CURRENT ROW, the classic LAST_VALUE trap —
    and the ORDER BY carries the unique o_orderkey tie-break (integer
    keys end to end, no float comparisons)."""
    orders = load(spark, sf_dir, "orders")
    ordering = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    w = Window.partitionBy("o_custkey").orderBy(*ordering)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_orderkey").over(w).alias("top_order"),
        F.last("o_orderkey").over(w_full).alias("bottom_order"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_order"),
    )


@query(
    "q_window_ntile",
    """
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
    FROM customer
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NTILE without a single-reducer sort (the naive
    ``Window.orderBy`` spelling funnels the whole table through one
    partition — a scale-killer on a fact table).  Scale-safe two-pass
    plan, the distributed-row-number idiom:

    1. ``repartitionByRange`` on the full sort key — a distributed
       range exchange (boundaries from a sample pass); the sort key is
       total (c_custkey is unique) so ranks are exact regardless of
       where boundaries land.
    2. partition-local ``row_number`` over ``spark_partition_id``.
    3. per-partition counts -> cumulative offsets.  The counts table is
       METADATA-sized (one row per shuffle partition, ~1000 rows on a
       1000-executor cluster), so its single-partition cumsum window is
       free; it then broadcast-joins back.
    4. global_rank = offset + local row_number; the quartile comes from
       NTILE's exact split rule: n = q*k + r -> first r tiles get q+1
       rows, the rest q.

    The ranked table is pinned with an eager ``localCheckpoint`` before
    fan-out: the row-number branch and the counts branch must observe
    the SAME range boundaries, but each re-execution of a
    ``repartitionByRange`` exchange re-samples with a different seed
    (RangePartitioner seeds from the RDD id), so recomputing the
    lineage in two branches could split rows differently and desync
    ``_cnt`` from ``_rn``.  One materialization of the dataset is the
    honest price of an exact distributed rank — ``RDD.zipWithIndex``
    pays the same (count job + mapped pass).
    """
    k = 4
    # prune to the 2 output columns BEFORE the checkpoint materializes
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranged = customer.repartitionByRange(F.desc("c_acctbal"), F.asc("c_custkey"))
    local = (
        ranged.withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_pid").orderBy(
                    F.desc("c_acctbal"), F.asc("c_custkey")
                )
            ),
        )
        .localCheckpoint()
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    wall = Window.orderBy("_pid")  # single partition, but over ~#partitions rows
    offsets = counts.select(
        "_pid",
        F.coalesce(
            F.sum("_cnt").over(wall.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_off"),
        F.sum("_cnt")
        .over(wall.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("_n"),
    )
    rank = F.col("_off") + F.col("_rn")
    q, r = F.col("_n") / k, F.col("_n") % k  # integer division via floor below
    qf = F.floor(q)
    big = r * (qf + 1)  # rows covered by the (q+1)-sized leading tiles
    quartile = (
        F.when(rank <= big, F.floor((rank - 1) / (qf + 1)) + 1)
        .otherwise(r + F.floor((rank - big - 1) / qf) + 1)
        .cast("long")
    )
    return (
        local.join(broadcast(offsets), "_pid")
        .select("c_custkey", "c_acctbal", quartile.alias("quartile"))
    )


@query(
    "q_window_range_frame",
    f"""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER w AS n_in_range,
           {sql_wsum("o_totalprice", "OVER w")} AS sum_in_range
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC
                 RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) frame: peers are defined by o_totalprice
    distance, not row position — deterministic without a tie-break."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_totalprice"))
        .rangeBetween(-50000, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_in_range"),
        exact_wsum("o_totalprice", w).alias("sum_in_range"),
    )


@query(
    "q_window_cume",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC)
    """,
)
def q_window_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions: within-customer percentile position of
    each order.  percent_rank/cume_dist are rank-family — same
    partition-local sort as q_window_rank, no extra pass.  Rounded to
    6 dp: both engines compute (rank-1)/(n-1) in IEEE doubles, and the
    round guards the cross-engine hash against expression-reassociation
    ULPs."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_totalprice"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


_SESSION_GAP_S = 1800  # 30-minute inactivity gap

_SESSIONIZE_ORACLE = f"""
    WITH e AS (
        SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, value, ts,
               CASE WHEN EPOCH_US(ts)
                         - LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)
                         > {_SESSION_GAP_S} * 1000000
                    OR LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM e
    ),
    sess AS (
        SELECT user_id, event_id, value, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_sum("value")} AS total_value
    FROM sess
    GROUP BY user_id, session_no
"""


@query("q_sessionize_batch", _SESSIONIZE_ORACLE)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: gap-based session assignment (30-min
    inactivity boundary) via lag -> running sum of boundary flags, then
    per-session rollup — the batch twin of the streaming session window
    (streaming/sessionization.py), sharing its gap semantics.

    One shuffle keyed by user_id serves BOTH window passes and the
    final groupBy (same partitioning reused across stages); the
    within-partition sort is shared by lag and the running sum.  Session
    value totals use the exact-sum twins."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = e.select(
        "user_id",
        "event_id",
        "value",
        "ts",
        F.when(gap_us.isNull() | (gap_us > _SESSION_GAP_S * 1_000_000), 1)
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        exact_sum("value").alias("total_value"),
    )
