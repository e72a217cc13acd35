"""Live dataflow cycle — two concurrent streaming queries sharing a topic.

The reference's event loop is a CYCLE through Kafka: the job consumes
``internal`` + ``client_request``, advances each flow one hop, and
produces mid-flow events *back to* ``internal`` — which its own source
re-consumes (``StateFlowFlinkJob.java:47-54`` source, ``:127-132``
internal producer, ``EgressRouter.java:49-63`` the feedback decision).
Structured Streaming cannot express a cycle inside one query, so
SURVEY.md §3.3(a) maps the loop to TWO independent streaming queries
sharing the feedback topic; the topic itself remains the cycle's
buffer, exactly as in the reference.

This module runs that architecture LIVE, broker-free: each "topic" is
a directory of parquet part-files (the sandbox stand-in for Kafka —
``sources/kafka.py`` holds the production ``format("kafka")``
builders; swapping the readers/writers is a two-line change):

  * query A (ingress router, ref R3): streams ``client_request/``,
    stamps flow-cursor columns (route_ingress semantics: EventFlow
    requests go INTERNAL), appends to ``internal/``;
  * query B (flow worker, ref R4+R9+R11+R13): streams ``internal/``,
    advances every flow ONE hop, egress-splits inside ``foreachBatch``
    — finished rows (cursor == RETURN) append to ``client_reply/``,
    continuing rows append BACK to ``internal/``, i.e. into query B's
    own source.  That append is the feedback edge.

Both queries run concurrently on processing-time triggers; a flow with
k remaining hops crosses k micro-batches of query B, one hop per
batch, exactly one reply per flow — the same per-event trajectory the
reference executes through Kafka.

Termination is the driver's concern (the reference's job runs forever;
bounded fixtures need a drain): the loop stops once ``client_reply``
holds one reply per seeded flow, or after an idle timeout.
"""

from __future__ import annotations

import os
import tempfile
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

RETURN_NODE = "RETURN"

# The flow-cursor envelope crossing the topics (the proto Event's
# EventFlow fields, event.proto:49-58, reduced to the cursor columns
# the routing tables read).
FLOW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("steps_left", LongType()),
        StructField("current_node_type", StringType()),
        StructField("n_hops", LongType()),
    ]
)


def default_advance(df: DataFrame) -> DataFrame:
    """One flow hop (the stateful apply of SURVEY §3.3 step 2): burn one
    step, count the hop, move the cursor to RETURN when exhausted."""
    stepped = df.withColumns(
        {
            "steps_left": F.col("steps_left") - 1,
            "n_hops": F.col("n_hops") + 1,
        }
    )
    return stepped.withColumn(
        "current_node_type",
        F.when(F.col("steps_left") <= 0, RETURN_NODE).otherwise("step"),
    )


def run_feedback_loop(
    spark: SparkSession,
    seed: DataFrame,
    advance: Callable[[DataFrame], DataFrame] = default_advance,
    workdir: str | None = None,
    expected_replies: int | None = None,
    timeout_s: float = 120.0,
    trigger_s: str = "250 milliseconds",
) -> DataFrame:
    """Drive ``seed`` flows through the live two-query cycle; return the
    client replies as a DataFrame.

    ``seed`` must match FLOW_SCHEMA minus ``current_node_type``/
    ``n_hops`` (stamped by the ingress router).  ``expected_replies``
    defaults to ``seed.count()`` — the drain condition.
    """
    base = workdir or tempfile.mkdtemp(prefix="sfs_feedback_")
    d_request = os.path.join(base, "client_request")
    d_internal = os.path.join(base, "internal")
    d_reply = os.path.join(base, "client_reply")
    ck_a = os.path.join(base, "ck_a")
    ck_b = os.path.join(base, "ck_b")
    for d in (d_request, d_internal, d_reply):
        os.makedirs(d, exist_ok=True)

    n_expected = expected_replies if expected_replies is not None else seed.count()

    # Seed the request topic (the reference's client producing to
    # client_request) — plain distributed parquet append.
    seed.select("event_id", "steps_left").write.mode("append").parquet(d_request)

    # --- query A: ingress router (client_request -> internal) --------
    requests = (
        spark.readStream.schema(
            StructType(
                [
                    StructField("event_id", LongType()),
                    StructField("steps_left", LongType()),
                ]
            )
        ).parquet(d_request)
    )
    ingress = requests.select(
        "event_id",
        "steps_left",
        F.lit("step").alias("current_node_type"),  # mid-flow => INTERNAL
        F.lit(0).cast("long").alias("n_hops"),
    )
    def to_internal(batch_df: DataFrame, batch_id: int) -> None:
        # Plain distributed append, NOT the streaming parquet sink: a
        # file-sink `_spark_metadata` log in internal/ would make query
        # B's source trust that log alone and never see the feedback
        # appends below — the topic must stay a plain directory.
        batch_df.write.mode("append").parquet(d_internal)

    qa = (
        ingress.writeStream.foreachBatch(to_internal)
        .option("checkpointLocation", ck_a)
        .trigger(processingTime=trigger_s)
        .start()
    )

    # --- query B: flow worker (internal -> advance -> egress split) --
    internal = spark.readStream.schema(FLOW_SCHEMA).parquet(d_internal)

    def egress_split(batch_df: DataFrame, batch_id: int) -> None:
        # One hop per micro-batch; the batch is tiny relative to the
        # cluster, but both writes below are distributed appends.
        hopped = advance(batch_df).localCheckpoint()  # advance ONCE, split twice
        (
            hopped.filter(F.col("current_node_type") == RETURN_NODE)
            .withColumn("reply", F.lit("SuccessfulInvocation"))
            .write.mode("append")
            .parquet(d_reply)
        )
        cont = hopped.filter(F.col("current_node_type") != RETURN_NODE)
        if not cont.isEmpty():
            # THE FEEDBACK EDGE: append into query B's own source dir
            # (the reference's producer back to topic `internal`).
            cont.write.mode("append").parquet(d_internal)

    qb = (
        internal.writeStream.foreachBatch(egress_split)
        .option("checkpointLocation", ck_b)
        .trigger(processingTime=trigger_s)
        .start()
    )

    try:
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            try:
                done = spark.read.parquet(d_reply).count()
            except Exception:  # no part files yet
                done = 0
            if done >= n_expected:
                break
            time.sleep(0.25)
        else:
            raise TimeoutError(
                f"feedback loop drained {done}/{n_expected} within {timeout_s}s"
            )
    finally:
        qa.stop()
        qb.stop()
    return spark.read.parquet(d_reply)
