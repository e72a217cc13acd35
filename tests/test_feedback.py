"""Live two-query dataflow cycle (ref R13 — the Kafka feedback loop,
run broker-free on directory topics).  See streaming/feedback.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from stateflow_flink_spark.io import load
from stateflow_flink_spark.streaming.feedback import run_feedback_loop

from .conftest import SF_SMOKE


def test_feedback_loop_drains_every_flow_exactly_once(spark):
    """Each seeded flow (event_id % 3 + 1 hops) must cross the live
    cycle one micro-batch per hop and land EXACTLY ONE reply with the
    closed-form hop count — the same contract the batch analog
    (q_flow_iterate) proves, now across two concurrent streaming
    queries sharing the internal topic."""
    seed = (
        load(spark, SF_SMOKE, "events")
        .select("event_id", (F.col("event_id") % 3 + 1).alias("steps_left"))
        .limit(120)
    )
    n = seed.count()
    replies = run_feedback_loop(spark, seed, timeout_s=90.0)
    rows = replies.collect()
    assert len(rows) == n  # exactly one reply per flow, none duplicated
    for r in rows:
        assert r.current_node_type == "RETURN"
        assert r.reply == "SuccessfulInvocation"
        assert r.n_hops == r.event_id % 3 + 1, r
        assert r.steps_left == 0
