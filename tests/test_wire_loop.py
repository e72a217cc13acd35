"""The production wire path, live: proto-framed Kafka records through
the transport seam (streaming/transport.py + feedback.run_event_loop).

Every byte crossing a topic in these tests is an Event proto framed
exactly like the reference producer (key = event_id UTF-8, value =
Event bytes — KafkaSerializeProto.java:24-30); every read goes through
sources.kafka.decode_frames, every route through streaming.routing.
Swapping DirectoryTransport for KafkaTransport changes no loop code —
that substitution is what test_kafka_transport_format_wiring pins.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from stateflow_flink_spark.io import load
from stateflow_flink_spark.sources.kafka import KAFKA_RECORD, TOPIC_CLIENT_REQUEST
from stateflow_flink_spark.streaming.feedback import (
    make_flow_requests,
    run_event_loop,
)
from stateflow_flink_spark.streaming.transport import (
    DirectoryTransport,
    KafkaTransport,
)

from .conftest import SF_SMOKE


def test_wire_loop_drains_every_flow_exactly_once(spark):
    """Same contract as test_feedback_loop_drains_every_flow_exactly_once
    but over the WIRE path: each flow (event_id % 3 + 1 hops) crosses
    one proto encode/decode per hop and lands exactly one
    SuccessfulInvocation reply."""
    flows = (
        load(spark, SF_SMOKE, "events")
        .select("event_id", (F.col("event_id") % 3 + 1).alias("steps_left"))
        .limit(60)
    )
    n = flows.count()
    seed = make_flow_requests(spark, flows)
    transport = DirectoryTransport(tempfile.mkdtemp(prefix="sfs_wire_"))
    replies = run_event_loop(spark, transport, seed, timeout_s=90.0)
    rows = replies.collect()
    assert len(rows) == n  # exactly one reply per flow
    assert {r.event_id for r in rows} == {
        str(e) for (e,) in flows.select("event_id").collect()
    }
    for r in rows:
        assert r.reply == "SuccessfulInvocation"
        assert r.request is None  # oneof flipped request -> reply
        assert r.current_node_type == "RETURN"
        assert int(r.current_fun_key) == 0  # counter fully burned


def test_wire_loop_ping_answered_from_ingress(spark):
    """Ping never enters the internal topic: the ingress router answers
    Pong directly (IngressRouter.java:42-52) — mixed seed of Pings and
    one-hop flows must yield exactly one reply each, with the right
    oneof member."""
    flows = spark.range(3).select(
        F.col("id").alias("event_id"), F.lit(1).alias("steps_left")
    )
    seed = make_flow_requests(spark, flows)
    pings = seed.limit(0)  # envelope-shaped empty frame, then union rows
    ping_rows = [
        (
            f"ping-{i}", "globals", "ping", False, "", "Ping", None,
            b"", "", "", "", "",
        )
        for i in range(2)
    ]
    pings = spark.createDataFrame(ping_rows, seed.schema)
    transport = DirectoryTransport(tempfile.mkdtemp(prefix="sfs_wire_ping_"))
    replies = run_event_loop(
        spark, transport, seed.unionByName(pings), timeout_s=90.0
    )
    got = {r.event_id: r.reply for r in replies.collect()}
    assert got == {
        "0": "SuccessfulInvocation",
        "1": "SuccessfulInvocation",
        "2": "SuccessfulInvocation",
        "ping-0": "Pong",
        "ping-1": "Pong",
    }
    # Pings never crossed the feedback topic
    internal = transport.read_batch(spark, "internal")
    keys = {bytes(r.key).decode() for r in internal.select("key").collect()}
    assert keys == {"0", "1", "2"}


def test_directory_transport_record_shape_and_key_partitioning(spark):
    """The sandbox transport must produce the exact public Kafka record
    schema and honor the one-key-one-partition contract the loop's
    per-event ordering relies on."""
    transport = DirectoryTransport(tempfile.mkdtemp(prefix="sfs_rec_"), n_partitions=4)
    frames = spark.range(50).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
        F.col("id").cast("string").cast("binary").alias("value"),
        F.lit(TOPIC_CLIENT_REQUEST).alias("topic"),
    )
    transport.append(frames, TOPIC_CLIENT_REQUEST)
    transport.append(frames, TOPIC_CLIENT_REQUEST)  # second producer epoch
    got = transport.read_batch(spark, TOPIC_CLIENT_REQUEST)
    assert got.schema == KAFKA_RECORD
    assert got.count() == 100
    # same key -> same partition, across appends
    assert (
        got.groupBy("key")
        .agg(F.countDistinct("partition").alias("nparts"))
        .filter(F.col("nparts") > 1)
        .count()
        == 0
    )
    # offsets unique within the topic
    assert got.select("offset", "partition").distinct().count() == 100


def test_kafka_transport_format_wiring(spark):
    """KafkaTransport composes the R1 builder and the format('kafka')
    producer.  Without the spark-sql-kafka package the stream reader
    must fail at SOURCE RESOLUTION (proving the format string reaches
    Spark's DataSource lookup, i.e. the wiring is live); with the
    package present it must yield the public Kafka record schema."""
    t = KafkaTransport("localhost:9092")
    try:
        df = t.read_stream(spark, "internal")
    except Exception as e:  # jar absent: resolution error names the format
        assert "kafka" in str(e).lower()
        pytest.skip("spark-sql-kafka package absent (expected in sandbox)")
    assert [f.name for f in df.schema.fields] == [f.name for f in KAFKA_RECORD.fields]
