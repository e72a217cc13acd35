"""Explicit schemas — never inferred (SURVEY.md §1.3).

Two schema families:

  * The ten fixture tables (``/root/testdata/sf*/``) — declared so that
    streaming reads (``readStream`` requires a schema) and tests agree
    with what parquet actually stores (FIXTURES.md §A).
  * The reference's protobuf ``Event`` envelope
    (``/root/reference/src/main/resources/event.proto:49-58``, ``:66-75``)
    re-expressed as a flat StructType.  proto3 ``oneof event_type``
    (``event.proto:52-56``) has no Spark analog, so it is modeled as two
    nullable columns (``request`` / ``reply``) — exactly one non-null on
    a valid event — which is the convention every routing operator in
    :mod:`stateflow_flink_spark.streaming.routing` relies on.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        # Physically TIMESTAMP(MICROS, isAdjustedToUTC=false) -> NTZ.
        # Kept NTZ (no cast in load): a cast would wrap the column and
        # defeat parquet predicate pushdown on date filters.
        StructField("o_orderdate", TimestampNTZType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampNTZType()),  # NTZ, see ORDERS
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# Physical schema of events.parquet: ts is TIMESTAMP(NANOS), which Spark 4
# only reads as INT64 nanos under spark.sql.legacy.parquet.nanosAsLong.
# io.load / sources.stream convert ns -> TimestampType (µs, truncating —
# matching DuckDB's CAST(ts AS TIMESTAMP)).
EVENTS_RAW = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

TABLE_SCHEMAS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TABLE_NAMES = tuple(TABLE_SCHEMAS)

# ---------------------------------------------------------------------------
# Reference Event envelope (event.proto:49-58) — flat convention.
#
#   oneof event_type { Request request; Reply reply; }  (event.proto:52-56)
#     -> nullable `request` + nullable `reply` string columns.
#   FunctionAddress fun_address                          (event.proto:9-12)
#     -> fun_namespace / fun_name / fun_stateful / fun_key; fun_key == ""
#        selects the creation path (IngressRouter.java:55-69).
#   EventFlowNode current                                (event.proto:44-47)
#     -> current_* columns; current_node_type == "RETURN" terminates a
#        flow (IngressRouter.java:79).
# ---------------------------------------------------------------------------

EVENT_ENVELOPE = StructType(
    [
        StructField("event_id", StringType()),
        StructField("fun_namespace", StringType()),
        StructField("fun_name", StringType()),
        StructField("fun_stateful", BooleanType()),
        StructField("fun_key", StringType()),
        StructField("request", StringType()),
        StructField("reply", StringType()),
        StructField("payload", BinaryType()),
        StructField("current_fun_namespace", StringType()),
        StructField("current_fun_name", StringType()),
        StructField("current_fun_key", StringType()),
        StructField("current_node_type", StringType()),
    ]
)

# Request / Reply enum literals (event.proto:27-42 / :14-25).
REQUESTS = (
    "InvokeStateless",
    "InvokeStateful",
    "InitClass",
    "FindClass",
    "GetState",
    "SetState",
    "UpdateState",
    "DeleteState",
    "EventFlow",
    "Ping",
)

REPLIES = (
    "SuccessfulInvocation",
    "SuccessfulCreateClass",
    "FoundClass",
    "KeyNotFound",
    "SuccessfulStateRequest",
    "FailedInvocation",
    "Pong",
)

# Route directions (event.proto:60-64).
EGRESS, INTERNAL, CLIENT = "EGRESS", "INTERNAL", "CLIENT"
