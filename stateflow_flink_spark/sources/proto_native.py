"""JVM-native protobuf seam — ``from_protobuf``/``to_protobuf``.

The Arrow-batched pandas codec in :mod:`.proto` is the sandbox path: it
is correct and vectorized, but at 100 TB ingest every Kafka value byte
crosses the JVM->Python boundary twice.  Clusters that ship the
``spark-protobuf`` package (``org.apache.spark:spark-protobuf_2.13``)
should decode in the JVM instead: ``from_protobuf(value, "Event",
binaryDescriptorSet=...)`` keeps the whole scan->decode->route pipeline
inside whole-stage codegen.

Spark's API wants a *compiled descriptor set* (normally ``protoc
--descriptor_set_out``).  This container has no protoc and no
``google.protobuf`` runtime — but a FileDescriptorSet is itself just a
proto3 message, and this package already implements the proto3 wire
format (:mod:`.proto`), so :func:`descriptor_set_bytes` hand-encodes
the descriptor for ``event.proto`` (reference
``src/main/resources/event.proto:1-81``) with the same primitives the
event codec uses.  The bytes are what protoc would emit for the
equivalent .proto (field layout per ``google/protobuf/descriptor.proto``,
a stable public schema).

Selection: :func:`from_proto_auto` / :func:`to_proto_auto` use the
native path when ``SPARK_GRAFT_NATIVE_PROTO=1`` (opt-in flag — the jar
cannot be probed cheaply without triggering an analysis error) and the
pandas codec otherwise.  ``tests/test_proto_kafka.py`` exercises the
flag and skips when the jar is absent, so the seam stays compiled-
against even where it cannot run.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import EVENT_ENVELOPE
from .proto import _put_enum, _put_len, _put_str, from_proto, to_proto

_ENVELOPE_COLS = tuple(f.name for f in EVENT_ENVELOPE.fields)

NATIVE_FLAG = "SPARK_GRAFT_NATIVE_PROTO"

# FieldDescriptorProto.type values (descriptor.proto, public)
_T_BOOL = 8
_T_STRING = 9
_T_MESSAGE = 11
_T_BYTES = 12
_T_ENUM = 14
_LABEL_OPTIONAL = 1


def _field(
    name: str,
    number: int,
    ftype: int,
    type_name: str | None = None,
    oneof_index: int | None = None,
) -> bytes:
    """FieldDescriptorProto: name=1, number=3, label=4, type=5,
    type_name=6, oneof_index=9."""
    out = bytearray()
    _put_str(out, 1, name)
    _put_enum(out, 3, number)
    _put_enum(out, 4, _LABEL_OPTIONAL)
    _put_enum(out, 5, ftype)
    if type_name is not None:
        _put_str(out, 6, type_name)
    if oneof_index is not None:
        _put_enum(out, 9, oneof_index)
    return bytes(out)


def _message(name: str, fields: list[bytes], oneofs: list[str] = ()) -> bytes:
    """DescriptorProto: name=1, field=2 (repeated), oneof_decl=8."""
    out = bytearray()
    _put_str(out, 1, name)
    for f in fields:
        _put_len(out, 2, f)
    for o in oneofs:
        decl = bytearray()
        _put_str(decl, 1, o)
        _put_len(out, 8, bytes(decl))
    return bytes(out)


def _enum(name: str, values: list[str]) -> bytes:
    """EnumDescriptorProto: name=1, value=2 (EnumValueDescriptorProto:
    name=1, number=2)."""
    out = bytearray()
    _put_str(out, 1, name)
    for i, v in enumerate(values):
        ev = bytearray()
        _put_str(ev, 1, v)
        # descriptor.proto is proto2 (explicit presence): protoc always
        # serializes the set `number` field, including number=0.
        _put_enum(ev, 2, i)
        _put_len(out, 2, bytes(ev))
    return bytes(out)


def descriptor_set_bytes() -> bytes:
    """FileDescriptorSet for event.proto, semantically equivalent to
    protoc's ``--descriptor_set_out`` for the reference schema
    (event.proto:1-81) — messages FunctionType / FunctionAddress /
    EventFlowNode / Event / Route / EventRequestReply plus the Reply /
    Request / RouteDirection enums.  (Not byte-identical: protoc also
    emits json_name and other optional descriptor fields that parsers
    default identically; every type reference here IS emitted, since
    protobuf-java's FileDescriptor cross-linker validates them all.)"""
    from ..schemas import REPLIES, REQUESTS

    function_type = _message(
        "FunctionType",
        [
            _field("namespace", 1, _T_STRING),
            _field("name", 2, _T_STRING),
            _field("stateful", 3, _T_BOOL),
        ],
    )
    function_address = _message(
        "FunctionAddress",
        [
            _field("fun_type", 1, _T_MESSAGE, ".FunctionType"),
            _field("key", 2, _T_STRING),
        ],
    )
    event_flow_node = _message(
        "EventFlowNode",
        [
            _field("current_fun", 5, _T_MESSAGE, ".FunctionAddress"),
            _field("current_node_type", 6, _T_STRING),
        ],
    )
    event = _message(
        "Event",
        [
            _field("event_id", 1, _T_STRING),
            _field("fun_address", 2, _T_MESSAGE, ".FunctionAddress"),
            _field("request", 3, _T_ENUM, ".Request", oneof_index=0),
            _field("reply", 4, _T_ENUM, ".Reply", oneof_index=0),
            _field("payload", 5, _T_BYTES),
            _field("current", 6, _T_MESSAGE, ".EventFlowNode"),
        ],
        oneofs=["event_type"],
    )
    route = _message(
        "Route",
        [
            _field("direction", 1, _T_ENUM, ".RouteDirection"),
            _field("route_name", 2, _T_STRING),
            _field("key", 3, _T_STRING),
            _field("event_value", 4, _T_MESSAGE, ".Event", oneof_index=0),
            _field("bytes_value", 5, _T_BYTES, oneof_index=0),
        ],
        oneofs=["value"],
    )
    event_request_reply = _message(
        "EventRequestReply",
        [
            _field("event", 1, _T_MESSAGE, ".Event"),
            _field("state", 2, _T_BYTES),
            _field("operator_name", 3, _T_STRING),
        ],
    )

    # FileDescriptorProto: name=1, message_type=4, enum_type=5, syntax=12
    fdp = bytearray()
    _put_str(fdp, 1, "event.proto")
    for m in (
        function_type,
        function_address,
        event_flow_node,
        event,
        route,
        event_request_reply,
    ):
        _put_len(fdp, 4, m)
    _put_len(fdp, 5, _enum("Reply", list(REPLIES)))
    _put_len(fdp, 5, _enum("Request", list(REQUESTS)))
    # Route.direction references ".RouteDirection" (event.proto:60-64);
    # protobuf-java validates every type reference at descriptor build
    # time, so the enum must be present or from_protobuf throws
    # DescriptorValidationException.
    _put_len(fdp, 5, _enum("RouteDirection", ["EGRESS", "INTERNAL", "CLIENT"]))
    _put_str(fdp, 12, "proto3")

    # FileDescriptorSet: file=1 (repeated)
    out = bytearray()
    _put_len(out, 1, bytes(fdp))
    return bytes(out)


def native_enabled() -> bool:
    return os.environ.get(NATIVE_FLAG, "0") == "1"


def from_proto_native(value: Column) -> Column:
    """JVM decode: Kafka value bytes -> flat EVENT_ENVELOPE struct.

    ``from_protobuf`` yields the NESTED Event shape (enums as their
    string names, unset oneof members NULL — same conventions the
    pandas codec flattens to), so one JVM projection maps it onto the
    flat envelope contract every downstream operator shares."""
    from pyspark.sql.protobuf.functions import from_protobuf

    e = from_protobuf(value, "Event", binaryDescriptorSet=descriptor_set_bytes())
    return F.struct(
        e["event_id"].alias("event_id"),
        F.coalesce(e["fun_address"]["fun_type"]["namespace"], F.lit("")).alias(
            "fun_namespace"
        ),
        F.coalesce(e["fun_address"]["fun_type"]["name"], F.lit("")).alias("fun_name"),
        F.coalesce(e["fun_address"]["fun_type"]["stateful"], F.lit(False)).alias(
            "fun_stateful"
        ),
        F.coalesce(e["fun_address"]["key"], F.lit("")).alias("fun_key"),
        e["request"].cast("string").alias("request"),
        e["reply"].cast("string").alias("reply"),
        F.coalesce(e["payload"], F.lit(b"")).alias("payload"),
        F.coalesce(e["current"]["current_fun"]["fun_type"]["namespace"], F.lit(""))
        .alias("current_fun_namespace"),
        F.coalesce(e["current"]["current_fun"]["fun_type"]["name"], F.lit(""))
        .alias("current_fun_name"),
        F.coalesce(e["current"]["current_fun"]["key"], F.lit("")).alias(
            "current_fun_key"
        ),
        F.coalesce(e["current"]["current_node_type"], F.lit("")).alias(
            "current_node_type"
        ),
    )


def to_proto_native(envelope: Column) -> Column:
    """JVM encode: flat EVENT_ENVELOPE struct -> Event wire bytes (the
    inverse projection of :func:`from_proto_native`)."""
    from pyspark.sql.protobuf.functions import to_protobuf

    nested = F.struct(
        envelope["event_id"].alias("event_id"),
        F.struct(
            F.struct(
                envelope["fun_namespace"].alias("namespace"),
                envelope["fun_name"].alias("name"),
                envelope["fun_stateful"].alias("stateful"),
            ).alias("fun_type"),
            envelope["fun_key"].alias("key"),
        ).alias("fun_address"),
        envelope["request"].alias("request"),
        envelope["reply"].alias("reply"),
        envelope["payload"].alias("payload"),
        F.struct(
            F.struct(
                F.struct(
                    envelope["current_fun_namespace"].alias("namespace"),
                    envelope["current_fun_name"].alias("name"),
                    F.lit(False).alias("stateful"),
                ).alias("fun_type"),
                envelope["current_fun_key"].alias("key"),
            ).alias("current_fun"),
            envelope["current_node_type"].alias("current_node_type"),
        ).alias("current"),
    )
    return to_protobuf(nested, "Event", binaryDescriptorSet=descriptor_set_bytes())


def from_proto_auto(value: Column) -> Column:
    """Flag-dispatched decode: JVM when SPARK_GRAFT_NATIVE_PROTO=1,
    Arrow-batched pandas codec otherwise."""
    if native_enabled():
        return from_proto_native(value)
    return from_proto(value)


def to_proto_auto(envelope: Column) -> Column:
    if native_enabled():
        return to_proto_native(envelope)
    return to_proto(envelope)
