"""Remote invoker — the network client that drops into the registry
signatures (``StatelessFn`` / ``StatefulFn``) unchanged.

Wire contract = the reference's lambda hop
(``InvokeStatefulLambda.java:79-108``): the request body is JSON
``{"request": base64(EventRequestReply)}`` where EventRequestReply
(event.proto:77-81) carries the event, the opaque state blob and the
operator name; the response is ``{"reply": base64(EventRequestReply)}``
whose state overwrites the operator state and whose event is emitted.
The stateless variant (``InvokeStatelessLambda.java:86-103``) uses the
same framing with no state.

The application-level event rides in ``Event.payload`` as JSON bytes —
payload is opaque to the engine (event.proto:57), exactly how StateFlow
clients ship their arguments.

Timeouts surface as exceptions: under ``invoke_stateless`` they become
per-row ``FailedInvocation`` replies (the ref's error-log-and-drop);
under the stateful processor they fail the attempt and retry with the
micro-batch (the ref, being at-least-once, replays too).
"""

from __future__ import annotations

import base64
import json
import urllib.request

from ..sources.proto import decode_event_request_reply, encode_event_request_reply
from .invoke import CALL_TIMEOUT_S, StatelessFn
from .state import StatefulFn


def _post(url: str, body: bytes, timeout_s: float) -> dict:
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}, method="POST"
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        return json.loads(resp.read())


def _json_default(o):
    """Numpy scalars (what pandas hands mapInPandas) -> native JSON."""
    item = getattr(o, "item", None)
    if callable(item):
        return item()
    return str(o)


def _wrap(event: dict) -> dict:
    """App event dict -> envelope Event with the args as payload JSON."""
    return {
        "event_id": str(event.get("event_id", "")),
        "payload": json.dumps(event, default=_json_default).encode("utf-8"),
    }


def _roundtrip(url: str, event: dict, state: bytes, operator_name: str, timeout_s: float):
    wire = encode_event_request_reply(_wrap(event), state, operator_name)
    body = json.dumps({"request": base64.b64encode(wire).decode("ascii")}).encode()
    reply = _post(url, body, timeout_s)
    out_ev, new_state, _ = decode_event_request_reply(base64.b64decode(reply["reply"]))
    if out_ev is None or not out_ev["payload"]:
        raise ValueError("remote function returned no event payload")
    return json.loads(bytes(out_ev["payload"])), new_state


def http_stateless(url: str, timeout_s: float = CALL_TIMEOUT_S) -> StatelessFn:
    """A ``StatelessFn`` that ships each event to ``url`` — register it
    and ``invoke_stateless`` runs the exact same mapInPandas path it
    runs for in-process functions (that is the claim being proven)."""

    def call(event: dict) -> dict:
        out, _ = _roundtrip(url, event, b"", "", timeout_s)
        return out

    return call


def http_stateful(
    url: str, operator_name: str, timeout_s: float = CALL_TIMEOUT_S
) -> StatefulFn:
    """A ``StatefulFn`` doing the full state round-trip per event: state
    out with the request, overwritten by the state in the reply
    (InvokeStatefulLambda.java:79-84 request build, :105-108 state
    overwrite + emit)."""

    def call(event: dict, state: bytes) -> tuple[dict, bytes]:
        return _roundtrip(url, event, state or b"", operator_name, timeout_s)

    return call
