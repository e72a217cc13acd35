"""Streaming progress observables — per-batch throughput, state size and
watermark-drop counts, read from Structured Streaming's own progress
telemetry.

Reference parity note: the reference's only shipped metric is the
per-invoke latency histogram (see ``metrics.py``); everything here is
the Spark-native operational surface a production deployment watches
alongside it — batch durations (the throughput denominator), rows/sec,
state-store size (the R9 ValueState growth curve) and
``numRowsDroppedByWatermark`` (the late-data loss the reference, running
processing-time-only per ``StateFlowFlinkJob.java:69``, can't even see).

Shape: plain dict extraction from ``StreamingQuery.recentProgress`` —
no listener thread, no extra work on the hot path; the engine already
computed every number.  Call ``collect_progress(query)`` after (or
between) batches.  A ``StreamingQueryListener`` variant would push the
same dicts; pull keeps the bounded ``availableNow`` runs used everywhere
in this repo deterministic.
"""

from __future__ import annotations

from typing import Any


def _batch_row(p: dict) -> dict:
    """One progress event → flat metrics row."""
    dur = p.get("durationMs") or {}
    states = p.get("stateOperators") or []
    return {
        "batch_id": p.get("batchId"),
        "num_input_rows": p.get("numInputRows", 0),
        "rows_per_sec": p.get("processedRowsPerSecond", 0.0),
        "batch_duration_ms": dur.get("triggerExecution"),
        "state_rows": sum(s.get("numRowsTotal", 0) for s in states),
        "state_bytes": sum(s.get("memoryUsedBytes", 0) for s in states),
        "rows_dropped_by_watermark": sum(
            s.get("numRowsDroppedByWatermark", 0) for s in states
        ),
        "watermark": p.get("eventTime", {}).get("watermark"),
    }


def collect_progress(query: Any) -> list[dict]:
    """All retained progress events of a (finished or running)
    StreamingQuery as flat metric rows, oldest first."""
    import json

    rows = []
    for raw in query.recentProgress:
        p = raw if isinstance(raw, dict) else json.loads(raw.json)
        rows.append(_batch_row(p))
    return rows


def progress_summary(query: Any) -> dict:
    """Roll the batch rows up to the numbers a dashboard keys on."""
    rows = collect_progress(query)
    n = len(rows)
    total_rows = sum(r["num_input_rows"] for r in rows)
    total_ms = sum(r["batch_duration_ms"] or 0 for r in rows)
    return {
        "n_batches": n,
        "total_input_rows": total_rows,
        "total_batch_ms": total_ms,
        "rows_per_sec": (total_rows / (total_ms / 1000.0)) if total_ms else 0.0,
        "max_state_rows": max((r["state_rows"] for r in rows), default=0),
        "rows_dropped_by_watermark": sum(
            r["rows_dropped_by_watermark"] for r in rows
        ),
    }
