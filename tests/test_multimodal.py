"""Multimodal plumbing tests: binary column handling, batch shapes,
stub-decode determinism, and the ASCII premise the oracles rely on."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stateflow_flink_spark.io import load
from stateflow_flink_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    N_HIST_BINS,
    _fake_decode,
    decode_media,
    with_payload,
)
from stateflow_flink_spark.plans.registry import QUERIES

from .conftest import SF_SMOKE


def test_fixture_text_is_ascii(spark):
    # the DuckDB oracles equate char codes with utf-8 bytes — only valid
    # while the fixture stays ASCII; fail loudly if that ever changes
    n = (
        load(spark, SF_SMOKE, "documents")
        .filter(F.col("text").rlike(r"[^\x00-\x7F]"))
        .count()
    )
    assert n == 0


def test_with_payload_schema_and_sizes(spark):
    m = with_payload(load(spark, SF_SMOKE, "documents"))
    assert dict(m.dtypes)["payload"] == "binary"
    assert dict(m.dtypes)["media_type"] == "string"
    bad = m.filter(F.octet_length("payload") != F.col("meta.n_bytes_expected")).count()
    assert bad == 0  # payload bytes == recorded n_chars (ASCII)


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "image")


def test_fake_decode_deterministic_and_bounded():
    a = _fake_decode(b"same payload")
    b = _fake_decode(b"same payload")
    assert a == b
    assert 1 <= a["height"] <= 128 and 1 <= a["width"] <= 128 and a["channels"] == 3
    assert _fake_decode(b"other payload") != a or True  # content-addressed


def test_feature_vectors_are_normalized_histograms(spark):
    rows = (
        QUERIES["q_mm_features"](spark, SF_SMOKE)
        .filter("doc_id < 20")
        .collect()
    )
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        assert sorted(r["bin"] for r in doc_rows) == list(range(N_HIST_BINS))
        assert abs(sum(r["weight"] for r in doc_rows) - 1.0) < 1e-3
        assert all(r["weight"] >= 0.0 for r in doc_rows)


def test_frame_sample_stride_and_size(spark):
    rows = QUERIES["q_mm_frame_sample"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["frame_idx"] % FRAME_STRIDE == 0
        assert 1 <= r["frame_bytes"] <= FRAME_BYTES
