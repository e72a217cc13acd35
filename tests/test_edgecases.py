"""Edge-case unit tests on tiny literal frames (SURVEY.md §5.2.2).

The parity suite proves the common case; these pin the degenerate ones:
empty inputs, single-token documents, zero vectors, duplicate keys —
the rows that break naive implementations at 100 TB because they WILL
occur in billions-of-rows data.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from stateflow_flink_spark.operators.dedup import hashed_shingles, shingles
from stateflow_flink_spark.operators.similarity import cosine
from stateflow_flink_spark.operators.skew import salted_count_sum
from stateflow_flink_spark.operators.text import fingerprint, quality_score
from stateflow_flink_spark.streaming.state import fold_fn


def test_shingles_short_doc(spark):
    # docs shorter than n tokens shingle the whole doc (one shingle)
    df = spark.createDataFrame([("a b",), ("a",), ("x y z",)], ["text"])
    out = [r["sh"] for r in df.select(shingles(F.col("text")).alias("sh")).collect()]
    assert out[0] == ["a b"]
    assert out[1] == ["a"]
    assert out[2] == ["x y z"]


def test_hashed_shingles_distinct_and_stable(spark):
    df = spark.createDataFrame([("a b c a b c a b c",)], ["text"])
    h1 = df.select(hashed_shingles(F.col("text")).alias("h")).collect()[0]["h"]
    h2 = df.select(hashed_shingles(F.col("text")).alias("h")).collect()[0]["h"]
    assert h1 == h2  # deterministic across evaluations
    assert len(h1) == len(set(h1))  # distinct


def test_quality_score_single_token(spark):
    # n=1: stop ratio 0 or 1, no division by zero, score stays in [0,1]
    df = spark.createDataFrame([("the",), ("zzzz",)], ["text"])
    scores = [
        r["q"] for r in df.select(quality_score(F.col("text")).alias("q")).collect()
    ]
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_fingerprint_empty_vs_nonempty(spark):
    df = spark.createDataFrame([("hello world",), ("hello worlds",)], ["text"])
    fps = [r["fp"] for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] != fps[1]
    assert all(0 <= fp < 1_000_000_007 for fp in fps)


def test_cosine_zero_vector_is_null_not_crash(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [1.0, 0.0])],
        ["a", "b"],
    )
    out = [r["c"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    # 0/0 division: Spark yields NULL (never an exception or a fake 0.0)
    assert out[0] is None
    assert out[1] == pytest.approx(1.0)


def test_salted_agg_empty_and_duplicate_keys(spark):
    empty = spark.createDataFrame([], "k string, v double, id long")
    assert salted_count_sum(empty, ["k"], "v", salt_on=F.col("id")).count() == 0

    dup = spark.createDataFrame(
        [("a", 1.5, 1), ("a", 2.5, 2), ("a", 1.0, 3), ("b", 0.25, 4)],
        "k string, v double, id long",
    )
    rows = {
        r["k"]: (r["n_rows"], r["sum_value"])
        for r in salted_count_sum(dup, ["k"], "v", salt_on=F.col("id")).collect()
    }
    assert rows == {"a": (3, 5.0), "b": (1, 0.25)}


def test_fold_fn_empty_state_initialization():
    # ref InvokeStatefulLambda.java:75-77 — first touch starts from EMPTY
    out, state = fold_fn(
        {"event_id": 7, "user_id": 1, "value": 2.5, "event_type": "click"}, b""
    )
    assert out["running_n"] == 1 and out["running_sum"] == 2.5
    st = json.loads(state)
    out2, _ = fold_fn(
        {"event_id": 8, "user_id": 1, "value": 0.5, "event_type": "buy"},
        json.dumps(st).encode(),
    )
    assert out2["running_n"] == 2 and out2["running_sum"] == 3.0
