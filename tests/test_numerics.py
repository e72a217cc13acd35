"""Property tests for the cross-engine exact-aggregation contract.

``numerics.exact_sum`` is the engine's answer to "float SUM is not
associative": scale to integers, sum exactly, convert once.  These
tests pin the two properties everything downstream leans on:

  * PERMUTATION/PARTITION INDEPENDENCE — any ordering or partitioning
    of the rows yields the same double, bit for bit (this is what makes
    `= MAX(...)`, HAVING cuts, and the driver's value-hash stable);
  * DUCKDB AGREEMENT — the `sql_sum` twin evaluates to the identical
    double on the identical rows.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from stateflow_flink_spark.numerics import exact_sum, sql_sum

# values with <= 4 decimal places — the contract's domain (prices are
# 2 dp, three-factor products <= 6 dp)
_vals = st.lists(
    st.integers(min_value=-10_000_000, max_value=10_000_000).map(
        lambda n: n / 10_000.0
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=15, deadline=None)
@given(_vals, st.randoms())
def test_exact_sum_is_permutation_and_partition_independent(spark, vals, rnd):
    shuffled = list(vals)
    rnd.shuffle(shuffled)
    outs = []
    for data, parts in ((vals, 1), (shuffled, 1), (vals, 7), (shuffled, 13)):
        df = spark.createDataFrame([(v,) for v in data], "x double").repartition(
            parts
        )
        outs.append(df.agg(exact_sum("x").alias("s")).collect()[0].s)
    assert len({repr(o) for o in outs}) == 1, outs


@settings(max_examples=15, deadline=None)
@given(_vals)
def test_exact_sum_matches_duckdb_twin_bitwise(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(exact_sum("x").alias("s")).collect()[0].s
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    want = con.execute(f"SELECT {sql_sum('x')} AS s FROM t").fetchone()[0]
    con.close()
    assert repr(got) == repr(want), (got, want)


# ---------------------------------------------------------------------------
# Invoke-latency histogram (streaming/metrics.py) — merge algebra
# ---------------------------------------------------------------------------


def _hist_of(samples_ms):
    from bisect import bisect_left

    from stateflow_flink_spark.streaming.metrics import BUCKET_BOUNDS_MS, _zero

    h = _zero()
    for ms in samples_ms:
        h["count"] += 1
        h["total_ms"] += ms
        h["max_ms"] = max(h["max_ms"], ms)
        h["buckets"][bisect_left(BUCKET_BOUNDS_MS, ms)] += 1
    return h


@given(
    st.lists(st.floats(min_value=0.0, max_value=10_000.0, allow_nan=False), max_size=40),
    st.lists(st.floats(min_value=0.0, max_value=10_000.0, allow_nan=False), max_size=40),
    st.lists(st.floats(min_value=0.0, max_value=10_000.0, allow_nan=False), max_size=40),
)
def test_latency_hist_merge_is_associative_and_exact(a, b, c):
    """Accumulator merges must be order-insensitive (Spark merges task
    copies in arbitrary order) and lossless: any merge tree equals the
    histogram of the concatenated samples."""
    import math

    from stateflow_flink_spark.streaming.metrics import _LatencyHistParam

    p = _LatencyHistParam()

    def merge(x, y):
        import copy

        return p.addInPlace(copy.deepcopy(x), copy.deepcopy(y))

    left = merge(merge(_hist_of(a), _hist_of(b)), _hist_of(c))
    right = merge(_hist_of(a), merge(_hist_of(b), _hist_of(c)))
    direct = _hist_of(a + b + c)
    for got in (left, right):
        assert got["count"] == direct["count"]
        assert got["buckets"] == direct["buckets"]
        assert got["max_ms"] == direct["max_ms"]
        assert math.isclose(got["total_ms"], direct["total_ms"], rel_tol=1e-9, abs_tol=1e-9)


def test_latency_snapshot_percentile_bounds_cover_samples():
    """p50/p99 upper bounds from cumulative buckets must dominate the
    true sample percentiles (bucket bound >= any sample in or below
    that bucket)."""
    from stateflow_flink_spark.streaming.metrics import BUCKET_BOUNDS_MS

    samples = [0.3, 0.7, 1.5, 3.0, 9.9, 40.0, 220.0, 220.0, 900.0, 4000.0]
    h = _hist_of(samples)
    # replicate snapshot()'s cumulative walk
    for q in (0.5, 0.99):
        target, cum, bound = q * h["count"], 0, None
        for i, cnt in enumerate(h["buckets"]):
            cum += cnt
            if cum >= target and cnt:
                bound = BUCKET_BOUNDS_MS[i] if i < len(BUCKET_BOUNDS_MS) else float("inf")
                break
        srt = sorted(samples)
        true_p = srt[min(len(srt) - 1, max(0, int(q * len(srt)) - 1))]
        assert bound >= true_p
