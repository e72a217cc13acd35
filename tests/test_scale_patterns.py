"""Property tests for the round-4 scale-pattern operators.

Each test pins the algebraic property the operator's correctness rests
on, with randomized inputs (hypothesis) where the property is universal
and a Python reference implementation where the Spark spelling must
match a published definition (Morton codes, PQ argmin, priority keys).
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stateflow_flink_spark.operators.joins import (
    BLOOM_HASHES,
    BLOOM_WORDS,
    bloom_build,
    bloom_might_contain,
)
from stateflow_flink_spark.operators.layout import Z_BITS, _interleave
from stateflow_flink_spark.operators.quantize import PQ_K


# ---------------------------------------------------------------------------
# bloom filter: no false negatives, ever
# ---------------------------------------------------------------------------


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=200,
        unique=True,
    )
)
def test_bloom_never_drops_an_inserted_key(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    bf = bloom_build(df, "k")
    kept = (
        df.join(F.broadcast(bf))
        .filter(bloom_might_contain(F.col("bf"), F.col("k")))
        .count()
    )
    assert kept == len(keys)


# ---------------------------------------------------------------------------
# Morton interleave: matches the textbook bit-spread, preserves locality
# ---------------------------------------------------------------------------


def _morton_ref(a: int, b: int) -> int:
    z = 0
    for i in range(Z_BITS):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**Z_BITS - 1),
            st.integers(min_value=0, max_value=2**Z_BITS - 1),
        ),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
def test_morton_interleave_matches_reference(spark, pairs):
    df = spark.createDataFrame(pairs, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", _interleave(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == _morton_ref(a, b)


def test_morton_is_injective_on_the_domain(spark):
    """Distinct (a, b) pairs must get distinct z — file assignment may
    never merge two different cells."""
    n = 64
    pairs = [(a, b) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(pairs, ["a", "b"])
    distinct_z = (
        df.select(_interleave(F.col("a"), F.col("b")).alias("z"))
        .distinct()
        .count()
    )
    assert distinct_z == n * n


# ---------------------------------------------------------------------------
# PQ packed argmin: decodes to the true (distance, code) lexicographic min
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),  # d2
            st.integers(min_value=0, max_value=PQ_K - 1),  # code_id
        ),
        min_size=1,
        max_size=PQ_K,
    )
)
def test_pq_packed_min_is_lexicographic_argmin(scored):
    packed = min(d2 * PQ_K + c for d2, c in scored)
    want_d2, want_c = min(scored)  # tuple order = (distance, code)
    assert packed // PQ_K == want_d2
    assert packed % PQ_K == want_c


# ---------------------------------------------------------------------------
# priority sampling: key arithmetic is the documented two-division form
# and selection is monotone in weight
# ---------------------------------------------------------------------------


def _py_priority(doc_id: int, w: int) -> float:
    bucket = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 10_000
    return (bucket + 1) / 10_000 / w


def test_priority_matches_python_reference(spark):
    from stateflow_flink_spark.operators.sampling import _BUCKETS, _hash_bucket

    rows = [(i, 10 + 7 * i) for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    u = (_hash_bucket("doc_id") + 1).cast("double") / _BUCKETS
    got = {
        r["doc_id"]: r["p"]
        for r in df.select(
            "doc_id", (u / F.col("n_chars")).alias("p")
        ).collect()
    }
    for i, w in rows:
        assert got[i] == _py_priority(i, w)  # bit-exact, not approx


def test_priority_selection_monotone_in_weight():
    """Raising one row's weight can only improve (lower) its priority —
    the property that makes the sample length-biased by construction."""
    for i in range(20):
        assert _py_priority(i, 500) < _py_priority(i, 50)


# ---------------------------------------------------------------------------
# star-contraction connected components (Kiveris et al., SoCC'14)
# ---------------------------------------------------------------------------


def _union_find_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Reference: classic union-find, canonical label = component min."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_star_contraction_chain_converges_logarithmically(spark):
    """The adversarial case for q_dedup_cluster's label propagation: a
    64-node chain (diameter 63) must converge in at most 2*log2(64)
    alternating rounds, not diameter-many — the property that makes star
    contraction the deep-component escape hatch.  Drives the SAME
    production loop (`_contract_to_star_forest`), not a test-local
    re-implementation that could drift."""
    import math

    from stateflow_flink_spark.operators.dedup import (
        _contract_to_star_forest,
        star_contraction,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    _, rounds, converged = _contract_to_star_forest(edges, max_rounds=24)
    assert converged
    assert rounds <= 2 * int(math.log2(64)), f"took {rounds} rounds"

    labels = star_contraction(edges).collect()
    assert len(labels) == 64
    assert all(r.cluster_id == 0 for r in labels)

    # the non-convergence guard: too few rounds must raise, never emit
    # conflicting labels from a non-star-forest edge list
    with pytest.raises(RuntimeError, match="did not converge"):
        star_contraction(edges, max_rounds=1).collect()


def test_star_contraction_matches_union_find_on_random_graph(spark):
    """Set-exact parity with a Python union-find reference on a seeded
    random graph (~1.3k nodes, ~120 components of mixed shapes) — the
    same contract q_dedup_cluster's oracle checks, but against an
    independent algorithm instead of SQL."""
    import random

    from stateflow_flink_spark.operators.dedup import star_contraction

    rng = random.Random(7)
    nodes = list(range(0, 5000, 3))
    edges = [tuple(rng.sample(nodes, 2)) for _ in range(1200)]
    expect = _union_find_labels(edges)

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.doc_id: r.cluster_id for r in star_contraction(df).collect()}
    assert got == expect
