"""Semantic tests for the corpus-curation operators (operators/curation.py)
and batch sessionization (operators/windows.py) — planted-case checks that
the oracle-parity sweep can't express.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stateflow_flink_spark.operators.curation import (
    _EMAIL_RE,
    _PHONE_RE,
    grams_all,
)
from stateflow_flink_spark.plans.registry import QUERIES, load_all_modules

from .conftest import SF_SMOKE

load_all_modules()


def test_grams_all_preserves_duplicates(spark):
    df = spark.createDataFrame([("a b a b a",)], ["text"])
    [row] = df.select(grams_all(F.col("text"), 2).alias("g")).collect()
    assert row.g == ["a b", "b a", "a b", "b a"]


def test_grams_all_short_doc_whole_doc(spark):
    # doc shorter than n: one gram covering the available tokens
    df = spark.createDataFrame([("hello world",)], ["text"])
    [row] = df.select(grams_all(F.col("text"), 5).alias("g")).collect()
    assert row.g == ["hello world"]


def test_pii_patterns_redact_planted_strings(spark):
    df = spark.createDataFrame(
        [("contact bob <bob.smith@corp.io> or call +1-555-0123 now",)], ["s"]
    )
    [row] = df.select(
        F.regexp_replace(
            F.regexp_replace(F.col("s"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("out")
    ).collect()
    assert row.out == "contact bob <<EMAIL>> or call <PHONE> now"


def test_decontaminate_plants_known_duplicate(spark):
    # doc 0 (eval, 0 % 50 == 0) has near-dups in the fixture corpus; any
    # reported doc must be a non-eval doc with a sane overlap fraction
    out = QUERIES["q_decontaminate"](spark, SF_SMOKE).collect()
    for r in out:
        assert r.doc_id % 50 != 0
        assert 0 < r.n_overlap
        assert 0 < r.overlap_frac <= 1.0


def test_quality_repetition_verdict_consistency(spark):
    out = QUERIES["q_quality_repetition"](spark, SF_SMOKE).collect()
    assert len(out) > 0
    for r in out:
        assert 0 < r.distinct_frac <= 1.0
        assert 0 < r.top_bigram_frac <= 1.0
        expected = r.distinct_frac < 0.40 or r.top_bigram_frac > 0.05
        assert r.flagged == expected


def test_sessionize_sessions_disjoint_and_gapped(spark):
    rows = QUERIES["q_sessionize_batch"](spark, SF_SMOKE).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        assert r.session_start <= r.session_end
        assert r.n_events >= 1
        by_user.setdefault(r.user_id, []).append(r)
    for sess in by_user.values():
        sess.sort(key=lambda r: r.session_no)
        for a, b in zip(sess, sess[1:]):
            # consecutive sessions are separated by more than the 30-min gap
            assert (b.session_start - a.session_end).total_seconds() > 1800


def test_inverted_index_df_bounded_by_tf(spark):
    out = QUERIES["q_inverted_index"](spark, SF_SMOKE).collect()
    assert len(out) > 0
    for r in out:
        assert 1 <= r.df <= r.tf


def test_kmeans_clusters_bounded_and_seeds_stay_home(spark):
    out = QUERIES["q_cluster_kmeans"](spark, SF_SMOKE).collect()
    assert len(out) > 0
    clusters = {r.cluster for r in out}
    assert len(clusters) <= 8
    for r in out:
        assert r.dist >= 0.0


def test_cms_overestimate_is_one_sided(spark):
    out = QUERIES["q_cms_heavy_hitters"](spark, SF_SMOKE).collect()
    assert len(out) > 0
    for r in out:
        assert r.overestimate >= 0, f"{r.token}: CMS must never undercount"
        assert r.cms_est >= r.true_n >= 1


def test_cogroup_funnel_counts_bounded(spark):
    out = QUERIES["q_cogroup_funnel"](spark, SF_SMOKE).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_clicks_before >= 0
        assert r.first_purchase is not None


def test_merge_upsert_branch_consistency(spark):
    rows = QUERIES["q_merge_upsert"](spark, SF_SMOKE).collect()
    ops = {r.op for r in rows}
    assert "keep" in ops and "update" in ops
    for r in rows:
        if r.op == "insert":
            assert r.name == "NEW" and r.key >= 1_000_000
        else:
            assert r.key < 1_000_000


def test_mix_token_budget_invariants(spark):
    """Fertility-weighted budget arithmetic: per-language targets spend
    (to rounding) the whole subword budget, epochs re-derive from the
    target, and fertility matches the two counts it divides."""
    from .conftest import SF_SMOKE

    rows = QUERIES["q_mix_token_budget"](spark, SF_SMOKE).collect()
    assert rows
    budget = sum(r.n_subwords for r in rows)
    # weights are 6-dp-rounded so the allocation is budget +/- |langs| ulps
    assert abs(sum(r.target_subwords for r in rows) - budget) <= len(rows)
    for r in rows:
        # target is rounded to an integer AFTER epochs is computed from
        # the unrounded product, so they agree to half a subword
        assert r.epochs == pytest.approx(
            r.target_subwords / r.n_subwords, abs=0.5 / r.n_subwords + 1e-6
        )
        assert r.fertility == pytest.approx(r.n_subwords / r.n_words, abs=1e-6)
        assert r.fertility >= 1.0  # every word yields >= 1 subword on ascii text


def test_dedup_incremental_indexed_equals_recompute(spark):
    """The persisted-index probe must return EXACTLY the recompute
    spelling's verdicts — same keys, same match counts, same best
    scores (they already share one oracle; this pins Spark-vs-Spark
    without DuckDB in the loop)."""
    from .conftest import SF_SMOKE

    a = {
        r.doc_id: (r.n_matches, r.best_jaccard, r.keep)
        for r in QUERIES["q_dedup_incremental"](spark, SF_SMOKE).collect()
    }
    b = {
        r.doc_id: (r.n_matches, r.best_jaccard, r.keep)
        for r in QUERIES["q_dedup_incremental_indexed"](spark, SF_SMOKE).collect()
    }
    assert a == b and len(a) > 0
