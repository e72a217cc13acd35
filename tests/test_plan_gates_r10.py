"""Physical-plan gates for the round-10 queries — each pins the ONE
plan property its 100 TB story depends on, so a future refactor that
silently loses it fails here instead of in a driver bench."""

from __future__ import annotations

import re

from stateflow_flink_spark.plans.registry import QUERIES, load_all_modules

from .conftest import SF_SMOKE

load_all_modules()


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()


def test_quality_classifier_is_pure_projection(spark):
    """The hashed-feature scorer must ride the scan: zero exchanges,
    zero joins, zero windows — its whole 100 TB value is being the
    free filter pass before anything that shuffles."""
    plan = _plan(spark, "q_quality_classifier")
    for bad in ("Exchange", "Join", "Window", "CartesianProduct"):
        assert bad not in plan, f"unexpected {bad} in q_quality_classifier plan"


def test_domain_cap_window_runs_on_histogram_not_corpus(spark):
    """The per-source ordered window must consume the (source, score)
    HISTOGRAM (post-aggregation), never document rows — a whale domain
    contributes its distinct score levels, not its doc count."""
    plan = _plan(spark, "q_domain_cap")
    win = plan.index("Window")
    # the histogram aggregate (partial+final) sits under the window
    assert plan[win:].count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_dedup_domain_bands_are_keyed_by_source(spark):
    """The LSH banding join must carry the source domain IN ITS EQUI-KEY
    (bucket never spans domains) — source as a post-join filter would
    re-admit the cross-domain candidate mass the query exists to
    avoid."""
    plan = _plan(spark, "q_dedup_domain")
    assert re.search(
        r"Join \[band#\d+, bucket#\d+L?, source#\d+\]", plan
    ), "banding join does not key on (band, bucket, source)"
    assert "CartesianProduct" not in plan


def test_pipeline_fuzzy_dedup_prunes_before_shingling(spark):
    """The fuzzy stage must run on the quality+exact SURVIVORS: the
    final census joins the deduped frame anti-wise against cluster
    non-canonicals, and no stage degenerates to a cross product."""
    plan = _plan(spark, "q_pipeline_fuzzy_dedup")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_quality_ensemble_is_pure_projection(spark):
    """Three filters folded into one pass must still ride the scan:
    zero exchanges, joins, windows — otherwise the ensemble costs more
    than running its members separately."""
    plan = _plan(spark, "q_quality_ensemble")
    for bad in ("Exchange", "Join", "Window", "CartesianProduct"):
        assert bad not in plan, f"unexpected {bad} in q_quality_ensemble plan"


def test_dedup_incremental_candidates_are_bucketed(spark):
    """The batch-vs-corpus candidate join must be the (band, bucket)
    equi-join — a cross product or an unbanded join would re-admit the
    |batch| x |corpus| pair space the incremental design exists to
    avoid."""
    plan = _plan(spark, "q_dedup_incremental")
    assert re.search(r"Join \[band#\d+, bucket#\d+L?\]", plan), (
        "candidate join does not key on (band, bucket)"
    )
    assert "CartesianProduct" not in plan


def test_mm_dedup_queries_shuffle_digests_not_payloads(spark):
    """Both media-dedup censuses must shuffle 32-byte digests, never
    asset bytes, and neither needs a join of any kind."""
    for name in ("q_mm_dedup_exact", "q_mm_chunk_dedup"):
        plan = _plan(spark, name)
        for bad in ("Join", "CartesianProduct"):
            assert bad not in plan, f"unexpected {bad} in {name} plan"


def test_tokenizer_fertility_is_single_rollup(spark):
    """Per-doc token counts ride the scan; the only structure is the
    |langs|-keyed aggregate — no joins, no windows."""
    plan = _plan(spark, "q_tokenizer_fertility")
    for bad in ("Join", "Window", "CartesianProduct"):
        assert bad not in plan, f"unexpected {bad} in q_tokenizer_fertility plan"


def test_contamination_report_broadcasts_eval_grams(spark):
    """The eval gram set must arrive at the corpus probe via broadcast
    (eval suites are MBs, the corpus is TBs) — a shuffled gram join
    would re-partition the whole corpus's grams."""
    plan = _plan(spark, "q_contamination_report")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
