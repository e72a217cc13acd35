"""Physical-plan gates for the round-11 queries — each pins the ONE
plan property its 100 TB story depends on, so a future refactor that
silently loses it fails here instead of in a driver bench."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from stateflow_flink_spark.plans.registry import QUERIES, load_all_modules

from .conftest import SF_SMOKE

load_all_modules()


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()


def _formatted(spark, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        QUERIES[name](spark, SF_SMOKE).explain("formatted")
    return buf.getvalue()


def test_dedup_incremental_indexed_corpus_side_never_exchanges(spark):
    """The probe must read the PERSISTED index in place: both index
    tables scan bucketed, and no exchange repartitions the corpus on
    the probe key (band, bucket) or the verify key (corpus doc_id) —
    per-crawl cost must not scale with corpus size."""
    plan = _formatted(spark, "q_dedup_incremental_indexed")
    assert plan.count("Bucketed: true") >= 2, "index tables not read bucketed"
    assert "hashpartitioning(band" not in plan, (
        "corpus band table reshuffled on the probe key"
    )
    assert "hashpartitioning(corpus_doc" not in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_dedup_domain_prunes_singleton_buckets(spark):
    """The banding self-join input must be semi-joined against the
    multi-member bucket set (LeftSemi) — the aggregate prune that drops
    the singleton-bucket mass before the shuffle — while the self-join
    still keys on (band, bucket, source)."""
    plan = _plan(spark, "q_dedup_domain")
    assert "LeftSemi" in plan, "singleton-bucket prune missing"
    assert "CartesianProduct" not in plan


def test_mm_chunk_cdc_is_projection_plus_digest_rollup(spark):
    """Content-defined chunking must ride the scan: the boundary fold
    and chunk digests are a pure projection, so the plan has no join
    and shuffles only (media_type, digest) pairs."""
    plan = _plan(spark, "q_mm_chunk_cdc")
    for bad in ("Join", "CartesianProduct", "Window"):
        assert bad not in plan, f"unexpected {bad} in q_mm_chunk_cdc plan"


def test_sim_ann_ivf_indexed_scan_is_partition_pruned(spark):
    """The persisted-IVF probe must read exactly its nprobe cells: the
    index scan carries a static cent_id PartitionFilter (the file index
    lists nprobe of the N_CENTROIDS cell directories, not the corpus) —
    per-probe cost tracks cell occupancy, never corpus size."""
    from stateflow_flink_spark.operators.similarity import N_PROBE_CELLS

    plan = _plan(spark, "q_sim_ann_ivf_indexed")
    scan = plan[plan.index("sfs_ivf_idx"):]
    scan = scan[: scan.index("ReadSchema")]
    assert "PartitionFilters: [cent_id" in scan, "no static partition filter"
    assert f"InMemoryFileIndex({N_PROBE_CELLS} paths)" in scan, (
        "probe scan lists more than nprobe cell directories"
    )


def test_minhash_candidates_prune_singleton_buckets(spark):
    """Same prune discipline on the shared global-LSH candidate path
    (q_dedup_minhash and the fuzzy pipeline both ride it)."""
    plan = _plan(spark, "q_dedup_minhash")
    assert "LeftSemi" in plan, "singleton-bucket prune missing"
    assert "CartesianProduct" not in plan
