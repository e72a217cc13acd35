"""Physical-plan gates for the round-9 queries — each pins the ONE
plan property its 100 TB story depends on, so a future refactor that
silently loses it fails here instead of in a driver bench."""

from __future__ import annotations

from stateflow_flink_spark.plans.registry import QUERIES, load_all_modules

from .conftest import SF_SMOKE

load_all_modules()


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()


def test_group_ols_broadcasts_the_dim(spark):
    """The part dim must arrive at the fact scan via broadcast — a
    shuffled dim join would re-partition 100 TB of lineitem for a
    25-brand lookup."""
    plan = _plan(spark, "q_group_ols")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_basket_chi2_broadcasts_scalar_n(spark):
    """The 1-row order-count frame must broadcast into the pair frame
    (BroadcastNestedLoopJoin over a 1-row side), never trigger a
    shuffled cross product."""
    plan = _plan(spark, "q_basket_chi2")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_churn_hazard_pushes_the_type_filter(spark):
    """event_type = 'purchase' must reach the parquet reader: at 100 TB
    this is the difference between scanning one event class and five."""
    plan = _plan(spark, "q_churn_hazard")
    assert "PushedFilters" in plan and "purchase" in plan


def test_gini_window_runs_on_histogram_not_corpus(spark):
    """The single-partition ordered window must consume the
    count-of-counts HISTOGRAM (post-aggregation), never event or user
    rows: both aggregates appear BELOW the window in the plan tree."""
    plan = _plan(spark, "q_gini_concentration")
    win = plan.index("Window")
    # two groupBys (user count, histogram) must both sit under the window
    assert plan[win:].count("HashAggregate") >= 4  # partial+final x 2
    assert "SortMergeJoin" not in plan


def test_seasonal_strength_single_pass_no_join(spark):
    """One corpus pass, zero joins of any kind — the audit is two
    chained aggregates."""
    plan = _plan(spark, "q_seasonal_strength")
    for bad in ("Join", "CartesianProduct", "Window"):
        assert bad not in plan, f"unexpected {bad} in q_seasonal_strength plan"


def test_k_anonymity_single_pass_no_join(spark):
    """Same contract as the seasonal audit: QI census + rollup, no
    joins, no windows."""
    plan = _plan(spark, "q_k_anonymity")
    for bad in ("Join", "CartesianProduct", "Window"):
        assert bad not in plan, f"unexpected {bad} in q_k_anonymity plan"


def test_driver_fronting_list_is_valid():
    """Every name in __spark_entry__._NEVER_DRIVER_SAMPLED must exist in
    the registry (a typo silently drops the query from driver-sampling
    rotation), and queries() must lead with that block in order."""
    import __spark_entry__ as E

    missing = [n for n in E._NEVER_DRIVER_SAMPLED if n not in QUERIES]
    assert not missing, f"fronted-but-unregistered names: {missing}"
    ordered = list(E.queries())
    front = [n for n in E._NEVER_DRIVER_SAMPLED if n in QUERIES]
    assert ordered[: len(front)] == front
