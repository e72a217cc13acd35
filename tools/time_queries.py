#!/usr/bin/env python
"""Targeted per-query timing — the round-13 optimization loop's inner tool.

Same methodology as bench.py (noop sink, cold cache between runs,
median of N) but only for the query names given on argv, so an
optimize→re-measure iteration costs seconds, not a full suite run.

Usage::

    python tools/time_queries.py q_market_basket q_tfidf_cosine_pairs
    PLANS_OUT=plans/r13 PLAN_TAG=before python tools/time_queries.py q_x

With ``PLANS_OUT`` set, also writes ``<PLANS_OUT>/<query>_<PLAN_TAG>.txt``
with the ``explain("formatted")`` output (PLAN_TAG defaults to "plan").
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stateflow_flink_spark.plans.registry import QUERIES, load_all_modules
from stateflow_flink_spark.session import apply_runtime_conf

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    load_all_modules()
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("stateflow-spark-timeq")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    apply_runtime_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def drop_memory_sinks() -> None:
        for t in spark.catalog.listTables():
            if t.isTemporary and t.name.startswith("sfs_"):
                spark.catalog.dropTempView(t.name)
        spark.catalog.clearCache()

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        drop_memory_sinks()
        spark.sparkContext.setJobDescription(None)
        return dt

    # Same warm-ups as bench.py so one-time JVM / Python-worker /
    # streaming-engine costs are not billed to the first target
    # (q_stream_watermark added when a streaming target is present).
    warm = ["q_agg_groupby", "q_udf_scalar", "q_udaf_grouped"]
    if any("stream" in n for n in names):
        warm.append("q_stream_watermark")
    for w in warm:
        run(w)

    plans_out = os.environ.get("PLANS_OUT")
    plan_tag = os.environ.get("PLAN_TAG", "plan")
    out: dict[str, float] = {}
    for name in names:
        try:
            samples = sorted(run(name) for _ in range(RUNS))
        except Exception as exc:  # one broken query must not hide the rest
            print(f"TIMEQ ERROR {name}: {exc}", file=sys.stderr)
            out[name] = -1.0
            continue
        out[name] = round(samples[len(samples) // 2], 3)
        if plans_out:
            import contextlib
            import io as _io

            os.makedirs(plans_out, exist_ok=True)
            df = QUERIES[name](spark, SF_DIR)
            buf = _io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_out, f"{name}_{plan_tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            drop_memory_sinks()
    print(json.dumps({"sf_dir": SF_DIR, "runs": RUNS, "t": out}))
    spark.stop()


if __name__ == "__main__":
    main()
