#!/usr/bin/env python
"""Per-query durationMs breakdown for the whole availableNow family (r14).

Registers a StreamingQueryListener, runs each family query via the
registry (same code path bench.py times), and prints per query: wall,
n_batches, and the summed durationMs components across its batches.

Usage: python tools/profile_stream_family.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

from stateflow_flink_spark.plans.registry import QUERIES, load_all_modules
from stateflow_flink_spark.session import apply_runtime_conf

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

FAMILY = [
    "q_stream_watermark", "q_stream_topk", "q_stream_static_join",
    "q_stream_stream_join", "q_stream_stream_left", "q_stream_foreach_batch",
    "q_rollup_incremental", "q_stateful_fold_stream", "q_scd2_stream",
    "q_stream_ewma", "q_stream_hll", "q_stream_anomaly", "q_stream_cdc_apply",
    "q_stream_sessionize", "q_stream_cep", "q_dedup_minhash_stream",
    "q_flow_iterate", "q_invoke_create", "q_stream_file_source",
]


class Collect(StreamingQueryListener):
    def __init__(self) -> None:
        self.events: list[dict] = []

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        self.events.append(p)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or FAMILY
    load_all_modules()
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("stream-family-profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    apply_runtime_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")
    listener = Collect()
    spark.streams.addListener(listener)

    def drop_memory_sinks() -> None:
        for t in spark.catalog.listTables():
            if t.isTemporary and t.name.startswith("sfs_"):
                spark.catalog.dropTempView(t.name)
        spark.catalog.clearCache()

    def run(name: str) -> tuple[float, list[dict]]:
        listener.events.clear()
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        time.sleep(0.3)  # let async listener events drain
        drop_memory_sinks()
        return dt, list(listener.events)

    # warm-ups
    for w in ("q_agg_groupby", "q_udf_scalar", "q_udaf_grouped",
              "q_stream_watermark"):
        run(w)

    for name in names:
        walls = []
        batches: list[dict] = []
        for i in range(3):
            dt, evs = run(name)
            walls.append(dt)
            if i == 1:
                batches = evs
        dur: dict[str, int] = {}
        rows = 0
        for p in batches:
            rows += p.get("numInputRows", 0)
            for k, v in (p.get("durationMs") or {}).items():
                dur[k] = dur.get(k, 0) + v
        walls.sort()
        print(json.dumps({
            "q": name,
            "wall_med": round(walls[1], 3),
            "walls": [round(w, 3) for w in walls],
            "n_batches": len(batches),
            "rows": rows,
            "durationMs": dur,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
