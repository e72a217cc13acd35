#!/usr/bin/env python
"""Where does the per-query availableNow cost go? (r14, VERDICT item 3)

Runs one representative streaming query N times and prints, per run:
  - wall: total run wall-clock (same number bench.py times)
  - plan: QUERIES[name]() call (stage copy + DataFrame build)
  - start: .start() latency (stream init, checkpoint dir creation)
  - await: awaitTermination (micro-batch execution + commit)
  - read: reading the memory-sink table back + noop write
plus the engine's own durationMs breakdown from the progress events
(triggerExecution = addBatch + getBatch + latestOffset + queryPlanning +
walCommit + commitOffsets + ...), which attributes the await time.

Usage: python tools/profile_stream_floor.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from stateflow_flink_spark.session import apply_runtime_conf, stream_partitions
from stateflow_flink_spark.streaming.state import stream_events_dir

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("stream-floor-profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    apply_runtime_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def one_run(tag: str) -> dict:
        t0 = time.perf_counter()
        events, _stage = stream_events_dir(spark, SF_DIR)
        counts = (
            events.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "n_events")
        )
        t1 = time.perf_counter()
        with stream_partitions(spark):
            qy = (
                counts.writeStream.format("memory")
                .queryName(f"sfs_prof_{tag}")
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            t2 = time.perf_counter()
            qy.awaitTermination()
            t3 = time.perf_counter()
        progress = [json.loads(p.json) for p in qy.recentProgress]
        df = spark.table(f"sfs_prof_{tag}")
        df.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        spark.catalog.dropTempView(f"sfs_prof_{tag}")
        dur_keys: dict[str, int] = {}
        for p in progress:
            for k, v in (p.get("durationMs") or {}).items():
                dur_keys[k] = dur_keys.get(k, 0) + v
        return {
            "wall": round(t4 - t0, 3),
            "plan": round(t1 - t0, 3),
            "start": round(t2 - t1, 3),
            "await": round(t3 - t2, 3),
            "read": round(t4 - t3, 3),
            "n_batches": len(progress),
            "durationMs": dur_keys,
        }

    for i in range(RUNS):
        print(json.dumps(one_run(f"r{i}")))
    spark.stop()


if __name__ == "__main__":
    main()
