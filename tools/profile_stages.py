#!/usr/bin/env python
"""Per-stage wall-clock attribution for the two worst sweep ratios
(round-7 judge item 2: q_ngram_lm 6.0x, q_dedup_substring 5.7x at 10x).

Each stage is timed against a MATERIALIZED input (localCheckpoint), so
its number is its own operators' cost, not a re-run of the upstream —
the cumulative-prefix approach proved non-monotone under shared-JVM
noise.  One OS process per (query, scale): stress_sweep's isolation
lesson.  Median of 3, warm-up discarded.

    python tools/profile_stages.py [N_BASE]   # default 5000
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_BASE = (
    int(sys.argv[1])
    if len(sys.argv) > 1 and sys.argv[1] != "--worker"
    else 5000
)
SCALE = 10


def _worker(qname: str, sf_dir: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from stateflow_flink_spark.io import load, spread
    from stateflow_flink_spark.operators.curation import _LM_SCALE, grams_all
    from stateflow_flink_spark.operators.dedup import SUBSTR_WINDOW
    from stateflow_flink_spark.plans.registry import load_all_modules
    from stateflow_flink_spark.session import apply_runtime_conf

    load_all_modules()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"profile-{qname}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    apply_runtime_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def time_df(df) -> float:
        ts = []
        df.write.format("noop").mode("overwrite").save()  # warm-up
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[1]

    out: dict[str, float | int] = {}

    if qname == "q_ngram_lm":
        d = spread(load(spark, sf_dir, "documents"), spark)
        bg = d.select("doc_id", F.explode(grams_all(F.col("text"), 2)).alias("g"))
        dg = bg.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("n_dg"))
        out["t_explode_dg"] = time_df(dg)
        dgM = dg.localCheckpoint(eager=True)
        out["rows_dg"] = dgM.count()
        cg = dgM.groupBy("g").agg(F.sum("n_dg").alias("c2"))
        out["t_cg"] = time_df(cg)
        cgM = cg.localCheckpoint(eager=True)
        out["rows_cg"] = cgM.count()
        c1 = cgM.groupBy(
            F.substring_index(F.col("g"), " ", 1).alias("w1")
        ).agg(F.sum("c2").alias("c1"))
        out["t_c1"] = time_df(c1)
        c1M = c1.localCheckpoint(eager=True)
        pg = (
            cgM.withColumn("w1", F.substring_index(F.col("g"), " ", 1))
            .join(c1M, "w1")
            .select("g", F.expr(f"(c2 * {_LM_SCALE}) div c1").alias("p_scaled"))
        )
        scored = dgM.join(pg, "g").select("doc_id", "n_dg", "p_scaled")
        out["t_joins"] = time_df(scored)
        scoredM = scored.localCheckpoint(eager=True)
        full = scoredM.groupBy("doc_id").agg(
            F.sum("n_dg").cast("bigint").alias("n_bigrams"),
            (
                F.sum(F.col("n_dg") * F.col("p_scaled")).cast("double")
                / F.sum("n_dg").cast("double")
                / F.lit(_LM_SCALE)
            ).alias("lm_score"),
        )
        out["t_docagg"] = time_df(full)
    elif qname == "q_dedup_substring":
        d = spread(load(spark, sf_dir, "documents"), spark).withColumn(
            "toks", F.split(F.col("text"), " ")
        )
        toks = F.col("toks")
        starts = F.when(
            F.size(toks) >= SUBSTR_WINDOW,
            F.sequence(F.lit(1), F.size(toks) - (SUBSTR_WINDOW - 1)),
        ).otherwise(F.array().cast("array<int>"))
        w = d.select(
            "doc_id",
            F.explode(
                F.transform(
                    starts,
                    lambda i: F.md5(
                        F.array_join(F.slice(toks, i, SUBSTR_WINDOW), " ")
                    ),
                )
            ).alias("wh"),
        )
        out["t_explode_md5"] = time_df(w)
        wM = w.localCheckpoint(eager=True)
        out["rows_w"] = wM.count()
        wwin = Window.partitionBy("wh")
        flagged = wM.withColumn(
            "is_shared",
            (F.min("doc_id").over(wwin) != F.max("doc_id").over(wwin)).cast(
                "int"
            ),
        )
        out["t_window_flag"] = time_df(flagged)
        flaggedM = flagged.localCheckpoint(eager=True)
        full = (
            flaggedM.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_windows"),
                F.sum("is_shared").cast("long").alias("n_shared_windows"),
            )
            .filter(F.col("n_shared_windows") > 0)
        )
        out["t_docagg"] = time_df(full)
    else:
        sys.exit(f"unknown query {qname}")

    # the un-instrumented end-to-end query, same process
    from stateflow_flink_spark.plans.registry import QUERIES

    out["t_end_to_end"] = time_df(QUERIES[qname](spark, sf_dir))
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    from stress_sweep import gen_corpus

    dirs = {}
    for scale, n in ((1, N_BASE), (SCALE, N_BASE * SCALE)):
        dd = tempfile.mkdtemp(prefix=f"sfs_prof_{scale}x_")
        gen_corpus(dd, n, seed=1234)
        dirs[scale] = dd

    for qname in ("q_ngram_lm", "q_dedup_substring"):
        res = {}
        for scale in (1, SCALE):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 qname, dirs[scale]],
                capture_output=True, text=True, timeout=3600,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            if proc.returncode != 0 or not line.startswith("{"):
                sys.exit(f"worker failed {qname}@{scale}x: {proc.stderr[-600:]}")
            res[scale] = json.loads(line)
        keys = [k for k in res[1] if k.startswith("t_")]
        rows = [k for k in res[1] if k.startswith("rows_")]
        print(f"\n## {qname} isolated-stage timings (s), {N_BASE} vs "
              f"{N_BASE * SCALE} docs")
        print("| stage | 1x s | 10x s | ratio |")
        print("|---|---|---|---|")
        for k in keys:
            r = res[SCALE][k] / res[1][k] if res[1][k] > 0 else float("inf")
            print(f"| {k[2:]} | {res[1][k]:.2f} | {res[SCALE][k]:.2f} "
                  f"| {r:.1f}x |")
        for k in rows:
            print(f"| {k} | {res[1][k]} | {res[SCALE][k]} "
                  f"| {res[SCALE][k] / res[1][k]:.1f}x |")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3])
    else:
        main()
