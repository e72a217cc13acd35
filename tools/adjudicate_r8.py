#!/usr/bin/env python
"""Adjudicate the r8 driver-bench 18-query >2x cluster (round-8 judge
item 1).

The r8 driver bench read every q_tpch_* shape plus q_triplet_mining /
q_udaf_grouped / q_udtf_explode / q_union_all / q_unpivot at 2-13x the
committed BENCH.json, with zero code changes touching them.  VERDICT.md
carries q_tpch_q3 / q_tpch_q5 as weak pending reproduction.  This
harness produces the A/B(/C) evidence:

  A. per-query PRIVATE JVM (the stress_sweep discipline): one OS
     process per query, warm-up discarded, noop-sink median of 3 at
     sf0.1 — the contamination-free reading.
  B. shared-JVM FULL SUITE: `python bench.py` (the driver's own
     statistic — 252 queries alphabetically, 3 runs each, one JVM),
     cluster members extracted from the JSON line.
  C. contamination probe (the judge's named suspect): in ONE JVM,
     time the cluster fresh -> run the pin()/localCheckpoint-heavy
     late-alphabet queries 3x each (the bench workload that precedes
     q_t* alphabetically) -> re-time the cluster.  post/pre >> 1
     reproduces residue; ~1 refutes it.  Block-manager state
     (persistent RDD count) is sampled before/after the middle phase.

Verdict rule: if A ~= B ~= committed BENCH.json (within the BASELINE.md
noise band) and C's post/pre is flat, the r8 driver readings do not
reproduce on this machine under any of the three disciplines and the
cluster is adjudicated environmental (transient load window in the
driver's run).  Any query >2x committed in BOTH A and B is a real
regression and must be root-caused instead.

    python tools/adjudicate_r8.py            # ~25 min, writes stdout md
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# the 18 >2x-vs-committed queries from the r8 driver tail (VERDICT.md)
CLUSTER = [
    "q_tpch_q1", "q_tpch_q2", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5",
    "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q18",
    "q_tpch_q20", "q_tpch_q21", "q_tpch_q22",
    "q_triplet_mining", "q_udaf_grouped", "q_udtf_explode",
    "q_union_all", "q_unpivot",
]

# pin()/localCheckpoint-heavy queries that precede q_t* in bench.py's
# alphabetical order — the suspected residue source (plus the q_s*
# streaming block that runs immediately before the cluster).
RESIDUE_SOURCES = [
    "q_dedup_cluster", "q_dedup_cluster_sizes", "q_dedup_cluster_star",
    "q_graph_label_prop", "q_graph_pagerank", "q_graph_triangles",
    "q_sessionize_batch", "q_flow_iterate", "q_invoke_create",
    "q_stream_sessionize", "q_stream_stream_join", "q_stream_stream_left",
    "q_subquery_in", "q_subquery_scalar",
]


def _noop_time(spark, queries, name: str, sf_dir: str, runs: int = 3) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        if df.isStreaming:
            df = spark.createDataFrame(df.collect(), df.schema)
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
        for t in spark.catalog.listTables():
            if t.isTemporary and t.name.startswith("sfs_"):
                spark.catalog.dropTempView(t.name)
    ts.sort()
    return ts[len(ts) // 2]


def _make_session(app: str):
    from pyspark.sql import SparkSession

    from stateflow_flink_spark.plans.registry import load_all_modules
    from stateflow_flink_spark.session import apply_runtime_conf

    load_all_modules()
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    apply_runtime_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def worker_a(name: str) -> None:
    """One query, private JVM, bench.py's exact statistic."""
    from stateflow_flink_spark.plans.registry import QUERIES

    spark = _make_session(f"adjudicate-a-{name}")
    _noop_time(spark, QUERIES, name, SF_DIR, runs=1)  # warm-up, discarded
    print(json.dumps({"t": round(_noop_time(spark, QUERIES, name, SF_DIR), 3)}))
    spark.stop()


def worker_c() -> None:
    """Contamination probe: cluster fresh -> residue workload -> cluster
    again, one JVM, with block-manager sampling."""
    from stateflow_flink_spark.plans.registry import QUERIES

    spark = _make_session("adjudicate-c")
    sc = spark.sparkContext

    def n_persistent() -> int:
        return sc._jsc.sc().getPersistentRDDs().size()

    # same warm-ups bench.py uses, so 'pre' isn't billed startup
    for w in ("q_agg_groupby", "q_udf_scalar", "q_udaf_grouped",
              "q_stream_watermark"):
        _noop_time(spark, QUERIES, w, SF_DIR, runs=1)

    pre = {n: round(_noop_time(spark, QUERIES, n, SF_DIR), 3) for n in CLUSTER}
    blocks_before = n_persistent()
    t_mid0 = time.perf_counter()
    for n in RESIDUE_SOURCES:
        try:
            _noop_time(spark, QUERIES, n, SF_DIR)
        except Exception as exc:  # a broken source must not void the probe
            print(f"RESIDUE ERROR {n}: {exc}", file=sys.stderr)
    mid_sec = round(time.perf_counter() - t_mid0, 1)
    blocks_after = n_persistent()
    post = {n: round(_noop_time(spark, QUERIES, n, SF_DIR), 3) for n in CLUSTER}
    print(json.dumps({
        "pre": pre, "post": post, "mid_sec": mid_sec,
        "persistent_rdds_before": blocks_before,
        "persistent_rdds_after": blocks_after,
    }))
    spark.stop()


def main() -> None:
    committed = json.load(open(os.path.join(REPO, "BENCH.json")))["queries"]
    driver_r8 = {}
    try:  # r8 tail is truncated; parse what survives
        tail = json.load(open(os.path.join(REPO, "BENCH_r08.json")))["tail"]
        frag = "{" + tail[tail.index('"q_'):]
        frag = frag[: frag.rindex("}") + 1] if frag.rstrip().endswith("}") else frag
        # tolerate a cut-off last pair
        while frag:
            try:
                driver_r8 = json.loads(frag + "}")
                break
            except Exception:
                frag = frag[: frag.rindex(",")]
    except Exception as exc:
        print(f"driver r8 tail unparsed: {exc}", file=sys.stderr)

    results_a = {}
    for name in CLUSTER:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker-a", name],
            capture_output=True, text=True, timeout=1800, cwd=REPO,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        results_a[name] = (
            json.loads(line)["t"] if proc.returncode == 0 and line.startswith("{")
            else -1.0
        )
        print(f"A {name}: {results_a[name]}", file=sys.stderr)

    print("running B (full bench.py, shared JVM, ~15 min)...", file=sys.stderr)
    proc_b = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    bench_lines = [ln for ln in proc_b.stdout.splitlines() if ln.startswith("{")]
    results_b = json.loads(bench_lines[0])["queries"] if bench_lines else {}
    total_b = json.loads(bench_lines[0]).get("value") if bench_lines else None

    print("running C (contamination probe, one JVM)...", file=sys.stderr)
    proc_c = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker-c"],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    line_c = proc_c.stdout.strip().splitlines()[-1] if proc_c.stdout.strip() else ""
    c = json.loads(line_c) if line_c.startswith("{") else {}
    if proc_c.returncode != 0:
        print(f"C stderr: {proc_c.stderr[-500:]}", file=sys.stderr)

    # ---- report ----
    print("## r8 driver-bench cluster adjudication (A/B/C)\n")
    print(f"sf0.1, local[{CPUS}], noop sink, median-of-3 after warm-up — "
          f"the driver's own statistic.  B suite total: {total_b}s.\n")
    print("| query | committed | driver r8 | A private JVM (x) | "
          "B shared suite (x) | C pre | C post | post/pre |")
    print("|---|---|---|---|---|---|---|---|")
    worst_ab = 0.0
    worst_c = 0.0
    for name in CLUSTER:
        base = committed.get(name, float("nan"))
        d8 = driver_r8.get(name)
        a, b = results_a.get(name, -1), results_b.get(name, -1)
        ax = a / base if a > 0 and base > 0 else float("nan")
        bx = b / base if b > 0 and base > 0 else float("nan")
        pre, post = c.get("pre", {}).get(name), c.get("post", {}).get(name)
        pp = (post / pre) if pre and post else float("nan")
        worst_ab = max(worst_ab, min(ax, bx))
        if pp == pp:
            worst_c = max(worst_c, pp)
        d8s = f"{d8} ({d8 / base:.1f}x)" if d8 and base > 0 else "?"
        print(f"| {name} | {base} | {d8s} | {a} ({ax:.2f}x) | {b} ({bx:.2f}x) "
              f"| {pre} | {post} | {pp:.2f} |")
    print(f"\nC residue workload: {len(RESIDUE_SOURCES)} pin()-heavy queries, "
          f"{c.get('mid_sec')}s; persistent RDD blocks "
          f"{c.get('persistent_rdds_before')} -> {c.get('persistent_rdds_after')}.")
    print(f"\nworst min(A,B) ratio vs committed: {worst_ab:.2f}x; "
          f"worst C post/pre: {worst_c:.2f}x.")
    if worst_ab <= 2.0 and worst_c <= 1.5:
        print("\nVERDICT: the r8 driver readings do not reproduce under "
              "private-JVM, shared-suite, or residue-contamination "
              "disciplines on this machine — adjudicated ENVIRONMENTAL.")
    else:
        print("\nVERDICT: at least one cluster member reproduces >2x "
              "(or residue inflates post/pre) — REAL, root-cause next.")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker-a":
        worker_a(sys.argv[2])
    elif len(sys.argv) > 1 and sys.argv[1] == "--worker-c":
        worker_c()
    else:
        main()
