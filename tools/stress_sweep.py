#!/usr/bin/env python
"""Stress sweep — do the banded/bucketed operators scale LINEARLY?

The quadratic-adjacent operators (shingle-Jaccard fuzzy dedup,
MinHash+LSH, SimHash 3-of-6-block banding, the ANN family) all claim
"bucketed, not all-pairs": cost ~ corpus size, not corpus size².  This
harness measures that claim directly: run each at N and 10N documents /
vectors and report the wall-clock and candidate-count ratios.

Why not just scale the fixture? ``documents.parquet`` draws ~50-token
docs from a ~30-word vocabulary, so ANY two docs are fairly similar —
near-dup density is a property of the corpus, and iid-sampling 10x more
of it grows the TRUE pair count ~100x (an output-size fact, not an
algorithm fact).  Real corpora diversify as they grow: duplicate
clusters stay small.  The sweep therefore generates its own corpora
with scale-invariant per-doc dup density — a 2,000-word vocabulary
(random docs far apart under Jaccard/Hamming) plus 5% planted near-dup
pairs (1-3 token substitutions; embeddings: copy + small noise) — so a
linear-cost algorithm shows a ~10x ratio and a quadratic one ~100x.

Usage::

    python tools/stress_sweep.py [N_BASE]     # default 5000 (sf0.1-sized)

Prints one markdown table; exits non-zero if any query's wall-clock
ratio exceeds SUPRALINEAR_BAR (10x data * 2x slack for log factors,
shuffle constants, and scheduler noise at these sub-second scales).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_BASE = (
    int(sys.argv[1])
    if len(sys.argv) > 1 and not sys.argv[1].startswith("--")
    else 5000
)
SCALE = 10
VOCAB = 2000
TOKENS_PER_DOC = 50
DUP_RATE = 0.05
EMB_DIM = 64
SUPRALINEAR_BAR = 20.0

TARGETS = [
    "q_dedup_fuzzy",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_substring",
    "q_dedup_paragraph",
    "q_dedup_embedding_lsh",
    "q_sim_ann_lsh",
    "q_sim_ann_ivf",
    "q_sim_ann_batch",
    "q_emb_quantize",
    "q_sim_pq_adc",
    "q_triplet_mining",
    "q_ngram_lm",
    "q_dedup_minhash_stream",
    "q_bpe_train",
    "q_emb_pca",
    "q_emb_whiten",
    "q_dedup_prefix",
    "q_dedup_containment",
    "q_domain_kl",
    "q_tfidf_cosine_pairs",
    "q_knn_graph_mutual",
    "q_knn_graph_mutual_ann",
    "q_negative_sampling",
    "q_sample_bootstrap",
    "q_rank_fusion",
    "q_emb_outlier",
    # r9 additions with any non-trivial shuffle shape
    "q_item_cf_cosine",
    "q_hapax_ratio",
    "q_bigram_cond_entropy",
    "q_js_divergence",
    "q_zipf_topk",
    "q_gini_concentration",
    # r10 additions (projections included — they should read ~1x flat)
    "q_pipeline_fuzzy_dedup",
    "q_dedup_domain",
    "q_domain_cap",
    "q_quality_classifier",
    "q_quality_ensemble",
    "q_dedup_incremental",
    "q_mm_dedup_exact",
    "q_mm_chunk_dedup",
    "q_tokenizer_fertility",
    "q_contamination_report",
    # r11 additions
    "q_dedup_incremental_indexed",
    "q_mm_chunk_cdc",
    "q_mix_token_budget",
    "q_sim_ann_ivf_indexed",
    # r12 additions: q_knn_eval joins as a STANDING target (judge r11
    # item 6 — driver read 2.34x, judge median 2.0x on a 0.69 s value;
    # a decade row replaces the judgment call), plus the round's two
    # new index queries
    "q_knn_eval",
    "q_dedup_index_maintain",
    "q_sim_ann_ivf_pq",
    "q_dedup_cluster_incremental",
    # r13 addition: the two-stage serving query (ADC shortlist + exact
    # re-rank of R rows — the exact stage must stay R-bound, so its
    # decade row should read FLAT like the other index probes)
    "q_sim_ann_ivf_pq_rerank",
]

# Re-measure a subset without paying for the full table:
#   SPARK_GRAFT_SWEEP_ONLY=q_ngram_lm,q_dedup_substring python tools/stress_sweep.py
_only = os.environ.get("SPARK_GRAFT_SWEEP_ONLY")
if _only:
    TARGETS = [t for t in TARGETS if t in set(_only.split(","))]


def gen_corpus(out_dir: str, n_docs: int, seed: int) -> None:
    """Write documents.parquet + embeddings.parquet in the fixture
    layout (FIXTURES.md schemas) with planted near-dups."""
    rng = np.random.default_rng(seed)
    base_words = (
        "batch part spark line column order small sort fast value scan hash "
        "slow group query table stream filter big merge key window join the "
        "customer agg vector a"
    ).split()
    vocab = np.array(
        [f"{w}{i}" for i in range(VOCAB // len(base_words) + 1) for w in base_words][
            :VOCAB
        ]
    )
    toks = vocab[rng.integers(0, VOCAB, size=(n_docs, TOKENS_PER_DOC))]
    # plant near-dups: doc i copies doc i-1 with 1-3 token substitutions
    dup_mask = rng.random(n_docs) < DUP_RATE
    dup_mask[0] = False
    for i in np.flatnonzero(dup_mask):
        toks[i] = toks[i - 1]
        for j in rng.integers(0, TOKENS_PER_DOC, size=rng.integers(1, 4)):
            toks[i, j] = vocab[rng.integers(0, VOCAB)]
    # plant a HOT BIGRAM ("of the") in ~90% of docs — the q_ngram_lm
    # skew probe: a window-partitioned plan would funnel every
    # occurrence row of the hot key onto one reducer (super-linear
    # tail); the pre-aggregated count-table plan collapses it map-side
    # and stays linear.
    hot_mask = rng.random(n_docs) < 0.9
    for i in np.flatnonzero(hot_mask):
        p = rng.integers(0, TOKENS_PER_DOC - 1)
        toks[i, p] = "of"
        toks[i, p + 1] = "the"
    texts = [" ".join(row) for row in toks]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(["en", "zh", "de"], n_docs),
            "source": [f"src{i % 40}" for i in range(n_docs)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    docs.to_parquet(os.path.join(out_dir, "documents.parquet"), index=False)

    n_vec = max(200, int(n_docs * 0.4))
    emb = rng.standard_normal((n_vec, EMB_DIM)).astype(np.float32)
    vdup = rng.random(n_vec) < DUP_RATE
    vdup[0] = False
    emb[vdup] = emb[np.flatnonzero(vdup) - 1] + 0.05 * rng.standard_normal(
        (int(vdup.sum()), EMB_DIM)
    ).astype(np.float32)
    embs = pd.DataFrame(
        {
            "vec_id": np.arange(n_vec, dtype=np.int64),
            "embedding": [row for row in emb],
            "label": rng.integers(0, 10, n_vec).astype(np.int32),
        }
    )
    embs.to_parquet(os.path.join(out_dir, "embeddings.parquet"), index=False)

    # events table (FIXTURES.md schema) for the activity-shaped targets
    # (q_gini_concentration, q_item_cf_cosine, ...): ~20 events/doc over
    # a DELIBERATELY Zipf-skewed user population — the stress these
    # queries exist to survive is a whale user, so plant one.
    n_ev = n_docs * 20
    n_users = max(50, n_docs // 65)
    # inverse-CDF Zipf(1.2)-ish: user k gets weight (k+1)^-1.2
    w = (np.arange(n_users) + 1.0) ** -1.2
    users = rng.choice(n_users, size=n_ev, p=w / w.sum()).astype(np.int64)
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    events = pd.DataFrame(
        {
            "event_id": np.arange(n_ev, dtype=np.int64),
            "ts": ts0 + rng.integers(0, 90 * 86400, n_ev) * np.timedelta64(10**6, "us"),
            "user_id": users,
            "event_type": rng.choice(
                ["view", "click", "purchase", "signup", "error"], n_ev
            ),
            "value": np.round(rng.random(n_ev) * 100, 2),
            "props": "{}",
        }
    )
    events.to_parquet(os.path.join(out_dir, "events.parquet"), index=False)


def _worker(name: str, d1: str, d10: str) -> None:
    """Measure ONE operator at both scales in a private JVM and print a
    JSON line.  Isolation matters: the round-5 shared-session sweep
    read q_sim_ann_lsh at 45 s on the 10x corpus (measured right after
    embedding-LSH's three ~370 s runs had trashed the heap) vs 12 s in
    a fresh process — a 21x 'super-linear' verdict manufactured by JVM
    state, not by the plan.  `spark.stop()` does not recycle the py4j
    JVM, so true isolation means one OS process per operator."""
    import json

    from pyspark.sql import SparkSession

    from stateflow_flink_spark.plans.registry import QUERIES, load_all_modules
    from stateflow_flink_spark.session import apply_runtime_conf

    load_all_modules()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"stress-{name}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # local-mode default is a 1 GiB heap — far below the 100 TB
        # target's per-executor memory; give the sweep honest headroom
        # so an OOM means "plan is wrong", not "toy heap".
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    apply_runtime_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def run(d: str) -> tuple[float, int]:
        rows = 0
        ts = []
        QUERIES[name](spark, d).count()  # warm-up, discarded (JVM,
        #                                  codegen, python workers)
        for _ in range(3):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, d)
            rows = df.count()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[1], rows

    t1, r1 = run(d1)
    t10, r10 = run(d10)
    print(json.dumps({"t1": t1, "r1": r1, "t10": t10, "r10": r10}))
    spark.stop()


def main() -> None:
    import json
    import subprocess

    dirs = {}
    for scale, n in ((1, N_BASE), (SCALE, N_BASE * SCALE)):
        d = tempfile.mkdtemp(prefix=f"sfs_stress_{scale}x_")
        gen_corpus(d, n, seed=1234)  # same seed: 10x is a superset-alike
        dirs[scale] = d

    print(f"| query | {N_BASE} docs s | {N_BASE * SCALE} docs s | wall ratio "
          "| rows 1x | rows 10x | rows ratio |")
    print("|---|---|---|---|---|---|---|")
    failures = []
    for name in TARGETS:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", name,
                 dirs[1], dirs[SCALE]],
                capture_output=True, text=True,
                # a hung operator IS the pathology this sweep hunts —
                # bound it and report it instead of stalling the gate
                timeout=int(os.environ.get("SPARK_GRAFT_SWEEP_TIMEOUT", "3600")),
            )
        except subprocess.TimeoutExpired:
            print(f"| {name} | TIMEOUT | | | | | |")
            failures.append((name, "timeout"))
            continue
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        if proc.returncode != 0 or not line.startswith("{"):
            print(f"| {name} | ERROR | | | | | |")
            print(f"ERROR {name}: {proc.stderr[-400:]}", file=sys.stderr)
            failures.append((name, "error"))
            continue
        m = json.loads(line)
        t1, r1, t10, r10 = m["t1"], m["r1"], m["t10"], m["r10"]
        ratio = t10 / t1 if t1 > 0 else float("inf")
        rratio = (r10 / r1) if r1 else float("nan")
        print(
            f"| {name} | {t1:.2f} | {t10:.2f} | **{ratio:.1f}x** "
            f"| {r1} | {r10} | {rratio:.1f}x |"
        )
        # An operator cannot emit R rows in under R work: when the TRUE
        # result itself grows super-linearly (random 64-dim vectors
        # crowd past the cosine threshold quadratically at large N),
        # the fair bar is output growth x slack, not data growth x
        # slack.  Wall-clock above BOTH bars is a real blowup.
        bar = max(SUPRALINEAR_BAR, 2.0 * rratio if rratio == rratio else 0.0)
        if ratio > bar:
            failures.append((name, ratio))
    if failures:
        print(f"\nSUPER-LINEAR: {failures}", file=sys.stderr)
        sys.exit(1)
    print(f"\nAll {len(TARGETS)} queries within {SUPRALINEAR_BAR}x (or 2x "
          f"their own output growth) at {SCALE}x data — no super-linear "
          "blowup.")


# ---------------------------------------------------------------------------
# Streaming variance mode (round-8 judge item 6): the streaming sweep
# entries jitter 1.8-3.8x between identical runs — wide enough to hide a
# real regression (the r8 minhash-stream quadratic nearly slipped past).
# This mode pins the measurement discipline: for each stateful streaming
# query, FIVE private JVMs (one timed run each, after one in-JVM warm-up,
# same deterministic fixtures), reporting the median and the max/min
# run-to-run spread.  A future regression is real when it clears the
# committed spread band, not the shared-JVM noise.
#
#     python tools/stress_sweep.py --streaming-variance   # ~15 min
# ---------------------------------------------------------------------------

STREAMING_TARGETS = [
    "q_stream_anomaly",
    "q_stream_cdc_apply",
    "q_stream_cep",
    "q_stream_ewma",
    "q_stream_hll",
    "q_stream_sessionize",
    "q_stream_stream_join",
    "q_stream_stream_left",
    "q_stream_topk",
    "q_stateful_fold_stream",
    "q_dedup_minhash_stream",
]

_SV_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_SV_JVMS = 5


def _worker_sv(name: str, sf_dir: str) -> None:
    """One streaming query, one private JVM: warm-up run discarded
    (streaming engine init, state-store provider, python workers), then
    ONE timed noop-sink run — the per-JVM sample the variance table is
    built from."""
    import json

    from pyspark.sql import SparkSession

    from stateflow_flink_spark.plans.registry import QUERIES, load_all_modules
    from stateflow_flink_spark.session import apply_runtime_conf

    load_all_modules()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"sv-{name}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    apply_runtime_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def once() -> float:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        if df.isStreaming:
            df = spark.createDataFrame(df.collect(), df.schema)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        for t in spark.catalog.listTables():
            if t.isTemporary and t.name.startswith("sfs_"):
                spark.catalog.dropTempView(t.name)
        return dt

    once()  # warm-up, discarded
    print(json.dumps({"t": round(once(), 3)}))
    spark.stop()


def streaming_variance() -> None:
    import json
    import subprocess

    print(f"| query | runs (s, {_SV_JVMS} private JVMs) | median | "
          "spread max/min |")
    print("|---|---|---|---|")
    wide = []
    for name in STREAMING_TARGETS:
        ts = []
        for _ in range(_SV_JVMS):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker-sv",
                 name, _SV_SF_DIR],
                capture_output=True, text=True,
                timeout=int(os.environ.get("SPARK_GRAFT_SWEEP_TIMEOUT", "1800")),
            )
            line = (proc.stdout.strip().splitlines()[-1]
                    if proc.stdout.strip() else "")
            if proc.returncode != 0 or not line.startswith("{"):
                print(f"SV ERROR {name}: {proc.stderr[-300:]}", file=sys.stderr)
                continue
            ts.append(json.loads(line)["t"])
        if not ts:
            print(f"| {name} | ERROR | | |")
            wide.append((name, "error"))
            continue
        ts.sort()
        med = ts[len(ts) // 2]
        spread = ts[-1] / ts[0] if ts[0] > 0 else float("inf")
        print(f"| {name} | {', '.join(f'{t:.2f}' for t in ts)} "
              f"| {med:.2f} | **{spread:.2f}x** |")
        if spread > 1.5:
            wide.append((name, round(spread, 2)))
    if wide:
        print(f"\nspread > 1.5x: {wide}", file=sys.stderr)
        sys.exit(1)
    print(f"\nAll {len(STREAMING_TARGETS)} streaming queries within 1.5x "
          "run-to-run spread under per-JVM isolation.")


# ---------------------------------------------------------------------------
# Three-point dedup scale mode (round-9 judge item 2): the 10x sweep's
# top ratios cluster on the dedup/ngram family (3.2-3.8x), and a single
# two-point ratio cannot distinguish "log-factor constants" from the
# onset of a quadratic.  This mode runs the family at 5k -> 50k -> 500k
# docs (same scale-invariant dup density) and compares the SECOND decade
# ratio against the first: sub-quadratic cost means ratio(50k->500k) <=
# ~ratio(5k->50k) x slack, while a quadratic term grows its decade ratio
# 10x per decade.  Median-of-3 per query in a private JVM; median-of-7
# for q_dedup_minhash (its r9 15.7x one-off was adjudicated on a single
# re-measure — this is the stronger discipline the judge asked for).
#
#     python tools/stress_sweep.py --three-point   # ~40-60 min
# ---------------------------------------------------------------------------

THREE_POINT_TARGETS = [
    "q_dedup_minhash",       # median-of-7 (re-adjudication)
    "q_dedup_fuzzy",
    "q_dedup_simhash",
    "q_dedup_prefix",
    "q_dedup_containment",
    "q_dedup_paragraph",
    "q_ngram_lm",
    "q_tfidf_cosine_pairs",
    "q_dedup_embedding_lsh",  # output itself grows superlinearly
    "q_dedup_minhash_stream",
    "q_dedup_domain",         # r11: within-domain LSH joined the weak list
]
_TP_SCALES = (5_000, 50_000, 500_000)
# second-decade ratio may exceed the first by this slack before it
# counts as super-linear onset (log factors, shuffle-partition constants
# crossing the 32-task granularity, scheduler noise)
_TP_DECADE_SLACK = 1.6


def _worker_3p(name: str, runs: int, *dirs: str) -> None:
    """One operator, one private JVM, all three scales: warm-up at the
    smallest scale, then median-of-``runs`` wall clock per scale."""
    import json

    from pyspark.sql import SparkSession

    from stateflow_flink_spark.plans.registry import QUERIES, load_all_modules
    from stateflow_flink_spark.session import apply_runtime_conf

    load_all_modules()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"3p-{name}")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    apply_runtime_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def once(d: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, d)
        if df.isStreaming:
            df = spark.createDataFrame(df.collect(), df.schema)
        rows = df.count()
        dt = time.perf_counter() - t0
        for t in spark.catalog.listTables():
            if t.isTemporary and t.name.startswith("sfs_"):
                spark.catalog.dropTempView(t.name)
        return dt, rows

    once(dirs[0])  # warm-up, discarded
    out = []
    for d in dirs:
        ts, rows = [], 0
        for _ in range(runs):
            dt, rows = once(d)
            ts.append(dt)
        ts.sort()
        out.append({"t": round(ts[len(ts) // 2], 3), "rows": rows})
    print(json.dumps(out))
    spark.stop()


def three_point() -> None:
    import json
    import subprocess

    dirs = []
    for n in _TP_SCALES:
        d = tempfile.mkdtemp(prefix=f"sfs_3p_{n}_")
        print(f"generating {n}-doc corpus at {d} ...", file=sys.stderr)
        gen_corpus(d, n, seed=1234)
        dirs.append(d)

    print("| query | runs | 5k s | 50k s | 500k s | d1 ratio | d2 ratio "
          "| rows 5k/50k/500k | verdict |")
    print("|---|---|---|---|---|---|---|---|---|")
    failures = []
    for name in THREE_POINT_TARGETS:
        runs = 7 if name == "q_dedup_minhash" else 3
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker-3p",
                 name, str(runs), *dirs],
                capture_output=True, text=True,
                timeout=int(os.environ.get("SPARK_GRAFT_SWEEP_TIMEOUT", "3600")),
            )
        except subprocess.TimeoutExpired:
            print(f"| {name} | {runs} | TIMEOUT | | | | | | |")
            failures.append((name, "timeout"))
            continue
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        if proc.returncode != 0 or not line.startswith("["):
            print(f"| {name} | {runs} | ERROR | | | | | | |")
            print(f"3P ERROR {name}: {proc.stderr[-400:]}", file=sys.stderr)
            failures.append((name, "error"))
            continue
        m = json.loads(line)
        t = [p["t"] for p in m]
        r = [p["rows"] for p in m]
        d1 = t[1] / t[0] if t[0] > 0 else float("inf")
        d2 = t[2] / t[1] if t[1] > 0 else float("inf")
        # Verdict bar, three clauses:
        #   (a) d2 <= d1 x slack — decade ratios not growing (the
        #       strictest reading of "sub-quadratic");
        #   (b) d2 <= 10 x slack — a decade that costs at most the DATA
        #       growth is at-most-linear BY DEFINITION; without this
        #       clause a perfectly linear algorithm whose 5k/50k points
        #       are fixed-cost-dominated (d1 ~ 1.5) would be flagged as
        #       its ratios drift toward 10x while costs amortize;
        #   (c) output-growth bound — when the TRUE result grows
        #       super-linearly (random-vector cosine pairs crowd
        #       quadratically), emitting R rows is Omega(R) work.
        out_d2 = (r[2] / r[1]) if r[1] else float("nan")
        bars = [_TP_DECADE_SLACK * d1, _TP_DECADE_SLACK * 10.0]
        if out_d2 == out_d2:
            bars.append(_TP_DECADE_SLACK * out_d2)
        ok = d2 <= max(bars)
        verdict = "sub-quadratic" if ok else "SUPER-LINEAR ONSET"
        print(
            f"| {name} | {runs} | {t[0]:.2f} | {t[1]:.2f} | {t[2]:.2f} "
            f"| **{d1:.1f}x** | **{d2:.1f}x** | {r[0]}/{r[1]}/{r[2]} "
            f"| {verdict} |"
        )
        if not ok:
            failures.append((name, round(d2, 2)))
    if failures:
        print(f"\nSUPER-LINEAR ONSET: {failures}", file=sys.stderr)
        sys.exit(1)
    print(f"\nAll {len(THREE_POINT_TARGETS)} dedup-family queries hold "
          "decade-over-decade (ratio(50k->500k) <= ratio(5k->50k) x "
          f"{_TP_DECADE_SLACK} or bounded by their own output growth).")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3], sys.argv[4])
    elif len(sys.argv) > 1 and sys.argv[1] == "--worker-sv":
        _worker_sv(sys.argv[2], sys.argv[3])
    elif len(sys.argv) > 1 and sys.argv[1] == "--worker-3p":
        _worker_3p(sys.argv[2], int(sys.argv[3]), *sys.argv[4:])
    elif len(sys.argv) > 1 and sys.argv[1] == "--streaming-variance":
        streaming_variance()
    elif len(sys.argv) > 1 and sys.argv[1] == "--three-point":
        three_point()
    else:
        main()
