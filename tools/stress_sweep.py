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

N_BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
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
]


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


def main() -> None:
    from pyspark.sql import SparkSession

    from stateflow_flink_spark.plans.registry import QUERIES, load_all_modules
    from stateflow_flink_spark.session import apply_runtime_conf

    load_all_modules()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stress-sweep")
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

    dirs = {}
    for scale, n in ((1, N_BASE), (SCALE, N_BASE * SCALE)):
        d = tempfile.mkdtemp(prefix=f"sfs_stress_{scale}x_")
        gen_corpus(d, n, seed=1234)  # same seed: 10x is a superset-alike
        dirs[scale] = d

    def run(name: str, d: str) -> tuple[float, int]:
        rows = 0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, d)
            rows = df.count()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[1], rows

    # warm-up (JVM + python workers)
    QUERIES["q_dedup_minhash"](spark, dirs[1]).count()

    print(f"| query | {N_BASE} docs s | {N_BASE * SCALE} docs s | wall ratio "
          "| rows 1x | rows 10x | rows ratio |")
    print("|---|---|---|---|---|---|---|")
    failures = []
    for name in TARGETS:
        try:
            t1, r1 = run(name, dirs[1])
            t10, r10 = run(name, dirs[SCALE])
        except Exception as exc:
            print(f"| {name} | ERROR | | | | | |")
            print(f"ERROR {name}: {str(exc)[:400]}", file=sys.stderr)
            failures.append((name, "error"))
            continue
        ratio = t10 / t1 if t1 > 0 else float("inf")
        rratio = (r10 / r1) if r1 else float("nan")
        print(
            f"| {name} | {t1:.2f} | {t10:.2f} | **{ratio:.1f}x** "
            f"| {r1} | {r10} | {rratio:.1f}x |"
        )
        if ratio > SUPRALINEAR_BAR:
            failures.append((name, ratio))
    if failures:
        print(f"\nSUPER-LINEAR: {failures}", file=sys.stderr)
        sys.exit(1)
    print(f"\nAll {len(TARGETS)} queries within {SUPRALINEAR_BAR}x at "
          f"{SCALE}x data — no super-linear blowup.")
    spark.stop()


if __name__ == "__main__":
    main()
