#!/usr/bin/env python
"""Dump explain("formatted") plans for the round-13 touched queries.

Usage: python tools/dump_r13_plans.py <out_dir> <tag>

Works against whichever package version is first on sys.path (run it
from the baseline worktree for the _before dumps and from the working
tree for the _after dumps).  Registry queries dump their returned
frame's plan; the imperative q_build_* builders dump the key internal
frames (Lloyd round / power step / band-table input) that the round's
changes target, with a suffix naming the frame.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

OUT, TAG = sys.argv[1], sys.argv[2]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stateflow_flink_spark.plans.registry import QUERIES, load_all_modules  # noqa: E402
from stateflow_flink_spark.session import apply_runtime_conf  # noqa: E402

load_all_modules()
spark = (
    SparkSession.builder.master("local[8]")
    .appName("dump-r13-plans")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
apply_runtime_conf(spark)
spark.sparkContext.setLogLevel("ERROR")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.makedirs(OUT, exist_ok=True)


def dump(name: str, df) -> None:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as fh:
        fh.write(buf.getvalue())
    print("dumped", name)


# --- registry queries touched this round ------------------------------------
for q in (
    "q_dedup_containment",
    "q_tfidf_cosine_pairs",
    "q_graph_pagerank",
    "q_graph_degree_dist",
    "q_growth_accounting",
    "q_sketch_hll_partitioned",
    "q_sketch_kmv",
    "q_anomaly_seasonal",
):
    dump(q, QUERIES[q](spark, SF))

# --- q_build_pca_state: one UNPINNED power step -----------------------------
from stateflow_flink_spark.operators import linalg as L  # noqa: E402

e = L._embeddings_d(spark, SF)
means = e.select(F.posexplode("e").alias("pos", "val")).groupBy("pos").agg(
    (
        F.sum(L._q(F.col("val")).cast("decimal(38,0)")).cast("double")
        / (F.count(F.lit(1)) * 1_000_000.0)
    ).alias("c")
)
state = L._as_array(means, "pos", "c").select(
    "c", F.transform(F.col("c"), lambda _: F.lit(1.0)).alias("x")
)
dump("q_build_pca_state_powerstep", L._power_step(e, state, do_pin=False))

# --- q_build_ivfadc_index: one Lloyd round + the codes encode ---------------
from stateflow_flink_spark.operators import similarity as S  # noqa: E402

rsubs = S._residual_subspaces(spark, SF)
cb = rsubs.filter(F.col("vec_id") < S.RES_K).select(
    F.col("vec_id").alias("code_id"), "sub", F.col("sv").alias("cv")
)
if hasattr(S, "_codeword_argmin"):  # r13 spelling
    asg = S._codeword_argmin(rsubs, cb).select(
        "sub", (F.col("packed") % S.RES_K).alias("code_id"), "sv"
    )
    cnt = F.count(F.lit(1))
    newcv = asg.groupBy("sub", "code_id").agg(
        F.array(
            *[
                F.floor(
                    F.sum(F.element_at("sv", d + 1)).cast("double") / cnt
                ).cast("long")
                for d in range(S.RES_SUBDIM)
            ]
        ).alias("cv")
    )
    codes = S._codeword_argmin(rsubs, cb).select(
        "vec_id", "label", "sub", (F.col("packed") % S.RES_K).alias("code"), "cent_id"
    )
else:  # r12 spelling
    asg = S._packed_argmin(rsubs, cb, "vec_id").select(
        "vec_id", "sub", (F.col("packed") % S.RES_K).alias("code_id")
    )
    upd = (
        rsubs.join(asg, ["vec_id", "sub"])
        .select("sub", "code_id", F.posexplode("sv").alias("pos", "val"))
        .groupBy("sub", "code_id", "pos")
        .agg(
            F.floor(F.sum("val").cast("double") / F.count(F.lit(1)))
            .cast("long")
            .alias("cvi")
        )
    )
    newcv = (
        upd.groupBy("sub", "code_id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "cvi"))).alias("pc"))
        .select("sub", "code_id", F.transform("pc", lambda s: s.cvi).alias("cv"))
    )
    codes = S._packed_argmin(rsubs, cb, "vec_id", "label", "cent_id").select(
        "vec_id", "label", "sub", (F.col("packed") % S.RES_K).alias("code"), "cent_id"
    )
dump("q_build_ivfadc_index_lloyd_update", newcv)
dump("q_build_ivfadc_index_codes", codes)

# q_build_dedup_index: no plan pair committed — the round's
# derive-bands-from-the-written-table variant was tried and REVERTED
# (bench receipts in OPTIMIZATION_r13.md); the final build keeps the two
# independent corpus writes, so its band-input plan is unchanged from
# the baseline.

spark.stop()
