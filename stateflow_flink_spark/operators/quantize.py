"""Product quantization (PQ) — compress embeddings to M small codes.

PQ (Jégou, Douze & Schmid, TPAMI 2011, "Product Quantization for
Nearest Neighbor Search") splits a d-dim vector into M subvectors and
replaces each with the id of its nearest codeword from a per-subspace
codebook: a 64-dim float vector (256 bytes) becomes M=4 codes (4
bytes) — the memory step that makes billion-vector ANN serving fit in
RAM, and the natural companion to the IVF index in
:mod:`.similarity` (IVF-PQ is the FAISS default at scale).

Engine-exact arithmetic: element floats quantize to integers first
(``floor(x·1000)`` — float→double is exact, one correctly-rounded
multiply, floor; both engines land on the same integer), so every
distance is EXACT BIGINT arithmetic — no float-fold ordering to
reconcile, no rounding ties.  The argmin is a packed-integer
``min(d2·16 + code_id)``: lexicographic (distance, code) order in one
hash-aggregatable MIN, which keeps the encode pass a pure partial
aggregation — no window sort anywhere.

Scale shape of the encode pass (the part that runs over the corpus):
codebook = M·K subvectors (here 4·16 — kilobytes; 4·256 in production)
broadcast to every task; each vector scores M·K integer distances
map-side; one hash aggregate by (vec_id, sub) and one by vec_id.  The
corpus never shuffles on anything wider than its own id.  Codebook
TRAINING at 100 TB is k-means per subspace — exactly
``q_cluster_kmeans`` run M times on slices; here the codebook is the
first K vectors' subvectors (deterministic, oracle-sharable), the
fixture stand-in for a trained one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..io import load
from ..plans.registry import query

PQ_M = 4  # subspaces
PQ_SUBDIM = 16  # dims per subspace (4 x 16 = the fixture's 64)
PQ_K = 16  # codewords per subspace (vec_id 0..15's subvectors)

_SUBS_SQL = ", ".join(str(s) for s in range(PQ_M))

_PQ_ORACLE = f"""
    WITH q AS (
        SELECT vec_id, label,
               LIST_TRANSFORM(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qe
        FROM embeddings
    ),
    subs AS (
        SELECT vec_id, label, s.sub,
               qe[s.sub * {PQ_SUBDIM} + 1 : (s.sub + 1) * {PQ_SUBDIM}] AS sv
        FROM q, (SELECT UNNEST([{_SUBS_SQL}]) AS sub) s
    ),
    cb AS (
        SELECT vec_id AS code_id, sub, sv AS cv FROM subs
        WHERE vec_id < {PQ_K}
    ),
    best AS (
        SELECT t.vec_id, t.label, t.sub,
               MIN(LIST_REDUCE(
                       LIST_TRANSFORM(RANGE(1, {PQ_SUBDIM} + 1),
                           i -> (t.sv[i] - c.cv[i]) * (t.sv[i] - c.cv[i])),
                       (x, y) -> x + y) * {PQ_K} + c.code_id) AS packed
        FROM subs t JOIN cb c USING (sub)
        GROUP BY t.vec_id, t.label, t.sub
    )
    SELECT vec_id, label,
           {", ".join(f"CAST(MAX(CASE WHEN sub = {s} THEN packed % {PQ_K} END) AS BIGINT) AS code_{s}" for s in range(PQ_M))},
           CAST(SUM(packed // {PQ_K}) AS BIGINT) AS err_q
    FROM best
    GROUP BY vec_id, label
"""


@query("q_emb_quantize", _PQ_ORACLE)
def q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-encode every embedding: 4 subspace codes from a 16-codeword
    deterministic codebook, plus the exact quantized reconstruction
    error (sum of winning squared distances).  See module docstring
    for the integer-exactness and scale story."""
    e = load(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("long")
        ).alias("qe"),
    )
    subs = q.select(
        "vec_id",
        "label",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice("qe", s * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
                    )
                    for s in range(PQ_M)
                ]
            )
        ).alias("p"),
    ).select("vec_id", "label", "p.sub", "p.sv")
    cb = subs.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("code_id"), "sub", F.col("sv").alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    best = (
        subs.join(broadcast(cb), "sub")
        .groupBy("vec_id", "label", "sub")
        .agg(F.min(d2 * PQ_K + F.col("code_id")).alias("packed"))
    )
    return best.groupBy("vec_id", "label").agg(
        *[
            F.max(F.when(F.col("sub") == s, F.col("packed") % PQ_K)).alias(f"code_{s}")
            for s in range(PQ_M)
        ],
        F.sum(F.floor(F.col("packed") / PQ_K)).alias("err_q"),
    )
