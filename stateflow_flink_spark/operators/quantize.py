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


def pq_subspaces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, sub, sv): quantized-integer subvectors — the
    shared front of the encode pass and of ADC lookup-table builds."""
    e = load(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        "label",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("long")
        ).alias("qe"),
    )
    return q.select(
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


def pq_codebook(subs: DataFrame) -> DataFrame:
    """(code_id, sub, cv): the deterministic first-K-vectors codebook."""
    return subs.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("code_id"), "sub", F.col("sv").alias("cv")
    )


def _l2q(a: str, b: str):
    """Exact integer squared L2 between two quantized subvectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def pq_encode(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, label, sub, packed): packed-min PQ assignment per
    subspace — packed = d2*K + code_id (lexicographic argmin in one
    hash aggregate)."""
    return (
        subs.join(broadcast(cb), "sub")
        .groupBy("vec_id", "label", "sub")
        .agg(F.min(_l2q("sv", "cv") * PQ_K + F.col("code_id")).alias("packed"))
    )


@query("q_emb_quantize", _PQ_ORACLE)
def q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-encode every embedding: 4 subspace codes from a 16-codeword
    deterministic codebook, plus the exact quantized reconstruction
    error (sum of winning squared distances).  See module docstring
    for the integer-exactness and scale story."""
    subs = pq_subspaces(spark, sf_dir)
    best = pq_encode(subs, pq_codebook(subs))
    return best.groupBy("vec_id", "label").agg(
        *[
            F.max(F.when(F.col("sub") == s, F.col("packed") % PQ_K)).alias(f"code_{s}")
            for s in range(PQ_M)
        ],
        # integer `div`, not floor(double /): double-divide-then-floor
        # goes inexact past 2^53 — same exact-unpack discipline as the
        # triplet-mining argmin decode
        F.sum(F.expr(f"packed div {PQ_K}")).alias("err_q"),
    )


# ---------------------------------------------------------------------------
# ADC search over the PQ codes (the serving half of IVF-PQ)
# ---------------------------------------------------------------------------

ADC_TOP = 10
ADC_PROBE = 0  # query vector


_ADC_ORACLE = f"""
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
    codes AS (
        SELECT t.vec_id, t.label, t.sub,
               MIN(LIST_REDUCE(
                       LIST_TRANSFORM(RANGE(1, {PQ_SUBDIM} + 1),
                           i -> (t.sv[i] - c.cv[i]) * (t.sv[i] - c.cv[i])),
                       (x, y) -> x + y) * {PQ_K} + c.code_id) % {PQ_K} AS code
        FROM subs t JOIN cb c USING (sub)
        GROUP BY t.vec_id, t.label, t.sub
    ),
    lut AS (
        SELECT p.sub, c.code_id,
               LIST_REDUCE(
                   LIST_TRANSFORM(RANGE(1, {PQ_SUBDIM} + 1),
                       i -> (p.sv[i] - c.cv[i]) * (p.sv[i] - c.cv[i])),
                   (x, y) -> x + y) AS d2
        FROM (SELECT sub, sv FROM subs WHERE vec_id = {ADC_PROBE}) p
        JOIN cb c USING (sub)
    )
    SELECT vec_id, label, CAST(SUM(l.d2) AS BIGINT) AS d2_adc
    FROM codes k JOIN lut l ON k.sub = l.sub AND k.code = l.code_id
    WHERE k.vec_id <> {ADC_PROBE}
    GROUP BY vec_id, label
    ORDER BY d2_adc ASC, vec_id ASC
    LIMIT {ADC_TOP}
"""


@query("q_sim_pq_adc", _ADC_ORACLE)
def q_sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) nearest-neighbour search over the PQ
    CODES — the serving half of IVF-PQ (Jégou et al. 2011 §IV): the
    probe builds a LUT of M·K integer distances (its raw subvectors vs
    every codeword — kilobytes, broadcast), and the corpus is scored by
    LOOKUP ONLY: d2_adc(vec) = Σ_s LUT[s][code_s(vec)].  The
    embeddings column is never read on the scoring side — that is the
    memory win that lets a billion-vector index serve from RAM.

    Plan: encode pass (shared `pq_encode`) + one broadcast-joined
    lookup + per-vector integer sum + TakeOrderedAndProject.  Every
    distance is exact BIGINT, so the top-k is reproducible down to the
    tie-break."""
    subs = pq_subspaces(spark, sf_dir)
    cb = pq_codebook(subs)
    codes = pq_encode(subs, cb).select(
        "vec_id", "label", "sub", (F.col("packed") % PQ_K).alias("code")
    )
    probe = subs.filter(F.col("vec_id") == ADC_PROBE).select("sub", "sv")
    lut = (
        probe.join(broadcast(cb), "sub")
        .select("sub", F.col("code_id").alias("code"), _l2q("sv", "cv").alias("d2"))
    )
    return (
        codes.filter(F.col("vec_id") != ADC_PROBE)
        .join(broadcast(lut), ["sub", "code"])
        .groupBy("vec_id", "label")
        .agg(F.sum("d2").cast("long").alias("d2_adc"))
        .orderBy(F.asc("d2_adc"), F.asc("vec_id"))
        .limit(ADC_TOP)
    )
