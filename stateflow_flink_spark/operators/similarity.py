"""Similarity search over embeddings (array<float>, dim 64).

Three tiers:

  * brute-force cosine top-k — the exact baseline: one broadcast of the
    query vector, one pass over the table, TakeOrderedAndProject for
    the top-k.  All arithmetic is JVM higher-order functions
    (zip_with + aggregate), no Python in the scan.
  * kNN classification — probes x corpus scored the same way; per-probe
    rank + majority vote.
  * random-hyperplane LSH (ANN) — the 100 TB path: L independent
    sign-bit tables (OR-amplification) bucket each vector; only vectors
    sharing a probe bucket in some table are scored.  Hyperplanes are
    deterministic literals (seeded) so plans are reproducible across
    runs and engines.

Cross-engine float discipline: per-element products are exact
(float32 -> double), only the 64-term sum order can differ between
engines, a ~1e-15 relative wobble absorbed by rounding cosines to 6 dp
on both sides before any compare or rank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, pandas_udf
from pyspark.sql.types import ArrayType, LongType

from ..io import load, spread
from ..plans.registry import query

DIM = 64
# Multi-table LSH (OR-amplification): L independent tables of k sign
# bits each.  One k-bit table alone has recall (1 - theta/pi)^k per
# neighbor — too lossy for the moderate-cosine neighbors real embedding
# corpora have (measured: top-10 neighbors sit at Hamming 2-7 over 8
# bits, so single-table Hamming-1 probing recalled ~0/10).  L tables
# recover it: P(miss) = (1 - p_table)^L.  At scale, k grows with the
# corpus (~log2(n / target_bucket_size), e.g. k=20 at 1e9 vectors) and
# each table is stored partitioned by its bucket, so a probe reads
# L * (k+1) buckets (Hamming-1 multi-probe) instead of the corpus.
LSH_TABLES = 8
LSH_BITS = 4
NEAR_DUP_TAU = 0.4
EMB_BLOCKS = 8  # block-GEMM grid for exact all-pairs; ~n_executors at scale


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero vector yields NULL similarity instead of an
    # ANSI DIVIDE_BY_ZERO exception killing the whole 100 TB job
    return F.try_divide(dot(a, b), norm(a) * norm(b))


# list_cosine_similarity over DOUBLE[] is bit-identical to the
# SUM-over-UNNEST spelling and ~100x faster (the float32 column MUST be
# cast first — the float overload computes in single precision).
_COS_SQL = """
        SELECT e.vec_id, e.label,
               list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS c
        FROM embeddings e,
             (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
"""


@query(
    "q_sim_cosine",
    f"""
    SELECT vec_id, label, ROUND(c, 6) AS cos_sim
    FROM ({_COS_SQL})
    ORDER BY ROUND(c, 6) DESC, vec_id ASC
    LIMIT 10
    """,
)
def q_sim_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most cosine-similar vectors to vec_id 0 (exact, brute force)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    scored = e.filter(F.col("vec_id") != 0).crossJoin(broadcast(q))
    return (
        scored.select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qe")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "q_knn_label",
    """
    WITH scored AS (
        SELECT p.vec_id AS probe_id, e.vec_id, e.label,
               ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                            p.embedding::DOUBLE[]), 6) AS c
        FROM embeddings e
        JOIN embeddings p ON p.vec_id < 5 AND e.vec_id <> p.vec_id
    ), ranked AS (
        SELECT probe_id, label,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY c DESC, vec_id ASC) AS rn
        FROM scored
    ), votes AS (
        SELECT probe_id, label, COUNT(*) AS n_votes
        FROM ranked WHERE rn <= 10 GROUP BY 1, 2
    )
    SELECT probe_id, label AS pred_label, n_votes
    FROM (SELECT probe_id, label, n_votes,
                 ROW_NUMBER() OVER (PARTITION BY probe_id
                                    ORDER BY n_votes DESC, label ASC) AS r
          FROM votes)
    WHERE r = 1
    """,
)
def q_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority label among each probe's 10 nearest neighbours
    (probes = vec_id 0..4, broadcast against the corpus)."""
    e = load(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    scored = (
        e.crossJoin(broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("pe")), 6).alias("c"),
        )
    )
    rank_w = Window.partitionBy("probe_id").orderBy(F.desc("c"), F.asc("vec_id"))
    votes = (
        scored.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") <= 10)
        .groupBy("probe_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    vote_w = Window.partitionBy("probe_id").orderBy(F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("r", F.row_number().over(vote_w))
        .filter(F.col("r") == 1)
        .select("probe_id", F.col("label").alias("pred_label"), "n_votes")
    )


def _hyperplanes(seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((LSH_TABLES * LSH_BITS, DIM)).astype(np.float64).tolist()


@pandas_udf(ArrayType(LongType()))
def lsh_buckets(emb: pd.Series) -> pd.Series:
    """Per-table random-hyperplane bucket ids: ``array<long>`` of
    LSH_TABLES entries, table t's id from its k sign bits (MSB-first).

    Signature computation is the one dense-numeric kernel in the ANN
    path, so it runs as an Arrow-batched BLAS matmul — (batch x 64) @
    (64 x L*k) per Arrow batch — instead of interpreted Catalyst
    higher-order functions.  The expression spelling
    (``lsh_buckets_expr``) benched 2.8 ms/row single-threaded (boxed
    zip_with/aggregate per plane, plus seconds of Janino compile when
    unrolled); the matmul is ~1 us/row and identical bits (sign flips
    only at projections within float round-off of zero, probability ~0
    for continuous planes).  At 100 TB this is the map-side stage that
    writes each table's bucket-partitioned layout."""
    planes = np.asarray(_hyperplanes())  # (L*k, DIM)
    if len(emb) == 0:
        return pd.Series([], dtype=object)
    x = np.stack(emb.to_numpy()).astype(np.float64)  # (n, DIM)
    signs = (x @ planes.T) > 0  # (n, L*k)
    bits = signs.reshape(len(x), LSH_TABLES, LSH_BITS).astype(np.int64)
    weights = 1 << np.arange(LSH_BITS - 1, -1, -1)  # MSB-first
    ids = bits @ weights  # (n, LSH_TABLES)
    return pd.Series(list(ids))


def lsh_buckets_expr(emb: Column) -> Column:
    """Pure-JVM spelling of ``lsh_buckets`` (one nested-list Literal,
    lambda folds); kept as the cross-check the parity test runs against
    the vectorized kernel, and as the no-Python fallback."""
    planes = F.lit(_hyperplanes())
    projs = F.transform(
        planes,
        lambda p: F.aggregate(
            F.zip_with(emb, p, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    # Bind `projs` via a lambda variable (Catalyst re-inline gotcha),
    # then fold each table's k signs into its bucket id.
    return F.element_at(
        F.transform(
            F.array(projs),
            lambda ps: F.transform(
                F.sequence(F.lit(0), F.lit(LSH_TABLES - 1)),
                lambda t: F.aggregate(
                    F.sequence(F.lit(0), F.lit(LSH_BITS - 1)),
                    F.lit(0).cast("long"),
                    lambda acc, i: acc * 2
                    + F.when(
                        F.element_at(ps, (t * LSH_BITS + i + 1).cast("int")) > 0, 1
                    )
                    .otherwise(0)
                    .cast("long"),
                ),
            ),
        ),
        1,
    )


@query("q_sim_ann_lsh")  # approximate -> rows-only check
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via multi-table LSH: score ONLY vectors sharing a bucket with
    the probe in at least one of the L tables (Hamming-1 multi-probe per
    table widens each lookup by k buckets).

    At 100 TB each table is stored partitioned by its bucket column, so
    a probe reads L*(k+1) partitions instead of the corpus; here the
    buckets are computed on the fly and the (table, bucket) equi-join
    conveys the same plan shape.  Recall on the fixture's brute-force
    top-10 is asserted in tests."""
    e = spread(load(spark, sf_dir, "embeddings"), spark).withColumn(
        "buckets", lsh_buckets(F.col("embedding"))
    )
    keyed = e.select(
        "vec_id",
        "label",
        "embedding",
        F.posexplode("buckets").alias("t", "bucket"),
    )
    probe = (
        e.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qe"), F.posexplode("buckets").alias("t", "pb"))
        .select(
            "qe",
            "t",
            F.explode(
                F.array(
                    F.col("pb"),
                    *[F.col("pb").bitwiseXOR(F.lit(1 << i)) for i in range(LSH_BITS)],
                )
            ).alias("qbucket"),
        )
    )
    cands = (
        keyed.join(
            broadcast(probe),
            (keyed["t"] == probe["t"])
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != 0),
        )
        # a vector can match in several tables/probes — score it once
        .dropDuplicates(["vec_id"])
    )
    return (
        cands.select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qe")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "q_dedup_embedding",
    f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6) >= {NEAR_DUP_TAU}
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos >= 0.4), exact all-pairs.

    Block-GEMM plan: vectors are hashed into EMB_BLOCKS blocks, every
    row is replicated to each block PAIR it belongs to, and one
    `applyInPandas` per pair runs a NumPy matrix multiply over the two
    blocks.  Shuffle volume is EMB_BLOCKS x the table (vs n x for a
    naive self-join) and the n^2 arithmetic runs as BLAS, not as
    per-pair interpreted expressions — 35x faster than the
    zip_with/aggregate formulation at sf0.1 and the standard shape for
    exact all-pairs at cluster scale (pick EMB_BLOCKS ~ n_executors).

    This is the correctness baseline; the LSH bucketing above is how the
    same query avoids the n^2 entirely (near-dup pairs almost always
    share a bucket)."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tagged = e.withColumn("blk", (F.col("vec_id") % EMB_BLOCKS).cast("int"))
    rep = tagged.select(
        "vec_id",
        "embedding",
        "blk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.least(F.col("blk"), F.lit(j)).alias("pa"),
                        F.greatest(F.col("blk"), F.lit(j)).alias("pb"),
                    )
                    for j in range(EMB_BLOCKS)
                ]
            )
        ).alias("pk"),
    ).select("vec_id", "embedding", "blk", "pk.pa", "pk.pb")
    return rep.groupBy("pa", "pb").applyInPandas(
        _gemm_block_pairs, "vec_a long, vec_b long, cos_sim double"
    )


def _gemm_block_pairs(pdf) -> "pd.DataFrame":
    """All qualifying cosine pairs between the two blocks of one group.

    Dot products are float64 sums of exact float32*float32 products —
    same expression shape as the SQL oracle; only the summation order
    differs (BLAS pairwise vs sequential), a ~1e-15 wobble absorbed by
    the 6 dp rounding."""
    import pandas as pd

    pa, pb = int(pdf["pa"].iat[0]), int(pdf["pb"].iat[0])
    a = pdf[pdf["blk"] == pa]
    b = a if pa == pb else pdf[pdf["blk"] == pb]
    ma = np.stack(a["embedding"].to_numpy()).astype(np.float64)
    mb = np.stack(b["embedding"].to_numpy()).astype(np.float64)
    dots = ma @ mb.T
    c = np.round(dots / np.outer(np.linalg.norm(ma, axis=1), np.linalg.norm(mb, axis=1)), 6)
    ia = a["vec_id"].to_numpy()
    ib = b["vec_id"].to_numpy()
    # each unordered cross-block pair appears exactly once in this group;
    # within-block groups see both (x,y) and (y,x) -> keep the id-ordered half
    mask = c >= NEAR_DUP_TAU
    if pa == pb:
        mask &= ia[:, None] < ib[None, :]
    r, col = np.nonzero(mask)
    va, vb = ia[r], ib[col]
    lo, hi = np.minimum(va, vb), np.maximum(va, vb)
    return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cos_sim": c[r, col]})


N_CENTROIDS = 16  # IVF coarse-quantizer cells; ~sqrt(n) per classic IVF sizing
N_PROBE_CELLS = 2  # cells searched per probe


@query("q_sim_ann_ivf")  # approximate -> rows-only check
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF (inverted-file) coarse quantization.

    Cells are defined by N_CENTROIDS deterministic centroids (the
    lowest-vec_id vectors — swap in k-means centroids without touching
    the plan); every vector is assigned to its nearest centroid by
    cosine (one broadcast pass over the corpus), and a probe scores only
    the vectors in its N_PROBE_CELLS nearest cells.

    At 100 TB the assignment runs once at ingest and the table is
    written partitioned by `cent_id`, so a probe reads nprobe partitions
    — same storage story as the LSH variant, but with data-adaptive
    cells (better recall on clustered embeddings at equal probe cost).
    """
    e = load(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
    )
    scored = e.crossJoin(broadcast(cents)).select(
        "vec_id",
        "label",
        "embedding",
        "cent_id",
        cosine(F.col("embedding"), F.col("ce")).alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cent_id"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    assigned = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "label", "embedding", "cent_id"
    )
    probe_cells = (
        ranked.filter((F.col("vec_id") == 0) & (F.col("rn") <= N_PROBE_CELLS))
        .select("cent_id")
    )
    qe = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    cands = (
        assigned.join(broadcast(probe_cells), "cent_id")
        .filter(F.col("vec_id") != 0)
        .crossJoin(broadcast(qe))
    )
    return (
        cands.select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qe")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# K-means clustering (Lloyd iterations) — the IVF trainer
# ---------------------------------------------------------------------------

KMEANS_K = 8
_KM_SCALE = "1000000.0"

# Squared-euclidean fold, sequential in array order: LIST_REDUCE is a
# left fold exactly like Spark's F.aggregate, so the double is
# bit-identical cross-engine (no reassociation).
_KM_DIST = (
    "LIST_REDUCE(LIST_TRANSFORM(RANGE(1, LEN(e) + 1), "
    "i -> (e[i] - ce[i]) * (e[i] - ce[i])), (x, y) -> x + y)"
)

_KMEANS_ORACLE = f"""
    WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    c1 AS (SELECT vec_id AS cent_id, e AS ce FROM emb WHERE vec_id < {KMEANS_K}),
    d1 AS (
        SELECT emb.vec_id, c1.cent_id, {_KM_DIST} AS d
        FROM emb CROSS JOIN c1
    ),
    a1 AS (
        SELECT vec_id, (MIN({{'d': d, 'c': cent_id}})).c AS cent_id
        FROM d1 GROUP BY vec_id
    ),
    coords AS (
        SELECT a1.cent_id, r.i AS pos,
               CAST(SUM(CAST(ROUND(e[r.i] * {_KM_SCALE}) AS BIGINT)) AS DOUBLE)
                   / (COUNT(*) * {_KM_SCALE}) AS coord
        FROM emb JOIN a1 USING (vec_id),
             UNNEST(RANGE(1, LEN(e) + 1)) AS r(i)
        GROUP BY a1.cent_id, r.i
    ),
    c2 AS (
        SELECT cent_id, LIST(coord ORDER BY pos) AS ce FROM coords GROUP BY cent_id
    ),
    d2 AS (
        SELECT emb.vec_id, emb.label, c2.cent_id, {_KM_DIST} AS d
        FROM emb CROSS JOIN c2
    )
    SELECT vec_id, label,
           (MIN({{'d': d, 'c': cent_id}})).c AS cluster,
           ROUND((MIN({{'d': d, 'c': cent_id}})).d, 6) AS dist
    FROM d2 GROUP BY vec_id, label
"""


def _sq_dist(a: Column, b: Column) -> Column:
    """Left-fold squared euclidean distance — the Spark twin of
    _KM_DIST (0.0 + t1 + t2 + ... == t1 + t2 + ... exactly, since every
    term is a non-negative square)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the K centroids, compute
    n*K distances, keep the min via a partial-aggregating min-struct
    (ties break to the lowest cent_id — lexicographic struct order,
    same rule as the oracle's MIN over {'d', 'c'})."""
    scored = e.crossJoin(broadcast(cents)).select(
        "vec_id",
        "label",
        "embedding",
        "cent_id",
        _sq_dist(F.col("embedding"), F.col("ce")).alias("d"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.first("label").alias("label"),
            F.min(F.struct(F.col("d"), F.col("cent_id"))).alias("m"),
        )
        .select("vec_id", "label", F.col("m.cent_id").alias("cent_id"),
                F.col("m.d").alias("d"))
    )


@query("q_cluster_kmeans", _KMEANS_ORACLE)
def q_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means, 2 fixed iterations, K={K} centroids
    seeded from the lowest vec_ids — the trainer that produces
    q_sim_ann_ivf's coarse-quantizer cells (similarity.py:374 notes the
    swap-in point).

    Determinism contract (what makes an iterative float algorithm
    oracle-checkable at all): (a) distances are sequential left-folds —
    bit-identical in both engines, no reassociation; (b) the centroid
    UPDATE quantizes member coordinates to 6 dp integers and sums THOSE
    (order-free exact integer sum, one IEEE division back) — a float
    mean's partial-agg order would otherwise drift ULPs and flip
    assignments; (c) argmin ties break on cent_id via min-struct.

    Scale shape per iteration: one broadcast of K*dim floats out, one
    partial-aggregating min-struct shuffle keyed by vec_id for
    assignment, one (cent_id, dim)-keyed integer-sum shuffle for the
    update — the classic distributed k-means layout (no driver-side
    collect; centroids stay a DataFrame end to end)."""
    e = load(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
    )
    a1 = _assign(e, cents).select("vec_id", "cent_id")
    members = e.join(a1, "vec_id").select(
        "cent_id", F.posexplode(F.col("embedding")).alias("pos", "val")
    )
    coords = members.groupBy("cent_id", "pos").agg(
        (
            F.sum(F.round(F.col("val").cast("double") * 1_000_000.0).cast("long"))
            .cast("double")
            / (F.count(F.lit(1)) * 1_000_000.0)
        ).alias("coord")
    )
    c2 = (
        coords.groupBy("cent_id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "coord"))).alias("pc"))
        .select("cent_id", F.transform(F.col("pc"), lambda s: s.coord).alias("ce"))
    )
    a2 = _assign(e, c2)
    return a2.select(
        "vec_id",
        "label",
        F.col("cent_id").alias("cluster"),
        F.round("d", 6).alias("dist"),
    )
