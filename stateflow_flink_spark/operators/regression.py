"""Distributed linear-model training as DataFrame ops — the gradient-
descent sibling of the k-means trainer (similarity.q_cluster_kmeans).

Fixed-step batch gradient descent for least-squares regression of the
embedding table's ``label`` on its 64 features (+ bias), run for
GD_ITERS iterations entirely as Spark aggregations: per iteration one
broadcast of the 65 weights out, one residual pass over the corpus, and
one (dim)-keyed integer-sum shuffle for the gradient — the exact
layout a parameter-server-free distributed trainer uses, with NO
driver-side collect (weights stay a one-row DataFrame end to end).

Why squared loss and not logistic: the determinism contract.  Every
arithmetic step here is +,*,/ on doubles plus integer sums, which both
engines evaluate bit-identically under the numerics.py discipline
(sequential folds for dot products, ROUND(v*1e6) quantization before
every cross-row sum, one IEEE division by an exact scalar).  A sigmoid
would drag in exp(), whose last-ULP behavior differs between JVM
Math.exp and C libm — unverifiable by value hash.  Same reasoning as
the k-means trainer's quantized centroid update (similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..io import load
from ..plans.registry import query

GD_ITERS = 2
GD_LR = 0.125  # 2^-3: exactly representable, lr*grad introduces one rounding
N_DIMS = 65  # 64 features + bias
_Q = "1000000.0"


def _dot_fold(x, w):
    """Sequential left fold of sum_k x[k]*w[k] — bit-identical to the
    oracle's LIST_REDUCE (no reassociation)."""
    return F.aggregate(
        F.zip_with(x, w, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _gd_step(base: DataFrame, w_df: DataFrame) -> DataFrame:
    """One GD iteration: residual pass + quantized gradient sum +
    weight update.  Returns the next one-row weights DataFrame
    (w array<double>, n long)."""
    j = base.crossJoin(broadcast(w_df.select("w")))
    r = (_dot_fold(F.col("x"), F.col("w")) - F.col("y")).alias("r")
    contrib = j.select(
        r,
        "x",
        "w",
        "n",
    ).select(
        "w",
        "n",
        F.posexplode(
            F.transform(
                F.col("x"),
                lambda xk: F.round(F.col("r") * xk * 1_000_000.0).cast("long"),
            )
        ).alias("dim", "q"),
    )
    grads = contrib.groupBy("dim").agg(
        F.sum("q").alias("s"),
        F.first("n").alias("n"),
        F.first(F.element_at("w", F.col("dim") + 1)).alias("wj"),
    )
    upd = grads.select(
        "dim",
        "n",
        (
            F.col("wj")
            - GD_LR
            * (
                F.col("s").cast("double")
                / (F.col("n").cast("double") * 1_000_000.0)
            )
        ).alias("wj"),
    )
    return upd.groupBy().agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "wj"))), lambda s: s.wj
        ).alias("w"),
        F.first("n").alias("n"),
    )


_GD_CTES = f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] || [1.0] AS x,
               CAST(label AS DOUBLE) AS y
        FROM embeddings
    ),
    cnt AS (SELECT COUNT(*) AS n FROM emb),
    -- iteration 1: w0 = 0 -> residual is exactly -y
    g1 AS (
        SELECT t.j,
               SUM(CAST(ROUND((0.0 - y) * x[t.j] * {_Q}) AS BIGINT)) AS s
        FROM emb, UNNEST(RANGE(1, {N_DIMS} + 1)) AS t(j)
        GROUP BY t.j
    ),
    w1 AS (
        SELECT j, 0.0 - {GD_LR} * (CAST(s AS DOUBLE)
                                   / (CAST(n AS DOUBLE) * {_Q})) AS wj
        FROM g1, cnt
    ),
    w1l AS (SELECT LIST(wj ORDER BY j) AS w FROM w1),
    -- iteration 2: full residual fold against w1
    r2 AS (
        SELECT emb.vec_id, emb.x, emb.y,
               LIST_REDUCE(LIST_TRANSFORM(RANGE(1, {N_DIMS} + 1),
                                          k -> x[k] * w[k]),
                           (a, b) -> a + b) - y AS r
        FROM emb, w1l
    ),
    g2 AS (
        SELECT t.j, SUM(CAST(ROUND(r * x[t.j] * {_Q}) AS BIGINT)) AS s
        FROM r2, UNNEST(RANGE(1, {N_DIMS} + 1)) AS t(j)
        GROUP BY t.j
    ),
    w2 AS (
        SELECT w1.j, w1.wj - {GD_LR} * (CAST(g2.s AS DOUBLE)
                                        / (CAST(cnt.n AS DOUBLE) * {_Q})) AS wj
        FROM w1 JOIN g2 ON g2.j = w1.j, cnt
    )
"""

_GD_ORACLE = f"""
    {_GD_CTES}
    SELECT CAST(j - 1 AS INT) AS dim, ROUND(wj, 6) AS weight FROM w2
"""

_GD_EVAL_ORACLE = f"""
    {_GD_CTES},
    w2l AS (SELECT LIST(wj ORDER BY j) AS w FROM w2),
    resid AS (
        SELECT LIST_REDUCE(LIST_TRANSFORM(RANGE(1, {N_DIMS} + 1),
                                          k -> x[k] * w[k]),
                           (a, b) -> a + b) - y AS r
        FROM emb, w2l
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(ROUND(r * r * {_Q}) AS BIGINT)) AS DOUBLE)
                 / (COUNT(*) * {_Q}), 6) AS mse,
           ROUND(CAST(SUM(CAST(ROUND(ABS(r) * {_Q}) AS BIGINT)) AS DOUBLE)
                 / (COUNT(*) * {_Q}), 6) AS mae
    FROM resid
"""


@query("q_regression_gd", _GD_ORACLE)
def q_regression_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gradient descent for least-squares label regression over
    the embedding table: {GD_ITERS} fixed iterations, lr {GD_LR},
    weights initialized to zero, bias as a constant appended feature.

    Determinism contract (see module docstring): dot products are
    sequential folds, every cross-row gradient sum is quantized to
    exact integers first, and each weight update is one IEEE
    multiply-subtract on operands both engines computed bit-identically
    — so even after two iterations of feedback the 65 weights
    hash-match the SQL oracle at 6 dp.

    Scale shape per iteration (the classic data-parallel GD layout):
    broadcast 65 doubles out, one corpus pass computing residuals, one
    partial-aggregated (dim)-keyed shuffle of 65 integer partial sums
    per partition, one 65-row update — no parameter server, no driver
    round-trip, weights remain a one-row DataFrame."""
    _, w_df = _train(spark, sf_dir)
    return w_df.select(
        F.posexplode(F.col("w")).alias("dim", "weight")
    ).select("dim", F.round("weight", 6).alias("weight"))


def _train(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(base rows, trained one-row weights DF) after GD_ITERS steps."""
    e = load(spark, sf_dir, "embeddings")
    base = e.select(
        F.concat(
            F.transform(F.col("embedding"), lambda v: v.cast("double")),
            F.array(F.lit(1.0)),
        ).alias("x"),
        F.col("label").cast("double").alias("y"),
    )
    cnt = base.agg(F.count(F.lit(1)).alias("n"))
    base = base.crossJoin(broadcast(cnt))
    w_df = cnt.select(
        F.array_repeat(F.lit(0.0), N_DIMS).alias("w"), F.col("n")
    )
    for _ in range(GD_ITERS):
        w_df = _gd_step(base, w_df)
    return base, w_df


@query("q_regression_eval", _GD_EVAL_ORACLE)
def q_regression_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-set evaluation of the GD model: MSE and MAE of the trained
    weights over the corpus — the metrics pass every training pipeline
    runs after fitting.  Residuals fold against the broadcast weights
    exactly as in training; both error sums are quantized to exact
    integers before aggregation (|r| and r² are per-row IEEE ops both
    engines agree on), so the metrics hash-match the oracle's unrolled
    CTE twin to 6 dp.  One extra corpus pass, one scalar row out."""
    base, w_df = _train(spark, sf_dir)
    j = base.crossJoin(broadcast(w_df.select("w")))
    r = (_dot_fold(F.col("x"), F.col("w")) - F.col("y")).alias("r")
    resid = j.select(r)
    return resid.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum(F.round(F.col("r") * F.col("r") * 1_000_000.0).cast("long"))
            .cast("double")
            / (F.count(F.lit(1)) * 1_000_000.0),
            6,
        ).alias("mse"),
        F.round(
            F.sum(F.round(F.abs("r") * 1_000_000.0).cast("long")).cast("double")
            / (F.count(F.lit(1)) * 1_000_000.0),
            6,
        ).alias("mae"),
    )


# ---------------------------------------------------------------------------
# Per-group closed-form OLS — slope/intercept of extendedprice ~ quantity
# per part brand, exact moments only (no iteration, no collect)
# ---------------------------------------------------------------------------

_GROUP_OLS_ORACLE = """
    WITH j AS (
        SELECT p.p_brand AS brand,
               CAST(ROUND(l.l_quantity * 100) AS BIGINT) AS xq,
               CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS yq
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    m AS (
        SELECT brand,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(xq) AS DOUBLE) AS sx,
               CAST(SUM(yq) AS DOUBLE) AS sy,
               CAST(SUM(xq * xq) AS DOUBLE) AS sxx,
               CAST(SUM(xq * yq) AS DOUBLE) AS sxy
        FROM j GROUP BY brand
    )
    SELECT brand,
           CAST(n AS BIGINT) AS n_rows,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / (n * 100.0), 6) AS intercept
    FROM m
    WHERE n * sxx - sx * sx <> 0
"""


@query("q_group_ols", _GROUP_OLS_ORACLE)
def q_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand simple linear regression (extendedprice on quantity)
    by the closed-form normal equations — the GROUP BY sibling of the
    iterative trainer above and of q_corr_matrix's moment recipe:
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept from the means.
    Thousands of independent per-segment fits in ONE aggregation pass
    is the shape price-elasticity / trend-per-segment jobs take at
    100 TB (a per-group iterative GD would be thousands of barriers).

    Determinism: inputs quantize to cent-integers (2 dp, the
    q_corr_matrix discipline); all five moments are exact integer sums
    (decimal / HUGEINT); slope and intercept are the identical double
    expression tree in both engines, rounded at 6 dp.  The quantization
    scale cancels in the slope; the intercept rescales by /100.

    Scale shape: broadcast the part dim into the fact scan, one
    brand-keyed map-side-combined aggregate (25 brands -> tiny result),
    zero windows, zero self-joins.  Skewed brands are irrelevant: the
    partial aggregate collapses each partition to |brands| rows before
    the exchange."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(broadcast(pt), li.l_partkey == pt.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("xq"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("yq"),
    )
    dec = "decimal(38,0)"
    m = j.groupBy("brand").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("xq").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("yq").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("xq") * F.col("xq")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("xq") * F.col("yq")).cast(dec)).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope_raw = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    # a zero-x-variance brand (every lineitem the same quantity) has no
    # defined slope: Spark /0 yields NULL, DuckDB inf/NaN — both engines
    # drop the brand instead (oracle mirrors with WHERE n*sxx - sx*sx <> 0)
    m = m.filter(n * sxx - sx * sx != 0)
    return m.select(
        "brand",
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(slope_raw, 6).alias("slope"),
        F.round((sy - slope_raw * sx) / (n * 100.0), 6).alias("intercept"),
    )
