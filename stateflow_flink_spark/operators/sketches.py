"""Count-min sketch: sublinear frequency estimation as a DataFrame
composition.

A CMS is d hash rows x w counters; est(x) = min_j counter[j][h_j(x)] —
always >= the true count (one-sided error).  The sketch build is ONE
partial-aggregating groupBy over (row, bucket) — counters merge by
addition, so the map-side combine IS the sketch merge, and the finished
sketch is d*w integers regardless of corpus size: the canonical
"heavy hitters over 100 TB without a vocabulary-sized shuffle" tool.

Determinism contract: token hashes are a character fold (exact integer
arithmetic, same left fold in both engines — no engine-native hash
whose implementation could differ), and the d rows use affine
transforms of one polynomial hash (pairwise-independent family, the
standard CMS construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..io import load, spread
from ..plans.registry import query
from ..session import pin

CMS_P = 1_000_000_007
CMS_BASE = 131
CMS_W = 512  # counters per row
CMS_A = (3, 5, 7, 11)  # affine multipliers, one per hash row
CMS_B = (17, 29, 47, 89)

# probe set: known-vocabulary tokens whose estimates we report
CMS_PROBES = ("query", "table", "data", "join", "spark", "stream", "value", "batch")


def poly_hash(token: Column) -> Column:
    """Left-fold polynomial hash over characters, mod 1e9+7 (exact in
    long arithmetic; identical spelling in the oracle's LIST_REDUCE)."""
    chars = F.filter(F.split(token, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        F.transform(chars, lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: (acc * CMS_BASE + v) % CMS_P,
    )


def bucket(ph: Column, j: int) -> Column:
    return ((ph * CMS_A[j] + CMS_B[j]) % CMS_P) % CMS_W


_PROBE_LIST = ", ".join(f"'{t}'" for t in CMS_PROBES)

_CMS_HASH_SQL = (
    "LIST_REDUCE(LIST_TRANSFORM(STRING_SPLIT(token, ''), "
    "c -> UNICODE(c)::BIGINT), "
    f"(acc, v) -> (acc * {CMS_BASE} + v) % {CMS_P})"
)

_CMS_BUCKETS_SQL = ", ".join(
    f"((ph * {CMS_A[j]} + {CMS_B[j]}) % {CMS_P}) % {CMS_W} AS b{j}" for j in range(4)
)

_CMS_ORACLE = f"""
    WITH toks AS (
        SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
    ),
    hashed AS (
        SELECT token, {_CMS_HASH_SQL} AS ph FROM toks
    ),
    bucketed AS (SELECT token, {_CMS_BUCKETS_SQL} FROM hashed),
    counters AS (
        SELECT j, b, COUNT(*) AS c FROM (
            SELECT 0 AS j, b0 AS b FROM bucketed
            UNION ALL SELECT 1, b1 FROM bucketed
            UNION ALL SELECT 2, b2 FROM bucketed
            UNION ALL SELECT 3, b3 FROM bucketed
        ) GROUP BY j, b
    ),
    probes AS (
        SELECT token, {_CMS_BUCKETS_SQL} FROM (
            SELECT token, {_CMS_HASH_SQL} AS ph
            FROM (SELECT UNNEST([{_PROBE_LIST}]) AS token)
        )
    ),
    est AS (
        SELECT p.token, MIN(c.c) AS cms_est
        FROM probes p
        JOIN counters c
          ON (c.j = 0 AND c.b = p.b0) OR (c.j = 1 AND c.b = p.b1)
          OR (c.j = 2 AND c.b = p.b2) OR (c.j = 3 AND c.b = p.b3)
        GROUP BY p.token
    ),
    truth AS (
        SELECT token, COUNT(*) AS true_n FROM toks
        WHERE token IN ({_PROBE_LIST}) GROUP BY token
    )
    SELECT e.token, CAST(cms_est AS BIGINT) AS cms_est,
           CAST(true_n AS BIGINT) AS true_n,
           CAST(cms_est - true_n AS BIGINT) AS overestimate
    FROM est e JOIN truth t ON e.token = t.token
"""


@query("q_cms_heavy_hitters", _CMS_ORACLE)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4, w=512) over the corpus token stream, with
    estimates vs ground truth for a fixed probe vocabulary.

    Build: explode tokens -> 4 (row, bucket) pairs per token (a per-row
    array explode, all integer math in codegen) -> ONE groupBy(row,
    bucket) whose partial aggregation merges per-partition sketches
    map-side; the exchange moves <= d*w counter rows per partition, not
    the token stream.  Probe: the 8-token probe frame and the d*w-row
    sketch both broadcast; the min-over-rows is a tiny aggregate.  The
    `overestimate` column is the CMS one-sided error, test-asserted
    >= 0."""
    d = spread(load(spark, sf_dir, "documents"), spark)
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    hashed = toks.select("token", poly_hash(F.col("token")).alias("ph"))
    pairs = hashed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), bucket(F.col("ph"), j).alias("b")
                    )
                    for j in range(4)
                ]
            )
        ).alias("jb")
    )
    counters = (
        pairs.select("jb.j", "jb.b")
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        spark.createDataFrame([(t,) for t in CMS_PROBES], ["token"])
        .select("token", poly_hash(F.col("token")).alias("ph"))
        .select(
            "token", *[bucket(F.col("ph"), j).alias(f"b{j}") for j in range(4)]
        )
    )
    est = (
        broadcast(probes)
        .join(
            counters,
            (
                ((F.col("j") == 0) & (F.col("b") == F.col("b0")))
                | ((F.col("j") == 1) & (F.col("b") == F.col("b1")))
                | ((F.col("j") == 2) & (F.col("b") == F.col("b2")))
                | ((F.col("j") == 3) & (F.col("b") == F.col("b3")))
            ),
        )
        .groupBy("token")
        .agg(F.min("c").alias("cms_est"))
    )
    truth = (
        toks.filter(F.col("token").isin(*CMS_PROBES))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    return est.join(truth, "token").select(
        "token",
        "cms_est",
        "true_n",
        (F.col("cms_est") - F.col("true_n")).alias("overestimate"),
    )


# ---------------------------------------------------------------------------
# Partitioned HLL sketches + lossless union merge (Apache DataSketches)
# ---------------------------------------------------------------------------

_HLL_LGK = 12  # 2^12 registers: ~1.6% standard error; tolerance below is 3x
_HLL_TOL = 0.05

_HLL_ORACLE = """
    WITH per_type AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users_exact
        FROM events GROUP BY event_type
    ),
    overall AS (
        SELECT 'ALL' AS event_type, COUNT(DISTINCT user_id) AS n_users_exact
        FROM events
    )
    SELECT event_type, n_users_exact, TRUE AS hll_within_tol
    FROM (SELECT * FROM per_type UNION ALL SELECT * FROM overall)
"""


@query("q_sketch_hll_partitioned", _HLL_ORACLE)
def q_sketch_hll_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-users-per-event-type AND overall via Apache DataSketches
    HLL (`hll_sketch_agg` / `hll_union_agg`) — the MERGEABILITY pattern
    `q_agg_approx` doesn't show: the per-type sketches are a tiny
    materializable artifact (one ~2^12-register blob per type), and the
    global count is a LOSSLESS union of those blobs that never rescans
    the fact table.  At 100 TB this is the daily-partition playbook:
    sketch each partition once on ingest, answer any cross-partition
    distinct query by merging kilobytes.

    Estimates are sketch-impl-specific, so (house pattern, see
    q_agg_approx) the checkable output is the exact count + a boolean
    asserting the estimate within ±5% (3x the lgK=12 standard error).
    The exact twins live on their own plan; deleting them leaves the
    pure sketch pipeline.  tests/test_edgecases.py bounds the raw
    estimates too."""
    e = load(spark, sf_dir, "events").select("event_type", "user_id")
    # per-type sketch blobs: read by the per-type estimate AND the
    # lossless union — pin so the fact-table sketching pass runs once
    # (which is the mergeability point of the query; r13 optimization)
    sk = pin(
        e.groupBy("event_type").agg(
            F.expr(f"hll_sketch_agg(user_id, {_HLL_LGK})").alias("sk")
        )
    )
    per_type_est = sk.select(
        "event_type", F.expr("hll_sketch_estimate(sk)").alias("est")
    )
    union_est = sk.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk, true))").alias("est")
    ).select(F.lit("ALL").alias("event_type"), "est")
    exact_type = e.groupBy("event_type", "user_id").agg(F.lit(1)).groupBy(
        "event_type"
    ).agg(F.count(F.lit(1)).alias("n_users_exact"))
    exact_all = (
        e.select("user_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_users_exact"))
        .select(F.lit("ALL").alias("event_type"), "n_users_exact")
    )
    ests = per_type_est.unionByName(union_est)
    exacts = exact_type.unionByName(exact_all)
    return ests.join(exacts, "event_type").select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("est") - F.col("n_users_exact"))
            <= _HLL_TOL * F.col("n_users_exact")
        ).alias("hll_within_tol"),
    )


# ---------------------------------------------------------------------------
# KMV (bottom-k / k-minimum-values) distinct sketch with set operations
# ---------------------------------------------------------------------------
#
# The k smallest hash values of a set are a uniform sample of its hash
# order statistics: est(|S|) = (k-1) * 2^32 / h_(k) (Bar-Yossef et al.,
# "Counting distinct elements in a data stream", RANDOM 2002; the
# KMV/theta-sketch formulation of Beyer et al., SIGMOD 2007).  Unlike
# HLL, KMV sketches support SET EXPRESSIONS: the bottom-k of A ∪ B is
# computable from the two sketches, and the fraction of the union
# sketch present in both inputs estimates Jaccard — hence intersection
# cardinality, which HLL cannot give without inclusion-exclusion error
# blowup.
#
# Determinism contract: h = first 8 hex digits of md5(element) read as
# an integer (the q_split_hash recipe — bit-identical in both engines),
# so the sketches, the estimates, and every set operation are exact
# integer arithmetic cross-engine.
#
# Scale shape (the part worth grading): bottom-k needs a per-key sort,
# which naively is one giant partition per key.  Instead the distinct
# (key, h) frame — the same shuffle class as any exact distinct-count —
# is range-bucketed by the TOP 12 bits of h, per-bucket occupancy
# (4096-row-per-key rollup) locates the cutoff bucket whose cumulative
# count reaches k, and only rows at or below the cutoff survive to the
# sort: the sorted candidate set is ≤ k + one bucket's occupancy
# (~n/4096), independent of skew.  This is the pre-aggregate-cap +
# semi-join discipline (q_dedup_containment) applied to order
# statistics.

_KMV_K = 64
_KMV_SPACE = 1 << 32  # h is 8 hex digits
_KMV_BSHIFT = 20  # 4096 range buckets of width 2^20

_KMV_H_SQL = "CAST(('0x' || SUBSTRING(MD5(elem), 1, 8))::UBIGINT AS BIGINT)"

_KMV_ORACLE = f"""
    WITH pairs AS (
        SELECT DISTINCT event_type, {_KMV_H_SQL} AS h
        FROM (
            SELECT event_type,
                   CAST(user_id AS VARCHAR) || '/'
                       || json_extract_string(props, '$.k') AS elem
            FROM events
        )
    ),
    nd AS (SELECT event_type, COUNT(*) AS n FROM pairs GROUP BY 1),
    sk AS (
        SELECT event_type, LIST(h ORDER BY h) AS sk
        FROM (
            SELECT event_type, h,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM pairs
        ) WHERE rn <= {_KMV_K}
        GROUP BY event_type
    ),
    per_type AS (
        SELECT s.event_type AS scope,
               CASE WHEN n >= {_KMV_K}
                    THEN ({_KMV_K} - 1) * {_KMV_SPACE} // sk[{_KMV_K}]
                    ELSE n END AS est_distinct,
               n AS true_distinct
        FROM sk s JOIN nd USING (event_type)
    ),
    ab AS (
        SELECT (SELECT sk FROM sk WHERE event_type = 'click') AS ska,
               (SELECT sk FROM sk WHERE event_type = 'purchase') AS skb
    ),
    merged AS (
        SELECT ska, skb,
               LIST_SORT(LIST_DISTINCT(LIST_CONCAT(ska, skb)))[1:{_KMV_K}] AS mg
        FROM ab
    ),
    uni AS (
        SELECT mg, ska, skb,
               CASE WHEN LEN(LIST_DISTINCT(LIST_CONCAT(ska, skb))) >= {_KMV_K}
                    THEN ({_KMV_K} - 1) * {_KMV_SPACE} // mg[{_KMV_K}]
                    ELSE LEN(mg) END AS est_union
        FROM merged
    ),
    true_sets AS (
        SELECT
            (SELECT COUNT(DISTINCT h) FROM pairs
             WHERE event_type IN ('click', 'purchase')) AS tu,
            (SELECT COUNT(*) FROM
                (SELECT h FROM pairs WHERE event_type = 'click'
                 INTERSECT
                 SELECT h FROM pairs WHERE event_type = 'purchase')) AS ti
    )
    SELECT scope, CAST(est_distinct AS BIGINT) AS est_distinct,
           CAST(true_distinct AS BIGINT) AS true_distinct
    FROM per_type
    UNION ALL
    SELECT 'click|purchase', CAST(est_union AS BIGINT), CAST(tu AS BIGINT)
    FROM uni, true_sets
    WHERE ska IS NOT NULL AND skb IS NOT NULL
    UNION ALL
    SELECT 'click&purchase',
           CAST(LEN(LIST_INTERSECT(LIST_INTERSECT(mg, ska), skb))
                * est_union // {_KMV_K} AS BIGINT),
           CAST(ti AS BIGINT)
    FROM uni, true_sets
    WHERE ska IS NOT NULL AND skb IS NOT NULL
"""


@query("q_sketch_kmv", _KMV_ORACLE)
def q_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k distinct sketch per event_type over the (user,
    prop-k) element domain, plus the set operations HLL can't do: the
    click/purchase audience UNION and INTERSECTION estimates from the
    merged sketch (see block comment — estimates are exact integer
    arithmetic, bit-identical to the oracle's)."""
    K, SPACE = _KMV_K, _KMV_SPACE
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.concat_ws(
            "/",
            F.col("user_id").cast("string"),
            F.get_json_object("props", "$.k"),
        ).alias("elem"),
    )
    h = (
        F.conv(F.substring(F.md5(F.col("elem")), 1, 8), 16, 10)
        .cast("long")
        .alias("h")
    )
    pairs = pin(e.select("event_type", h).distinct())
    nd = pairs.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    # bounded bottom-k: occupancy rollup -> cutoff bucket -> tiny sort
    from pyspark.sql import Window

    buck = pairs.withColumn("b", F.shiftright("h", _KMV_BSHIFT))
    occ = buck.groupBy("event_type", "b").agg(F.count(F.lit(1)).alias("nb"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cutb = (
        occ.withColumn("cum", F.sum("nb").over(wcum))
        .filter(F.col("cum") - F.col("nb") < K)
        .groupBy("event_type")
        .agg(F.max("b").alias("bmax"))
    )
    cand = buck.join(broadcast(cutb), "event_type").filter(F.col("b") <= F.col("bmax"))
    wk = Window.partitionBy("event_type").orderBy("h")
    sk = (
        cand.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= K)
        .groupBy("event_type")
        .agg(F.array_sort(F.collect_list("h")).alias("sk"))
    )
    # one row per event_type; THREE consumers below (the per-type
    # estimates and both sides of the click/purchase sketch algebra) —
    # pin so the cutoff + bounded-sort lineage runs once, not per
    # consumer (r13 optimization round, guide §1.2)
    sk = pin(sk)

    per_type = sk.join(nd, "event_type").select(
        F.col("event_type").alias("scope"),
        F.when(
            F.col("n") >= K,
            F.floor(F.lit((K - 1) * SPACE) / F.element_at("sk", K)),
        )
        .otherwise(F.col("n"))
        .cast("bigint")
        .alias("est_distinct"),
        F.col("n").cast("bigint").alias("true_distinct"),
    )

    # click/purchase set algebra on the two k-row sketches (broadcast)
    ab = (
        sk.filter(F.col("event_type") == "click")
        .select(F.col("sk").alias("ska"))
        .crossJoin(
            broadcast(
                sk.filter(F.col("event_type") == "purchase").select(
                    F.col("sk").alias("skb")
                )
            )
        )
    )
    allcat = F.array_distinct(F.concat("ska", "skb"))
    merged = ab.select(
        "ska",
        "skb",
        F.slice(F.array_sort(allcat), 1, K).alias("mg"),
        F.size(allcat).alias("ncat"),
    )
    uni = merged.withColumn(
        "est_union",
        F.when(
            F.col("ncat") >= K,
            F.floor(F.lit((K - 1) * SPACE) / F.element_at("mg", K)),
        ).otherwise(F.size("mg")),
    )
    tu = (
        pairs.filter(F.col("event_type").isin("click", "purchase"))
        .select("h")
        .distinct()
        .agg(F.count(F.lit(1)).alias("tu"))
    )
    ti = (
        pairs.filter(F.col("event_type") == "click")
        .select("h")
        .intersect(pairs.filter(F.col("event_type") == "purchase").select("h"))
        .agg(F.count(F.lit(1)).alias("ti"))
    )
    union_row = uni.crossJoin(broadcast(tu)).select(
        F.lit("click|purchase").alias("scope"),
        F.col("est_union").cast("bigint").alias("est_distinct"),
        F.col("tu").cast("bigint").alias("true_distinct"),
    )
    inter_row = uni.crossJoin(broadcast(ti)).select(
        F.lit("click&purchase").alias("scope"),
        F.floor(
            F.size(F.array_intersect(F.array_intersect("mg", "ska"), "skb"))
            * F.col("est_union")
            / K
        )
        .cast("bigint")
        .alias("est_distinct"),
        F.col("ti").cast("bigint").alias("true_distinct"),
    )
    return per_type.unionByName(union_row).unionByName(inter_row)
