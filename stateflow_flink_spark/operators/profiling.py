"""Data profiling — the one-pass table census a pipeline runs first.

Before a 100 TB corpus is joined, deduped, or split, something has to
answer "which columns are trustworthy": null fractions, cardinalities,
ranges, and value distributions.  Warehouse engines ship this as
ANALYZE/profiling; here it is two declarative queries:

  * `q_profile_columns` — per column of mixed types: (nulls, distinct,
    min, max).  Spelled as one UNION branch per column so Catalyst
    prunes each branch's parquet scan to exactly that column: N
    single-column passes read the same bytes as one N-column pass — the
    columnar-storage identity that makes per-column profiling
    embarrassingly parallel.  Distinct counts are exact two-level
    aggregation at fixture scale; the 100 TB spelling swaps in
    `approx_count_distinct`/HLL per column without touching the shape.
  * `q_histogram` — a fixed-width value histogram (the `width_bucket`
    shape): integer bucket arithmetic shared with the oracle, one
    partial-aggregated groupBy, bucket count bounded by the literal.

Both outputs are LONG format (one row per column / bucket) — the shape
that stays stable when the profiled column list grows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query
from ..session import pin

# (column, cast for min/max reporting) — mixed numeric/string/date
_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")

_PROFILE_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_value,
           CAST(MAX({c}) AS VARCHAR) AS max_value
    FROM lineitem
    """
    for c in _PROFILE_COLS
)


@query("q_profile_columns", _PROFILE_ORACLE)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of lineitem (see module docstring): one row per
    profiled column with null count, exact distinct count, and the
    min/max rendered as strings (the type-erased long format every
    profiling UI consumes)."""
    li = load(spark, sf_dir, "lineitem").select(*_PROFILE_COLS)
    parts = []
    for c in _PROFILE_COLS:
        parts.append(
            li.agg(
                F.lit(c).alias("column_name"),
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_HIST_BUCKETS = 20
_HIST_LO, _HIST_HI = 0.0, 600_000.0  # o_totalprice domain at any sf
_HIST_WIDTH = (_HIST_HI - _HIST_LO) / _HIST_BUCKETS

_HIST_ORACLE = f"""
    SELECT bucket,
           CAST(bucket * {_HIST_WIDTH} AS DOUBLE) AS lo,
           CAST((bucket + 1) * {_HIST_WIDTH} AS DOUBLE) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT LEAST(CAST(FLOOR(o_totalprice / {_HIST_WIDTH}) AS BIGINT),
                     {_HIST_BUCKETS - 1}) AS bucket
        FROM orders
    )
    GROUP BY bucket
"""


@query("q_histogram", _HIST_ORACLE)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of o_totalprice (`width_bucket` shape,
    top bucket clamps the tail): bucket assignment is one integer
    projection riding the scan — floor division by an exactly-
    representable width, identical in both engines — and the count is
    a partial-aggregated groupBy over at most 20 keys, so the exchange
    moves ≤ buckets×partitions rows at any data size."""
    o = load(spark, sf_dir, "orders").select("o_totalprice")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / _HIST_WIDTH).cast("long"),
        F.lit(_HIST_BUCKETS - 1),
    ).alias("bucket")
    return (
        o.select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * _HIST_WIDTH).cast("double").alias("lo"),
            ((F.col("bucket") + 1) * _HIST_WIDTH).cast("double").alias("hi"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# Pearson correlation matrix — one-pass, integer-exact moments
# ---------------------------------------------------------------------------
#
# corr(x, y) from the five raw moments (n, Sx, Sy, Sxx, Syy, Sxy), all
# accumulated as EXACT integer sums of 2-dp-scaled values (the scale
# factors cancel in the ratio).  The engine's standard determinism
# recipe (numerics.py): order-free integer sums in DECIMAL(38,0) /
# HUGEINT, one correctly-rounded conversion to double each, then an
# IDENTICAL double expression tree in both engines — so the result is
# bit-identical at any parallelism even though the textbook one-pass
# formula is used.  (Cancellation error in n*Sxx - Sx^2 is ~1e-15
# relative at these magnitudes — far inside the 6-dp output rounding.)
#
# Scale shape: ONE partial-aggregating pass over the fact table
# computes all moments for all columns; the 3x3 matrix assembly is a
# projection on the single aggregate row.  A naive corr() per pair
# would scan the table once per pair.

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount")
_CORR_PAIRS = (
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_extendedprice", "l_discount"),
)


def _corr_sql_moments() -> str:
    terms = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for c in _CORR_COLS:
        q = f"CAST(ROUND({c} * 100) AS BIGINT)"
        terms.append(f"CAST(SUM({q}) AS DOUBLE) AS s_{c}")
        terms.append(f"CAST(SUM({q} * {q}) AS DOUBLE) AS ss_{c}")
    for x, y in _CORR_PAIRS:
        qx = f"CAST(ROUND({x} * 100) AS BIGINT)"
        qy = f"CAST(ROUND({y} * 100) AS BIGINT)"
        terms.append(f"CAST(SUM({qx} * {qy}) AS DOUBLE) AS sp_{x}_{y}")
    return ", ".join(terms)


_CORR_ORACLE = f"""
    WITH m AS (SELECT {_corr_sql_moments()} FROM lineitem)
    {" UNION ALL ".join(
        f'''SELECT '{x}' AS col_x, '{y}' AS col_y,
               ROUND((n * sp_{x}_{y} - s_{x} * s_{y})
                     / (SQRT(n * ss_{x} - s_{x} * s_{x})
                        * SQRT(n * ss_{y} - s_{y} * s_{y})), 6) AS corr
        FROM m'''
        for x, y in _CORR_PAIRS
    )}
"""


@query("q_corr_matrix", _CORR_ORACLE)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem numeric trio in
    one table pass (long format: col_x, col_y, corr) — see block
    comment for the exact-moment determinism recipe."""
    li = load(spark, sf_dir, "lineitem").select(*_CORR_COLS)

    def q(c: str) -> Column:
        return F.round(F.col(c) * 100).cast("long")

    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(q(c).cast("decimal(38,0)")).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum((q(c) * q(c)).cast("decimal(38,0)")).cast("double").alias(f"ss_{c}")
        )
    for x, y in _CORR_PAIRS:
        aggs.append(
            F.sum((q(x) * q(y)).cast("decimal(38,0)"))
            .cast("double")
            .alias(f"sp_{x}_{y}")
        )
    m = li.agg(*aggs)

    def corr(x: str, y: str) -> Column:
        n = F.col("n")
        num = n * F.col(f"sp_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
        dx = F.sqrt(n * F.col(f"ss_{x}") - F.col(f"s_{x}") * F.col(f"s_{x}"))
        dy = F.sqrt(n * F.col(f"ss_{y}") - F.col(f"s_{y}") * F.col(f"s_{y}"))
        return F.round(num / (dx * dy), 6)

    return m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(x).alias("col_x"),
                        F.lit(y).alias("col_y"),
                        corr(x, y).alias("corr"),
                    )
                    for x, y in _CORR_PAIRS
                ]
            )
        ).alias("r")
    ).select("r.col_x", "r.col_y", "r.corr")


# ---------------------------------------------------------------------------
# Benford first-digit audit — the classic fabricated-data screen
# ---------------------------------------------------------------------------

# log10(1 + 1/d) to 9 dp, computed OFFLINE and inlined as literals in
# both engines (the q_eval_ndcg discount-table pattern) — no runtime
# transcendental, so there is nothing to drift cross-engine.
_BENFORD_FRAC = {
    1: 0.301029996, 2: 0.176091259, 3: 0.124938737,
    4: 0.096910013, 5: 0.079181246, 6: 0.06694679,
    7: 0.057991947, 8: 0.051152522, 9: 0.045757491,
}

_BENFORD_CASE = " ".join(
    # CAST pins the literal to DOUBLE (DuckDB would otherwise type it
    # DECIMAL(10,9); same value after promotion, but explicit is safer)
    f"WHEN {d} THEN CAST({f!r} AS DOUBLE)" for d, f in _BENFORD_FRAC.items()
)

_BENFORD_ORACLE = f"""
    WITH digits AS (
        SELECT CAST(SUBSTRING(CAST(
                   CAST(CAST(value * 100 AS DECIMAL(38,0)) AS BIGINT)
               AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM events WHERE value > 0
    ),
    counts AS (SELECT digit, COUNT(*) AS n_obs FROM digits GROUP BY digit),
    total AS (SELECT SUM(n_obs) AS n FROM counts)
    SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
           CAST(n AS DOUBLE) * (CASE digit {_BENFORD_CASE} END) AS expected,
           (CAST(n_obs AS DOUBLE)
              - CAST(n AS DOUBLE) * (CASE digit {_BENFORD_CASE} END))
           * (CAST(n_obs AS DOUBLE)
              - CAST(n AS DOUBLE) * (CASE digit {_BENFORD_CASE} END))
           / (CAST(n AS DOUBLE) * (CASE digit {_BENFORD_CASE} END))
               AS chi2_term
    FROM counts CROSS JOIN total
"""


@query("q_dq_benford", _BENFORD_ORACLE)
def q_dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of `value`: observed
    counts per leading digit against N * log10(1 + 1/d), with the
    per-digit chi-square contribution — the forensic-accounting /
    data-fabrication screen a DQ suite runs on any organic magnitude
    column.

    The leading digit comes from the INTEGER cents (value is 2 dp, so
    value*100 is exact) rendered as a string — leading-digit-of-cents =
    leading-significant-digit-of-value because powers of ten do not
    move the significant digit, and bigint->string is locale-free and
    identical in both engines (float->string is NOT, which is why the
    cast goes through the integer).  Expected fractions are offline
    literals; the chi-square terms are per-row IEEE arithmetic on
    identical (count, N, literal) inputs, hence bit-identical.

    Scale shape: one map-side-combined groupBy on a 9-value key; the
    grand total is a broadcast scalar.  The whole audit is one pass."""
    e = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    cents = (F.col("value") * 100).cast("decimal(38,0)").cast("bigint")
    digits = e.select(
        F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit")
    )
    counts = pin(digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs")))
    total = counts.agg(F.sum("n_obs").alias("n"))
    frac = F.create_map(
        *[F.lit(x) for kv in _BENFORD_FRAC.items() for x in kv]
    )[F.col("digit")]
    exp = F.col("n").cast("double") * frac
    dev = F.col("n_obs").cast("double") - exp
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n_obs",
        exp.alias("expected"),
        (dev * dev / exp).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram — the optimizer's histogram, not the dashboard's
# ---------------------------------------------------------------------------

_EQUIDEPTH_B = 8

_EQUIDEPTH_ORACLE = f"""
    WITH vc AS (
        SELECT CAST(CAST(value * 100 AS DECIMAL(38,0)) AS BIGINT) AS c,
               COUNT(*) AS cnt
        FROM events GROUP BY 1
    ),
    cum AS (
        SELECT c, cnt,
               SUM(cnt) OVER (ORDER BY c
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER () AS n
        FROM vc
    ),
    bucketed AS (
        SELECT c, cnt, ((cum - cnt) * {_EQUIDEPTH_B}) // n AS bucket
        FROM cum
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(MIN(c) AS DOUBLE) / 100 AS lo,
           CAST(MAX(c) AS DOUBLE) / 100 AS hi,
           CAST(SUM(cnt) AS BIGINT) AS n_rows
    FROM bucketed GROUP BY bucket
"""


@query("q_histogram_equidepth", _EQUIDEPTH_ORACLE)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram of `value` in {B} buckets —
    the histogram query OPTIMIZERS build (equal row mass per bucket
    bounds selectivity error regardless of skew; the fixed-width
    q_histogram shape starves under skew).  Every distinct value lands
    wholly in the bucket containing its FIRST duplicate — the standard
    "values never split" contract — so bucket = floor(start_rank * B /
    N) in pure integer arithmetic.

    Scale shape: the raw scan collapses into a (distinct-cent, count)
    rollup FIRST (partial-agg; 2 dp values bound the domain at ~50 k
    rows no matter the corpus), and only that DOMAIN-sized frame passes
    through the single ordered cumulative window — a SinglePartition
    exchange of a bounded frame, which is the correct trade (the
    alternative, a global sort of raw rows, is data-sized).  Final
    bucket stats are one more partial-agg groupBy."""
    e = load(spark, sf_dir, "events")
    cents = (F.col("value") * 100).cast("decimal(38,0)").cast("bigint")
    vc = e.select(cents.alias("c")).groupBy("c").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_cum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vc.select(
        "c",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    bucketed = cum.select(
        "c",
        "cnt",
        F.expr(f"div((cum - cnt) * {_EQUIDEPTH_B}, n)").alias("bucket"),
    )
    return bucketed.groupBy("bucket").agg(
        (F.min("c").cast("double") / 100).alias("lo"),
        (F.max("c").cast("double") / 100).alias("hi"),
        F.sum("cnt").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index — the deployed-model drift monitor
# ---------------------------------------------------------------------------

_PSI_SPLIT = "2024-01-16 00:00:00"
_PSI_BINS = 10
_PSI_DOMAIN_CENTS = 50_000  # value is bounded [0.01, ~500] at any sf

_PSI_ORACLE = f"""
    WITH binned AS (
        SELECT LEAST(CAST(CAST(value * 100 AS DECIMAL(38,0)) AS BIGINT)
                         * {_PSI_BINS} // {_PSI_DOMAIN_CENTS},
                     {_PSI_BINS - 1}) AS bin,
               CAST(ts AS TIMESTAMP) < TIMESTAMP '{_PSI_SPLIT}' AS is_ref
        FROM events
    ),
    counts AS (
        SELECT bin,
               COUNT(*) FILTER (is_ref) AS c_ref,
               COUNT(*) FILTER (NOT is_ref) AS c_cur
        FROM binned GROUP BY bin
    ),
    tot AS (SELECT SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur FROM counts)
    SELECT bin,
           CAST(c_ref AS BIGINT) AS n_ref, CAST(c_cur AS BIGINT) AS n_cur,
           (CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + {_PSI_BINS} AS DOUBLE)
            - CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + {_PSI_BINS} AS DOUBLE))
           * (CAST(CAST(ROUND(
                 (LN(CAST(c_cur + 1 AS DOUBLE)) - LN(CAST(n_cur + {_PSI_BINS} AS DOUBLE))
                  - LN(CAST(c_ref + 1 AS DOUBLE)) + LN(CAST(n_ref + {_PSI_BINS} AS DOUBLE)))
                 * 1000000.0) AS BIGINT) AS DOUBLE) / 1000000.0)
               AS psi_term
    FROM counts CROSS JOIN tot
"""


@query("q_drift_psi", _PSI_ORACLE)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index terms for `value` between a reference
    window (before Jan 16) and the current window — THE deployed-model
    input-drift monitor (credit-scoring lineage; rule of thumb:
    total PSI < 0.1 stable, > 0.25 investigate).  Per bin:
    (p_cur - p_ref) * ln(p_cur / p_ref), add-one smoothed so empty
    bins stay finite.

    Bins are FIXED equal-width cells of the bounded cents domain
    (literal edges — the q_timeseries_fill grid discipline: never
    derived from a data pass, so the frame is stable as data grows and
    the plan needs no extra scan).

    Determinism: bin assignment is pure integer arithmetic; counts are
    exact; the log-ratio quantizes to 6 dp before the product (see the
    inline note — raw LN is 1-ulp engine-dependent) and the remaining
    factor is two exact-integer divisions — identical operand order in
    both engines, no float aggregation (the TOTAL psi is the consumer's
    one-line sum; the per-bin long format is the checkable contract,
    same choice as q_dq_benford).

    Scale shape: one partial-aggregated groupBy on a 10-value key with
    both windows' counts as conditional aggregates in the SAME pass
    (one scan, not two); totals broadcast back."""
    e = load(spark, sf_dir, "events")
    bin_ = F.least(
        F.expr(
            f"div(cast(cast(value * 100 as decimal(38,0)) as bigint)"
            f" * {_PSI_BINS}, {_PSI_DOMAIN_CENTS})"
        ),
        F.lit(_PSI_BINS - 1).cast("long"),
    )
    is_ref = F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp")
    binned = e.select(bin_.alias("bin"), is_ref.alias("is_ref"))
    counts = pin(
        binned.groupBy("bin").agg(
            F.count_if("is_ref").alias("c_ref"),
            F.count_if(~F.col("is_ref")).alias("c_cur"),
        )
    )
    tot = counts.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    pc = (F.col("c_cur") + 1).cast("double") / (
        F.col("n_cur") + _PSI_BINS
    ).cast("double")
    pr = (F.col("c_ref") + 1).cast("double") / (
        F.col("n_ref") + _PSI_BINS
    ).cast("double")
    # the log-ratio quantizes to a 6 dp integer before the product: JVM
    # Math.log and libm ln disagree by 1 ulp on some arguments, and an
    # unquantized product would surface that in the value hash (the
    # PMI/TF-IDF recipe, applied to the one float factor that needs it)
    lr_q = (
        F.round(
            (
                F.log((F.col("c_cur") + 1).cast("double"))
                - F.log((F.col("n_cur") + _PSI_BINS).cast("double"))
                - F.log((F.col("c_ref") + 1).cast("double"))
                + F.log((F.col("n_ref") + _PSI_BINS).cast("double"))
            )
            * 1_000_000.0
        )
        .cast("long")
        .cast("double")
        / 1_000_000.0
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("c_ref").alias("n_ref"),
        F.col("c_cur").alias("n_cur"),
        ((pc - pr) * lr_q).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# Key-skew audit — the pre-shuffle health check
# ---------------------------------------------------------------------------

_SKEW_TOPK = 5

_SKEW_ORACLE = f"""
    WITH kc AS (
        SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(c) AS BIGINT) AS max_c
        FROM kc
    ),
    top AS (
        SELECT k, c, ROW_NUMBER() OVER (ORDER BY c DESC, k ASC) AS rk
        FROM kc
    )
    SELECT rk AS rank, k AS key, CAST(c AS BIGINT) AS n,
           CAST(c AS DOUBLE) / n_rows AS share,
           CAST(c * n_keys AS DOUBLE) / n_rows AS hot_factor
    FROM top CROSS JOIN tot WHERE rk <= {_SKEW_TOPK}
"""


@query("q_skew_report", _SKEW_ORACLE)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew audit of the events key distribution: the top
    {_SKEW_TOPK} heaviest keys with their row share and hot factor
    (share x #keys — 1.0 means perfectly uniform; the number that says
    how much longer the hottest shuffle partition runs than average).
    This is the table to read BEFORE keying a join or stateful op on a
    column — the decision input for q_join_salted / q_agg_salted and
    AQE skew thresholds.

    Scale shape: one partial-aggregated key count (map-side combine
    collapses the hot key itself — counting skew does not suffer the
    skew), a top-k over the key-count rollup via
    TakeOrderedAndProject-eligible window (k is tiny and the rollup is
    #keys-sized), and a broadcast 1-row totals frame.  Exact integer
    counts; the two shares are single divisions of exact operands."""
    e = load(spark, sf_dir, "events")
    kc = e.groupBy(F.col("user_id").alias("k")).agg(F.count(F.lit(1)).alias("c"))
    tot = kc.agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("c").cast("bigint").alias("max_c"),
    )
    w = Window.orderBy(F.desc("c"), F.asc("k"))
    top = kc.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _SKEW_TOPK
    )
    return top.crossJoin(F.broadcast(tot)).select(
        F.col("rk").alias("rank"),
        F.col("k").alias("key"),
        F.col("c").cast("bigint").alias("n"),
        (F.col("c").cast("double") / F.col("n_rows")).alias("share"),
        ((F.col("c") * F.col("n_keys")).cast("double") / F.col("n_rows")).alias(
            "hot_factor"
        ),
    )


# ---------------------------------------------------------------------------
# Power-law tail fit — continuous-approximation MLE alpha on per-user
# activity (Clauset, Shalizi & Newman 2009, eq. 3.1 with x_min = 1)
# ---------------------------------------------------------------------------

_PLAW_ORACLE = """
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
    ),
    hist AS (SELECT c AS k, COUNT(*) AS m FROM per_user GROUP BY c),
    s AS (
        SELECT SUM(m) AS n,
               SUM(m::HUGEINT
                   * CAST(ROUND(LN(2.0 * k) * 1000000.0) AS BIGINT)) AS slog
        FROM hist
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(1 AS INT) AS x_min,
           ROUND(1.0 + CAST(n AS DOUBLE) * 1000000.0 / CAST(slog AS DOUBLE),
                 6) AS alpha
    FROM s
"""


@query("q_power_law_alpha", _PLAW_ORACLE)
def q_power_law_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLE exponent of a power-law fit to per-user event counts —
    alpha_hat = 1 + n / sum_i ln(x_i / (x_min - 1/2)) with x_min = 1,
    i.e. ln(2 x_i) (the CSN 2009 continuous correction for discrete
    data).  The distribution-shape probe a skew-mitigation plan
    (salting thresholds, AQE skew factors) reads: alpha near 2 means a
    handful of users carry most rows.

    Determinism: the only transcendental, ln(2k), is evaluated on the
    DISTINCT count values and quantized to a 6 dp integer BEFORE the
    cross-row sum; sum_k m_k * qln(k) is exact in both engines, and
    alpha is one division + round.

    Scale shape: user-keyed map-side-combined count, then the bounded
    count-of-counts histogram (same frame q_gini_concentration rides);
    no window at all — two scalar aggregates."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    hist = per_user.groupBy(F.col("c").alias("k")).agg(
        F.count(F.lit(1)).alias("m")
    )
    qln = F.round(F.log(2.0 * F.col("k")) * 1_000_000.0).cast("long")
    s = hist.agg(
        F.sum("m").alias("n"),
        F.sum(F.col("m").cast("decimal(38,0)") * qln).alias("slog"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.lit(1).cast("int").alias("x_min"),
        F.round(
            1.0
            + F.col("n").cast("double")
            * 1_000_000.0
            / F.col("slog").cast("double"),
            6,
        ).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit — equivalence-class census over quasi-identifiers
# ---------------------------------------------------------------------------

_KANON_RISK_K = 5

_KANON_ORACLE = f"""
    WITH classes AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
               COUNT(*) AS sz
        FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(sz) AS BIGINT) AS k_anonymity,
           CAST(SUM(CASE WHEN sz < {_KANON_RISK_K} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_classes_at_risk,
           CAST(SUM(CASE WHEN sz < {_KANON_RISK_K} THEN sz ELSE 0 END)
                AS BIGINT) AS n_rows_at_risk,
           ROUND(CAST(SUM(CASE WHEN sz < {_KANON_RISK_K} THEN sz ELSE 0 END)
                      AS DOUBLE) / CAST(SUM(sz) AS DOUBLE), 6)
               AS at_risk_share
    FROM classes
"""


@query("q_k_anonymity", _KANON_ORACLE)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over the customer table's
    quasi-identifier tuple (market segment, nation, $1000 balance
    band): the dataset's k is the SMALLEST equivalence-class size — a
    released row in a class of size < k_risk is re-identifiable by
    anyone who knows the QI values.  The privacy gate that pairs with
    q_pii_scrub: scrubbing direct identifiers is step one; this
    measures what the REMAINING columns still leak.

    Determinism: the class census and every output are exact integers;
    the share is one double division.

    Scale shape: one QI-keyed map-side-combined count (the class
    frame: |segments| x |nations| x |bands|, domain-bounded), then a
    one-row rollup.  No windows, no joins — the audit costs one corpus
    pass regardless of table width."""
    c = load(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("sz"))
    risk = F.when(F.col("sz") < _KANON_RISK_K, F.col("sz")).otherwise(F.lit(0))
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("sz").cast("bigint").alias("k_anonymity"),
        F.sum((F.col("sz") < _KANON_RISK_K).cast("int"))
        .cast("bigint")
        .alias("n_classes_at_risk"),
        F.sum(risk).cast("bigint").alias("n_rows_at_risk"),
        F.round(
            F.sum(risk).cast("double") / F.sum("sz").cast("double"), 6
        ).alias("at_risk_share"),
    )
