"""UDF / UDAF / UDTF surface — the Python escape hatch, done the fast way.

Everything here crosses the JVM<->Python boundary via Arrow batches
(pandas_udf / GROUPED_AGG / UDTF), never row-at-a-time pickling.  These
queries exist to prove the extension surface; equivalent built-ins are
preferred everywhere else in the engine (see q_udf_scalar's oracle —
the same logic as a plain CASE).

UDF objects are created inside the query functions (not at module
scope) because pandas_udf/udtf type parsing needs an active
SparkSession.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from ..io import load
from ..plans.registry import query


@query(
    "q_udf_scalar",
    """
    SELECT l_orderkey, l_linenumber, l_discount,
           CASE WHEN l_discount <= 0.0 THEN 'none'
                WHEN l_discount < 0.05 THEN 'low'
                ELSE 'high' END AS band
    FROM lineitem
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas_udf (discount banding)."""

    @pandas_udf("string")
    def discount_band(discount: pd.Series) -> pd.Series:
        return pd.Series(
            np.where(discount <= 0.0, "none", np.where(discount < 0.05, "low", "high"))
        )

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_discount",
        discount_band("l_discount").alias("band"),
    )


@query(
    "q_udaf_grouped",
    """
    SELECT p_brand,
           ROUND(EXP(AVG(LN(p_retailprice))), 6) AS geomean_price,
           COUNT(*) AS n_parts
    FROM part GROUP BY p_brand
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped pandas UDAF via applyInPandas: geometric mean price per
    brand (Spark can't mix GROUPED_AGG pandas UDFs with JVM aggregates
    in one agg, so the whole group reduction runs in one Arrow batch)."""

    def brand_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # Sort before summing logs: deterministic float reduction order
        # across shuffles; rounding on both sides seals oracle parity.
        logs = np.log(np.sort(pdf["p_retailprice"].to_numpy()))
        return pd.DataFrame(
            {
                "p_brand": [pdf["p_brand"].iloc[0]],
                "geomean_price": [round(float(np.exp(logs.mean())), 6)],
                "n_parts": [len(pdf)],
            }
        )

    p = load(spark, sf_dir, "part")
    return p.groupBy("p_brand").applyInPandas(
        brand_stats, "p_brand string, geomean_price double, n_parts bigint"
    )


@query(
    "q_udtf_explode",
    """
    SELECT doc_id,
           CAST(pos - 1 AS INTEGER) AS pos,
           token
    FROM (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token,
               GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
        FROM documents
    )
    """,
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one (doc_id, position, token) row per token."""

    @udtf(returnType="doc_id bigint, pos int, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield doc_id, i, tok

    spark.udtf.register("sfs_tokenize", Tokenize)
    load(spark, sf_dir, "documents").createOrReplaceTempView("sfs_docs_udtf")
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.token
        FROM sfs_docs_udtf d,
             LATERAL sfs_tokenize(d.doc_id, d.text) t
        """
    )


@query(
    "q_cogroup_funnel",
    """
    WITH fp AS (
        SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS first_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT e.user_id,
           CAST(COUNT(*) FILTER (CAST(e.ts AS TIMESTAMP) < fp.first_purchase)
                AS BIGINT) AS n_clicks_before,
           fp.first_purchase
    FROM events e JOIN fp USING (user_id)
    WHERE e.event_type = 'click'
    GROUP BY e.user_id, fp.first_purchase
    """,
)
def q_cogroup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map Pandas API (the 4th Pandas surface next to scalar /
    grouped-agg / UDTF): clicks and purchases cogrouped, one Python
    function sees BOTH sides at once — funnel metric: clicks before the
    user's first purchase.

    Cogrouping on the raw user_id makes ONE Python call per user (1,500
    calls x ~5 ms of per-group Arrow framing at sf0.1 — measured 8.5 s;
    at 100 TB scale, billions of calls).  So the cogroup key is a HASH
    BUCKET of the user instead: ~32 calls, each merging all of its
    users vectorized (pandas merge + groupby inside the bucket).  Same
    shuffle volume — rows move once keyed by user-hash either way — but
    per-call overhead amortizes across the bucket; this is the shape
    that keeps the cogrouped-map surface viable at scale.  The merge
    logic stays SQL-expressible on purpose so the oracle can check the
    plumbing; users lacking either side are dropped by the inner merge,
    mirroring the oracle's inner join."""
    e = load(spark, sf_dir, "events")
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(32)).alias("bucket")
    clicks = e.filter(F.col("event_type") == "click").select(bucket, "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        bucket, "user_id", "ts"
    )

    def funnel(c: pd.DataFrame, p: pd.DataFrame) -> pd.DataFrame:
        if c.empty or p.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_clicks_before": pd.Series([], dtype="int64"),
                    "first_purchase": pd.Series([], dtype="datetime64[us]"),
                }
            )
        fp = p.groupby("user_id", sort=False)["ts"].min().rename("first_purchase")
        m = c.merge(fp, left_on="user_id", right_index=True)
        m["before"] = (m["ts"] < m["first_purchase"]).astype("int64")
        out = (
            m.groupby("user_id", sort=False)
            .agg(
                n_clicks_before=("before", "sum"),
                first_purchase=("first_purchase", "first"),
            )
            .reset_index()
        )
        return out

    return (
        clicks.groupBy("bucket")
        .cogroup(purchases.groupBy("bucket"))
        .applyInPandas(
            funnel,
            "user_id long, n_clicks_before long, first_purchase timestamp",
        )
    )
