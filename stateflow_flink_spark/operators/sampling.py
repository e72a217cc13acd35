"""Dataset splitting and sampling for training-data pipelines.

A corpus pipeline ends with "assign every document to train/val/test,
deterministically, forever" and "give me exactly k examples per class".
Both must be reproducible across engines and runs — so randomness here
is content-keyed hashing (md5, which DuckDB shares bit-for-bit), never
``rand()``.

Scale notes:
  * the hash split is a pure projection — rides the scan, no shuffle,
    and adding data never reassigns existing rows (the property that
    keeps eval sets stable across corpus versions);
  * stratified take-k is one window shuffle keyed by the class column.
    With billions of rows per class, cap the sort cost by pre-filtering
    on the hash prefix (the selectivity trick noted in the docstring)
    before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query

# md5-derived uniform bucket in [0, 10000): both engines hash the same
# UTF-8 doc_id string and read the same 8 hex digits.
_BUCKETS = 10_000


def _hash_bucket(col):
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _BUCKETS
    )


_SQL_BUCKET = (
    "CAST(('0x' || SUBSTRING(MD5(CAST({c} AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT)"
    f" % {_BUCKETS}"
)


@query(
    "q_split_hash",
    f"""
    SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM (
        SELECT doc_id,
               CASE WHEN b < 9000 THEN 'train'
                    WHEN b < 9500 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, {_SQL_BUCKET.format(c="doc_id")} AS b FROM documents)
    )
    GROUP BY split
    """,
)
def q_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by content-keyed hash.

    The assignment is a function of doc_id alone: re-running on a grown
    corpus never moves an old document between splits (unlike
    ``randomSplit``, which reshuffles on every run and every
    repartition).  Pure projection + one tiny aggregate."""
    d = load(spark, sf_dir, "documents")
    b = _hash_bucket("doc_id")
    split = (
        F.when(b < 9000, "train").when(b < 9500, "val").otherwise("test")
    ).alias("split")
    return (
        d.select(split, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "q_sample_stratified",
    f"""
    SELECT lang, doc_id, n_chars
    FROM (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY MD5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
               ) AS rk
        FROM documents
    )
    WHERE rk <= 50
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 50 documents per language, hash-ordered — a deterministic
    stratified sample (same rows in every engine, every run).

    One window shuffle keyed by lang.  At billions of rows per class,
    first filter on a hash-bucket prefix sized to ~10x the quota (cheap
    selectivity that preserves the hash order), THEN rank — the window
    sorts thousands of rows per class instead of billions."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.asc(F.md5(F.col("doc_id").cast("string"))), F.asc("doc_id")
    )
    return (
        d.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 50)
        .drop("rk")
    )
