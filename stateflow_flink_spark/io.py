"""Table loading for the fixture star schema.

One function, :func:`load`, is the only way operators touch storage;
every query receives ``(spark, sf_dir)`` and calls ``load`` per table.
Scans stay declarative so Catalyst pushes predicates / prunes columns
into the parquet reader — verify with ``df.explain("formatted")``
(``PushedFilters`` / ``ReadSchema`` rows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    return os.path.join(sf_dir, f"{name}.parquet")


# (session id, sf_dir, table) -> resolved read schema.  The footer read
# for schema inference is a per-call driver-side file open; over an
# 89-query suite that is ~90 redundant opens per table.  Caching the
# *schema* (never the DataFrame — every call still gets a fresh plan
# subtree with fresh expression IDs, so self-joins keep working) makes
# repeat loads metadata-free.
_SCHEMA_CACHE: dict[tuple[int, str, str], object] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table.

    Schema comes from the parquet footer on first touch (it matches
    ``schemas.TABLE_SCHEMAS`` — asserted in tests) and is cached per
    (session, dir, table) after that.  Streaming readers pass
    ``schemas.EVENTS_RAW`` etc. because ``readStream`` requires a schema.

    ``events.ts`` is physically TIMESTAMP(NANOS); Spark 4 only reads it
    as int64 nanos (legacy conf), so we convert to TimestampType (µs)
    here with truncation — identical to DuckDB ``CAST(ts AS TIMESTAMP)``.
    """
    path = table_path(sf_dir, name)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (id(spark), sf_dir, name)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        raw = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = raw.schema
    else:
        raw = spark.read.schema(schema).parquet(path)
    if name == "events":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def spread(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Ensure compute parallelism for per-row-heavy pipelines.

    The fixture tables are single-row-group parquet files, so the scan
    yields ONE partition and any expensive per-row expression (shingle
    hashing, SimHash folds, embedding math) runs on one core of 32.  On
    a real cluster the same tables are thousands of row groups and the
    scan parallelizes naturally — so this helper repartitions ONLY when
    the scan has fewer partitions than the session's default
    parallelism, and is a no-op (not even an exchange in the plan) at
    scale.  Round-robin repartition, no key: the downstream op decides
    its own shuffle keys."""
    parts = df.rdd.getNumPartitions()
    target = spark.sparkContext.defaultParallelism
    if parts >= target:
        return df
    return df.repartition(target)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql paths."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
