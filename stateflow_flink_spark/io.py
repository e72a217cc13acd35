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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table.

    Schema comes from the parquet footer (it matches
    ``schemas.TABLE_SCHEMAS`` — asserted in tests); passing an explicit
    schema here would disable parquet schema evolution for no benefit in
    batch.  Streaming readers pass ``schemas.EVENTS_RAW`` etc. (see
    ``sources/stream.py``) because ``readStream`` requires a schema.

    ``events.ts`` is physically TIMESTAMP(NANOS); Spark 4 only reads it
    as int64 nanos (legacy conf), so we convert to TimestampType (µs)
    here with truncation — identical to DuckDB ``CAST(ts AS TIMESTAMP)``.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(table_path(sf_dir, name)).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(table_path(sf_dir, name))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql paths."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
