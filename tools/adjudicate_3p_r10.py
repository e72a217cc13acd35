#!/usr/bin/env python
"""Adjudicate the r10 three-point sweep's flagged decade ratios by
measuring the CANDIDATE VOLUME — the work the algorithm is actually
asked to do — at each scale.

A banded/DF-capped candidate generator is vindicated when its wall
ratio is at or below its candidate-volume ratio: the algorithm cannot
verify C candidates in under C work, so wall tracking (or undercutting)
candidates is the sub-quadratic claim holding — the candidate GROWTH
itself can be a property of the corpus generator, not of the plan.

    python tools/adjudicate_3p_r10.py DIR_5K DIR_50K DIR_500K

Prints one markdown table:
  - q_dedup_fuzzy: DuckDB recompute of sum C(df, 2) over the DF-capped
    shingle universe (exactly the pairs the capped self-join emits).
  - q_dedup_simhash: Spark count of 3-of-6-block bucket-mate pairs
    (the pre-Hamming-verify candidate set, xxhash64 bucketing so it
    must run engine-side).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fuzzy_candidates(d: str) -> int:
    import duckdb

    from stateflow_flink_spark.operators.dedup import SHINGLE_DF_CAP

    con = duckdb.connect()
    con.execute("SET threads TO 8")
    return con.execute(
        f"""
        WITH docsh AS (
            SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(
                       GENERATE_SERIES(1, GREATEST(LEN(t) - 2, 1)),
                       i -> ARRAY_TO_STRING(t[i:LEAST(i+2, LEN(t))], ' ')
                   )) AS sh
            FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t
                  FROM read_parquet('{d}/documents.parquet'))
        ),
        df AS (
            SELECT s, COUNT(*) AS c
            FROM (SELECT doc_id, UNNEST(sh) AS s FROM docsh)
            GROUP BY s
        )
        SELECT CAST(SUM(c * (c - 1) / 2) AS BIGINT)
        FROM df WHERE c <= {SHINGLE_DF_CAP}
        """
    ).fetchone()[0]


def simhash_candidates(spark, d: str) -> int:
    from stateflow_flink_spark.io import load, spread
    from stateflow_flink_spark.operators.dedup import (
        simhash_candidate_pairs,
        simhash_signatures,
    )

    sig = simhash_signatures(spread(load(spark, d, "documents"), spark))
    # count WITH combo multiplicity — that is the join's actual row
    # volume (the engine's work), before the caller's post-verify dedup
    return simhash_candidate_pairs(sig).count()


def main() -> None:
    dirs = sys.argv[1:4]
    assert len(dirs) == 3, "usage: adjudicate_3p_r10.py DIR_5K DIR_50K DIR_500K"

    fc = [fuzzy_candidates(d) for d in dirs]
    print("| probe | 5k | 50k | 500k | d1 ratio | d2 ratio |")
    print("|---|---|---|---|---|---|")
    print(
        f"| fuzzy DF-capped candidate pairs | {fc[0]} | {fc[1]} | {fc[2]} "
        f"| {fc[1]/max(fc[0],1):.1f}x | {fc[2]/max(fc[1],1):.1f}x |"
    )

    from pyspark.sql import SparkSession

    from stateflow_flink_spark.session import apply_runtime_conf

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("adjudicate-3p")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    apply_runtime_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")
    sc = [simhash_candidates(spark, d) for d in dirs]
    print(
        f"| simhash bucket-mate candidate pairs | {sc[0]} | {sc[1]} | {sc[2]} "
        f"| {sc[1]/max(sc[0],1):.1f}x | {sc[2]/max(sc[1],1):.1f}x |"
    )
    spark.stop()


if __name__ == "__main__":
    main()
