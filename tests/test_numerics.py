"""Property tests for the cross-engine exact-aggregation contract.

``numerics.exact_sum`` is the engine's answer to "float SUM is not
associative": scale to integers, sum exactly, convert once.  These
tests pin the two properties everything downstream leans on:

  * PERMUTATION/PARTITION INDEPENDENCE — any ordering or partitioning
    of the rows yields the same double, bit for bit (this is what makes
    `= MAX(...)`, HAVING cuts, and the driver's value-hash stable);
  * DUCKDB AGREEMENT — the `sql_sum` twin evaluates to the identical
    double on the identical rows.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from stateflow_flink_spark.numerics import exact_sum, sql_sum

# values with <= 4 decimal places — the contract's domain (prices are
# 2 dp, three-factor products <= 6 dp)
_vals = st.lists(
    st.integers(min_value=-10_000_000, max_value=10_000_000).map(
        lambda n: n / 10_000.0
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=15, deadline=None)
@given(_vals, st.randoms())
def test_exact_sum_is_permutation_and_partition_independent(spark, vals, rnd):
    shuffled = list(vals)
    rnd.shuffle(shuffled)
    outs = []
    for data, parts in ((vals, 1), (shuffled, 1), (vals, 7), (shuffled, 13)):
        df = spark.createDataFrame([(v,) for v in data], "x double").repartition(
            parts
        )
        outs.append(df.agg(exact_sum("x").alias("s")).collect()[0].s)
    assert len({repr(o) for o in outs}) == 1, outs


@settings(max_examples=15, deadline=None)
@given(_vals)
def test_exact_sum_matches_duckdb_twin_bitwise(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(exact_sum("x").alias("s")).collect()[0].s
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": vals}))
    want = con.execute(f"SELECT {sql_sum('x')} AS s FROM t").fetchone()[0]
    con.close()
    assert repr(got) == repr(want), (got, want)
