"""Z-order data layout — multi-dimensional clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the file: file-
level min/max statistics prune scans, but they only prune on columns the
data is SORTED by.  Sorting by one column (custkey) makes date-range
queries read every file.  The lakehouse answer (Delta `OPTIMIZE ZORDER
BY`, Iceberg sort orders, the Morton/Z space-filling curve) interleaves
the bits of several dimensions into one sort key so that EVERY
interleaved dimension gets sub-linear file pruning.

``q_zorder_layout`` measures that directly and honestly: it lays the
orders table into fixed-width "files" two ways — linear (custkey-sorted)
and Z-order (custkey ⋈ order-day bit-interleave) — and reports, for a
pure date-range predicate, how many files each layout would touch.  The
z-value is exact integer arithmetic (16+16 bit interleave via shifts, a
pure projection riding the scan), so the whole experiment is
reproducible bit-for-bit in the oracle.  Writing the physical layout is
then just ``df.repartitionByRange(F.col("z")).write...`` — the metric
here is the part worth checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..plans.registry import query

Z_BITS = 16  # bits per dimension -> 32-bit z-value
Z_FILE_SHIFT = 23  # z >> 23 -> 512 "files"
LIN_FILE_SHIFT = 5  # custkey >> 5 -> comparable file count on the fixture

_EPOCH = "1992-01-01"
# the probe predicate: a pure DATE range (the dimension the linear
# layout does NOT sort by)
_DATE_LO, _DATE_HI = "1997-01-01", "1997-04-01"


def _interleave(a: Column, b: Column) -> Column:
    """Morton code: bit i of `a` -> bit 2i, bit i of `b` -> bit 2i+1.
    Unrolled to Z_BITS literal-shift terms — stays in codegen, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


_SQL_INTERLEAVE = " + ".join(
    f"(((ck >> {i}) & 1) << {2 * i}) + (((dy >> {i}) & 1) << {2 * i + 1})"
    for i in range(Z_BITS)
)

_ZORDER_ORACLE = f"""
    WITH dims AS (
        SELECT CAST(o_custkey AS BIGINT) AS ck_raw,
               CAST(o_custkey AS BIGINT) & {(1 << Z_BITS) - 1} AS ck,
               CAST(DATEDIFF('day', DATE '{_EPOCH}',
                             CAST(o_orderdate AS DATE)) AS BIGINT)
                   & {(1 << Z_BITS) - 1} AS dy,
               CAST(o_orderdate AS TIMESTAMP) AS od
        FROM orders
    ),
    filed AS (
        SELECT ({_SQL_INTERLEAVE}) >> {Z_FILE_SHIFT} AS z_file,
               ck_raw >> {LIN_FILE_SHIFT} AS lin_file,
               od >= TIMESTAMP '{_DATE_LO}' AND od < TIMESTAMP '{_DATE_HI}'
                   AS hit
        FROM dims
    )
    SELECT layout, n_files, files_touched
    FROM (
        SELECT 'zorder' AS layout,
               COUNT(DISTINCT z_file) AS n_files,
               CAST(COUNT(DISTINCT CASE WHEN hit THEN z_file END) AS BIGINT)
                   AS files_touched
        FROM filed
        UNION ALL
        SELECT 'linear_custkey' AS layout,
               COUNT(DISTINCT lin_file) AS n_files,
               CAST(COUNT(DISTINCT CASE WHEN hit THEN lin_file END) AS BIGINT)
                   AS files_touched
        FROM filed
    )
"""


@query("q_zorder_layout", _ZORDER_ORACLE)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-pruning comparison for a date-range query under two
    physical layouts of `orders` (see module docstring): Z-order
    interleaving (custkey, order-day) vs linear custkey sort.

    Expected shape, asserted in tests: the linear layout touches ~all
    its files (date values spread through every custkey file), the
    Z-order layout touches a small fraction (the curve keeps each
    file's day-range narrow).  One projection + one small aggregate —
    the z-value itself is the cheap part; it buys the pruning."""
    mask = (1 << Z_BITS) - 1
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    dims = o.select(
        F.col("o_custkey").cast("long").alias("ck_raw"),
        F.col("o_custkey").cast("long").bitwiseAND(F.lit(mask)).alias("ck"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit(_EPOCH).cast("date"))
        .cast("long")
        .bitwiseAND(F.lit(mask))
        .alias("dy"),
        (
            (F.col("o_orderdate") >= F.lit(_DATE_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_DATE_HI).cast("timestamp"))
        ).alias("hit"),
    )
    filed = dims.select(
        F.shiftright(_interleave(F.col("ck"), F.col("dy")), Z_FILE_SHIFT).alias(
            "z_file"
        ),
        # the linear baseline files on the UNMASKED key: a masked key
        # would wrap past 65535 and stop modeling a custkey-sorted layout
        F.shiftright(F.col("ck_raw"), LIN_FILE_SHIFT).alias("lin_file"),
        "hit",
    )
    z_row = filed.agg(
        F.countDistinct("z_file").alias("n_files"),
        F.countDistinct(F.when(F.col("hit"), F.col("z_file"))).alias(
            "files_touched"
        ),
    ).select(F.lit("zorder").alias("layout"), "n_files", "files_touched")
    lin_row = filed.agg(
        F.countDistinct("lin_file").alias("n_files"),
        F.countDistinct(F.when(F.col("hit"), F.col("lin_file"))).alias(
            "files_touched"
        ),
    ).select(
        F.lit("linear_custkey").alias("layout"), "n_files", "files_touched"
    )
    return z_row.unionByName(lin_row)
