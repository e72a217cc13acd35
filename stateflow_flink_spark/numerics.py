"""Order-independent exact numeric aggregation helpers.

Floating-point SUM/AVG are not associative: Spark's partial+final hash
aggregate and DuckDB's aggregate visit rows in different orders, so a
naive ``SUM(double)`` differs between engines in the last ULPs — enough
to break the driver's value-hash compare and (worse) to flip top-k
orderings near ties.

Fix: sum in fixed-point.  Cast each double to ``DECIMAL(30,8)`` (the
fixture data carries at most cents / 4-dp products; 8 fractional digits
is lossless for every expression we aggregate), sum exactly in decimal,
and cast the final total back to DOUBLE.  Both engines then produce
bit-identical doubles regardless of row order or parallelism.

At 100 TB this costs one widening per row inside the hash aggregate —
still whole-stage-codegen JVM arithmetic, no Python involved — and buys
run-to-run determinism, which a production pipeline wants anyway.

Each Spark helper has a twin that emits the equivalent DuckDB SQL text
so query and oracle stay structurally in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(30,8)"


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def exact_sum(c: Column | str) -> Column:
    """Order-independent SUM over a double column/expression → double."""
    return F.sum(_col(c).cast(_DEC)).cast("double")


def exact_avg(c: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / count, double division."""
    col = _col(c)
    return exact_sum(col) / F.count(col)


def sql_sum(expr: str) -> str:
    """DuckDB twin of :func:`exact_sum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,8))) AS DOUBLE)"


def sql_avg(expr: str) -> str:
    """DuckDB twin of :func:`exact_avg`."""
    return f"({sql_sum(expr)} / COUNT({expr}))"
