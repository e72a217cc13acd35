"""Differential-oracle comparison helper (mimics the driver's check).

Normalizes a Spark result and a DuckDB result to canonical sorted row
tuples and requires EXACT value equality — the engine is built so that
even float aggregates are bit-identical across engines (see
``stateflow_flink_spark.numerics``), so tolerance would only hide bugs.
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import numpy as np
import pandas as pd


def _norm_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else ("f", f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, np.bool_):
        return ("b", bool(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return None
        return ("t", v.to_datetime64().astype("datetime64[us]").astype("int64").item())
    if isinstance(v, dt.datetime):
        return ("t", int(v.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000))
    if isinstance(v, dt.date):
        return ("d", v.toordinal())
    if isinstance(v, (bytes, bytearray)):
        return ("x", bytes(v).hex())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(_norm_value(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _norm_value(x)) for k, x in v.items())))
    if isinstance(v, str):
        return ("s", v)
    if v != v:  # NaN-like (pd.NaT etc.)
        return None
    return ("o", repr(v))


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_value(v) for v in row))
    out.sort(key=repr)
    return out


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows == d_rows:
        return
    # Build a readable diff of the first few mismatching rows.
    diffs = []
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            diffs.append(f"  row {i}:\n    spark={a}\n    duck ={b}")
        if len(diffs) >= 5:
            break
    raise AssertionError(f"{name}: value mismatch ({len(diffs)}+ rows):\n" + "\n".join(diffs))
