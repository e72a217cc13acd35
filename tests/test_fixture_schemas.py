"""Fixture-schema pin: the loaded dtypes of every table must equal the
declared constants in ``schemas.py``.

Round 2 lost 22 queries and 34 tests to a silent fixture regeneration
(``events.ts`` flipped TIMESTAMP(NANOS) -> TIMESTAMP(MICROS) under the
loader's assumption).  This test makes the NEXT regeneration fail in one
obvious place instead of everywhere at once: if it fails, fix
``io.load`` / ``schemas.py``, not 34 downstream tests.
"""

from __future__ import annotations

import pytest

from stateflow_flink_spark.io import load
from stateflow_flink_spark.schemas import TABLE_NAMES, TABLE_SCHEMAS

from .conftest import SF_CORRECTNESS, SF_SMOKE


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_loaded_schema_matches_declared(spark, name):
    for sf_dir in (SF_SMOKE, SF_CORRECTNESS):
        got = load(spark, sf_dir, name).schema
        want = TABLE_SCHEMAS[name]
        assert [f.name for f in got.fields] == [f.name for f in want.fields], (
            f"{name}@{sf_dir}: column names drifted"
        )
        got_types = [f.dataType.simpleString() for f in got.fields]
        want_types = [f.dataType.simpleString() for f in want.fields]
        assert got_types == want_types, (
            f"{name}@{sf_dir}: dtypes drifted — fixtures regenerated? "
            f"got {got_types}, declared {want_types}. Fix io.load/schemas.py "
            f"in ONE place; do not chase downstream failures."
        )
