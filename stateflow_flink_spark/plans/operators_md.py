"""OPERATORS.md generator — the human index of the query registry.

The committed OPERATORS.md went stale once (said "144 queries" after the
145th landed), so the file is now generated from the registry and a
guard test (tests/test_fixture_schemas.py) re-renders it and diffs
against the committed copy — the same pin that keeps BENCH.json
registry-exact.  Regenerate with:

    python -m stateflow_flink_spark.plans.operators_md > OPERATORS.md
"""

from __future__ import annotations

import re

_SUMMARY_WIDTH = 155

_HEADER = """# OPERATORS — the declared query surface, indexed

Generated from the `@query` registry (one row per `queries()` entry) by
`stateflow_flink_spark/plans/operators_md.py`; a guard test re-renders
and diffs, so edit the docstrings, not this file.  Every entry has a
DuckDB oracle; `module.function` is the implementation anchor.  Full
semantics live in each docstring and in SURVEY.md §2B.

| query | implementation | summary |
|---|---|---|
"""


def _summary(fn) -> str:
    doc = fn.__doc__ or ""
    text = re.sub(r"\s+", " ", doc).strip()
    # first sentence: up to the first period followed by a space —
    # periods inside parentheses survive via the truncation fallback
    m = re.search(r"\.(?=\s)", text)
    if m:
        text = text[: m.end()]
    text = text.replace("|", "\\|")
    if len(text) > _SUMMARY_WIDTH:
        text = text[: _SUMMARY_WIDTH - 1].rstrip() + "…"
    return text


def render_operators_md() -> str:
    from .registry import ORACLE, QUERIES, load_all_modules

    load_all_modules()
    rows = []
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        impl = f"{fn.__module__}.{fn.__qualname__}".replace(
            "stateflow_flink_spark.", ""
        )
        rows.append(f"| `{name}` | `{impl}` | {_summary(fn)} |")
    n_q, n_o = len(QUERIES), len(set(QUERIES) & set(ORACLE))
    return _HEADER + "\n".join(rows) + f"\n\n{n_q} queries, {n_o} oracles.\n"


if __name__ == "__main__":
    print(render_operators_md(), end="")
