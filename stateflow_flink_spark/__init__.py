"""stateflow_flink_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
``wzorgdrager/stateflow-flink`` (an Apache Flink event-routing +
per-key-state engine, see ``/root/reference``) as an idiomatic Spark
engine, extended with the full relational / streaming / LLM-pipeline
query surface declared in ``SURVEY.md §2B``.

Design principles (SURVEY.md §4.2):
  * DataFrame / Spark SQL everywhere — Catalyst plans, Tungsten executes.
  * No custom parser / optimizer / executor; the "engine" is the set of
    declared operators, schemas, stateful processors and routing library.
  * UDFs only where built-ins genuinely cannot express the semantics,
    and then always Arrow-vectorized (pandas_udf / applyInPandas).
  * Designed for 100 TB: broadcast small dims, AQE on, salting helpers,
    no collect() in operator paths.
"""

__version__ = "0.3.0"


def __getattr__(name):
    """Lazy public API — keeps `import stateflow_flink_spark` free of a
    SparkSession/JVM dependency while exposing the user surface:

        sfs.load(spark, sf_dir, "lineitem")     # one fixture table
        sfs.register_views(spark, sf_dir)       # all tables as temp views
        sfs.queries()["q_tpch_q1"](spark, dir)  # any declared query
        sfs.oracle_sql()["q_tpch_q1"]           # its DuckDB twin
        sfs.get_spark()                         # tuned local session
    """
    if name in ("load", "load_all", "register_views", "spread"):
        from . import io

        return getattr(io, name)
    if name == "get_spark":
        from .session import get_spark

        return get_spark
    if name in ("queries", "oracle_sql"):
        from .plans.registry import ORACLE, QUERIES, load_all_modules

        load_all_modules()
        return (lambda: dict(QUERIES)) if name == "queries" else (lambda: dict(ORACLE))
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
