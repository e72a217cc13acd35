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

__version__ = "0.1.0"
