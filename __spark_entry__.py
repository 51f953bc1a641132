"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — rows of /root/testdata/sf0.001 turned
  into JSON-LD docs and run through the fused expand->nodeMap->toRDF
  Arrow stage (the engine's core path).
- ``queries()``: one entry per implemented operator family from
  SURVEY.md §2 (+ the training-data operator battery).
- ``oracle_sql()``: DuckDB-runnable ANSI SQL for every
  SQL-expressible query; kg_extract/kg_canonize over the synthetic
  transcript corpus are non-SQL-expressible (their correctness gate is
  the hand-written-quads P/R test in tests/test_pipeline.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from jsonld_js_spark.queries import QUERIES, kg_tordf_customers


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return kg_tordf_customers(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql}
