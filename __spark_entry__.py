"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented workload from SURVEY.md §2 (plus the
training-data-pipeline extensions); ``oracle_sql()`` the matching DuckDB SQL.
Definitions live in ``efficient_trees_spark/workloads/`` — this file only
adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from efficient_trees_spark.workloads import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the engine's unified split-gain pipeline (the core of
    decision-tree training as one declarative plan) on sf0.001."""
    return REGISTRY["split_candidate_gains"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: wl.fn for name, wl in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: wl.oracle for name, wl in REGISTRY.items() if wl.oracle is not None}
