"""Workload registry: every checkable query the engine implements.

Each workload pairs a Spark DataFrame program with (where expressible) an
equivalent ANSI-SQL oracle for DuckDB — the driver's correctness gate runs
both and hash-compares values (see repo-root ``__spark_entry__.py``).

Importing this package populates the registry.
"""

from efficient_trees_spark.workloads.base import REGISTRY, Workload

from efficient_trees_spark.workloads import relational  # noqa: F401  (registers)
from efficient_trees_spark.workloads import tree_queries  # noqa: F401
from efficient_trees_spark.workloads import timeseries  # noqa: F401

try:  # extensions register themselves too; keep core importable if one breaks
    from efficient_trees_spark.workloads import text_pipeline  # noqa: F401
    from efficient_trees_spark.workloads import dedup_queries  # noqa: F401
    from efficient_trees_spark.workloads import similarity_queries  # noqa: F401
    from efficient_trees_spark.workloads import multimodal_queries  # noqa: F401
except ImportError:  # pragma: no cover
    pass

__all__ = ["REGISTRY", "Workload"]
