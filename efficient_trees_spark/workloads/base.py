"""Registry plumbing for checkable workloads."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Workload:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Workload] = {}


def workload(name: str, oracle: str | None = None, description: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering fn(spark, sf_dir) -> DataFrame under ``name``."""

    def deco(fn):
        REGISTRY[name] = Workload(name, fn, oracle, description, tags)
        return fn

    return deco


class PinnedOracleScaleError(ValueError):
    """A workload whose oracle pins literal values for one specific data
    scale was invoked against different data — a CONFIG error, distinct
    from a correctness mismatch (which would silently report hash-fail)."""


def require_pinned_scale(actual: int, expected: int, workload_name: str, what: str) -> None:
    """Fail loudly when a pinned-VALUES oracle's scale assumption breaks.

    Some oracles pin engine outputs as literals valid only at the driver's
    sf0.01 gate (seeded fits) or while a regime assumption holds (HLL sparse
    mode).  Running them elsewhere must be a clear config error, not a
    mysterious value-hash mismatch."""
    if actual != expected:
        raise PinnedOracleScaleError(
            f"{workload_name}: oracle pins literal values that assume {what} "
            f"= {expected}, but the supplied sf_dir has {actual}. Regenerate "
            "the pinned VALUES with tools/oracle_check.py for this scale, or "
            "point the gate back at sf0.01."
        )


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # Resolve through the session catalog (sources.io.source_view): first
    # call per session reads + registers, later calls are ~15 ms catalog
    # lookups instead of ~290 ms re-read + re-analysis (r11, guide §6).
    # Testdata paths are immutable, so the cached listing can't go stale.
    from efficient_trees_spark.sources.io import source_view

    df = source_view(spark, f"{sf_dir}/{table}.parquet")
    # events.parquet stores ts as parquet TIMESTAMP(NANOS); Spark 4.1 reads it
    # natively as timestamp_ntz (micros, truncated like DuckDB). NTZ rejects
    # epoch arithmetic (cast to BIGINT / unix_micros), so pin the session to
    # UTC (runtime-settable, idempotent) and cast to timestamp — under UTC the
    # NTZ wall-clock IS the UTC instant, so every downstream epoch expression
    # and date_format is unchanged.
    if table == "events" and dict(df.dtypes).get("ts") == "timestamp_ntz":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
