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


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        # events.parquet stores ts as parquet TIMESTAMP(NANOS), which a vanilla
        # Spark session refuses to read (PARQUET_TYPE_ILLEGAL). The legacy knob
        # surfaces it as int64 ns and is runtime-settable, so set it here rather
        # than relying on the session builder having done so (the correctness
        # driver constructs its own session). Idempotent.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS), surfaced as int64 ns under
    # spark.sql.legacy.parquet.nanosAsLong; truncate to micros (integer DIV —
    # a double division would lose precision above 2^53) like DuckDB does.
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df
