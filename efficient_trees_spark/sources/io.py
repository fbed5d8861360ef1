"""Sources and sinks (reference SURVEY.md §2.1, S1-S5).

The reference's lazy scans (``pl.scan_parquet`` — examples/amex_default.py:12,
``pl.scan_csv`` — examples/heart_disease.py:12) map to Spark's always-lazy
readers; predicate/projection pushdown into the Parquet scan is Catalyst
built-in (check ``PushedFilters``/``ReadSchema`` in ``df.explain``).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S1 — lazy parquet scan, schema from footer (amex_default.py:12)."""
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, infer_schema: bool = True) -> DataFrame:
    """S2 — CSV scan with header + inferred schema (heart_disease.py:12).
    In production prefer an explicit schema: inference scans the file twice."""
    return spark.read.csv(path, header=True, inferSchema=infer_schema)


def from_pandas(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """S3 — in-memory table (iris.py:18-22); Arrow-accelerated by session conf."""
    return spark.createDataFrame(pdf)


def to_list(df: DataFrame, column: str | None = None) -> list:
    """S5 — single-column result sink → Python list (tree.py:113,144)."""
    col = column or df.columns[0]
    return [row[0] for row in df.select(col).collect()]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table present under ``sf_dir`` (TESTDATA.md)."""
    out: dict[str, DataFrame] = {}
    for name in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for spark.sql(...) access."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def fan_out_small_input(df: DataFrame) -> DataFrame:
    """Widen a too-narrow source to the session's parallelism — local-mode
    guard for map-heavy operators (tokenize/regex/hash passes parallelize
    over the source's partition count, and a small local parquet file is ONE
    split, idling every other core).  Pays one bounded shuffle only when
    partitions < defaultParallelism; on a real cluster splits far exceed
    cores and this is a no-op.  Same discipline as the binned tree fit's
    ``tree._fan_out_small_input``."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def write_parquet_for_wide_readers(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    row_group_bytes: int = 32 << 20,
    rows_per_file: int | None = 85_000,
) -> None:
    """Parquet writer sized for WIDE readers — the 100 TB writer's rule.

    A row group is the parquet scan's atomic unit: every scan task buffers
    one whole group's column chunks, so per-task scan memory is
    ``row_group_bytes`` × (reader concurrency), REGARDLESS of how few
    columns the query projects from a wide table's group.  Spark's 128 MB
    ``parquet.block.size`` default is a writer-side convenience; at 190
    columns it produced ~134 MB groups whose 32-way concurrent scan
    transiently held 300–400 MB PER TASK and OOM'd a 6 GB local heap
    (measured — SCALE.md memory notes), while 32 MB groups bound the same
    scan ~4× lower and parallelize a small table across every core.

    ``rows_per_file`` additionally bounds file size so the file count
    feeds the reader's parallelism (None skips the repartition — e.g. when
    the caller already partitioned for a downstream bucketing scheme).
    The repartition is a round-robin shuffle of the written data — the
    one-time write cost that buys every future scan's memory bound."""
    out = df
    if rows_per_file:
        n_rows = df.count()
        sc = df.sparkSession.sparkContext
        n_files = max(sc.defaultParallelism, -(-n_rows // int(rows_per_file)))
        out = df.repartition(n_files)
    (
        out.write.mode(mode)
        .option("parquet.block.size", int(row_group_bytes))
        .parquet(path)
    )
