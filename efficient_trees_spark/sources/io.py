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


# path -> deterministic temp-view name (see source_view)
_SOURCE_VIEW_NAMES: dict[str, str] = {}


def source_view(spark: SparkSession, path: str) -> DataFrame:
    """Resolve an IMMUTABLE parquet path through the session catalog.

    The first call per session reads the parquet (footer schema + file
    listing + analysis, ~290 ms measured at r11) and registers the analyzed
    relation as a temp view; every later call is a ~15 ms catalog lookup.
    Guide §6's "avoid repeated listings", applied to repeated DataFrame
    construction: this is METADATA reuse only — a temp view is a lazy plan
    and every execution still scans the parquet files.  Callers whose paths
    mutate between reads must use ``spark.read.parquet`` directly (or
    ``spark.catalog.refreshTable`` on write)."""
    name = _SOURCE_VIEW_NAMES.get(path)
    if name is None:
        import re

        name = "__src_" + re.sub(r"[^0-9a-zA-Z]+", "_", path).strip("_")
        _SOURCE_VIEW_NAMES[path] = name
    try:
        return spark.table(name)
    except Exception:  # not registered in THIS session's catalog yet
        spark.read.parquet(path).createOrReplaceTempView(name)
        return spark.table(name)


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


def _parse_byte_conf(value: str) -> int:
    """Parse a Spark size conf ('134217728', '128m', '4MB', '1g', '512k')."""
    s = value.strip().lower()
    for suffix, mult in (
        ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20), ("kb", 1 << 10),
        ("t", 1 << 40), ("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10),
        ("b", 1),
    ):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    return int(s)


# Logical-plan node names that keep a lineage a plain scan pipeline: the
# relation's partition count is then exactly the file scan's split count,
# which is computable from file sizes alone (no physical planning).
_SCAN_PIPELINE_NODES = frozenset(
    {"Project", "Filter", "Relation", "SubqueryAlias", "View"}
)


def estimate_scan_partitions(df: DataFrame) -> int | None:
    """Partition count of a plain scan pipeline WITHOUT physical planning.

    ``df.rdd.getNumPartitions()`` — the obvious probe — plans the whole
    query and builds the Python-RDD conversion: measured ~0.4 s per call
    steady-state (r11), pure construction overhead on every operator that
    guards its parallelism.  For the common case — projections/filters over
    one parquet load — the split count is a pure function of (file sizes,
    ``maxPartitionBytes``, ``openCostInBytes``, ``minPartitionNum``), so
    replicate Spark's ``FilePartition`` packing from local file metadata:
    ~1 ms, no Spark job, no planning.

    Returns None (caller should fall back to the real probe) when the
    lineage is not a plain scan pipeline, when any input file is non-local
    (a real cluster's hdfs/s3 paths — the probe's cost is amortized by real
    job sizes there), or when anything fails to parse.  A round-robin
    ``Repartition n`` already in the lineage returns ``n`` directly — an
    operator composing onto an already-fanned-out relation must see the
    post-repartition width, not the scan's.

    The estimate gates only a parallelism heuristic, so both miss
    directions are correctness-safe: a false "narrow" pays one bounded
    extra shuffle, a false "wide" keeps the scan's partitioning."""
    spark = df.sparkSession
    try:
        # analyzed, not logical: Spark 4 defers source resolution
        # (logical() is just `UnresolvedDataSource`), and analysis is paid
        # once per DataFrame by ANY consumer, so forcing it here adds no
        # marginal cost to the query that flows on.
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return None
    for line in plan.splitlines():
        node = line.lstrip(" +-:").split(" ", 1)[0].split("[", 1)[0].lstrip("'")
        if node == "Repartition":
            try:
                return int(line.split("Repartition", 1)[1].split(",")[0].strip())
            except (ValueError, IndexError):
                return None
        if node and node not in _SCAN_PIPELINE_NODES:
            return None
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    sizes = []
    for uri in files:
        if not uri.startswith("file:"):
            return None
        path = uri[len("file:"):]
        if path.startswith("//"):
            path = path[2:]
            path = path[path.index("/"):] if "/" in path else path
        try:
            sizes.append(os.path.getsize(path))
        except OSError:
            return None

    def _conf_bytes(key: str, default: int) -> int:
        try:
            return _parse_byte_conf(spark.conf.get(key))
        except Exception:
            return default

    parallelism = spark.sparkContext.defaultParallelism
    max_part = _conf_bytes("spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _conf_bytes("spark.sql.files.openCostInBytes", 4 << 20)
    try:
        min_parts = int(spark.conf.get("spark.sql.files.minPartitionNum"))
    except Exception:
        min_parts = parallelism
    total = sum(sizes) + open_cost * len(sizes)
    max_split = min(max_part, max(open_cost, total // max(1, min_parts)))
    splits: list[int] = []
    for size in sizes:
        off = 0
        while off < size:
            splits.append(min(max_split, size - off))
            off += max_split
    splits.sort(reverse=True)
    parts, current = 0, 0
    for size in splits:
        if current + size > max_split and current > 0:
            parts += 1
            current = 0
        current += size + open_cost
    return parts + (1 if current > 0 else 0)


def fan_out_small_input(df: DataFrame) -> DataFrame:
    """Widen a too-narrow source to the session's parallelism — local-mode
    guard for map-heavy operators (tokenize/regex/hash passes parallelize
    over the source's partition count, and a small local parquet file is ONE
    split, idling every other core).  Pays one bounded shuffle only when
    partitions < defaultParallelism; on a real cluster splits far exceed
    cores and this is a no-op.  Same discipline as the binned tree fit's
    ``tree._fan_out_small_input``.  The partition count comes from
    :func:`estimate_scan_partitions` when the lineage allows (~1 ms);
    when it can't (a non-scan lineage), the fan-out is SKIPPED rather
    than probed via ``df.rdd`` (r12): under AQE, ``.rdd`` on a plan that
    contains any Exchange EXECUTES the shuffle stages below it to resolve
    the final plan — a full extra pass per probe (the trap r11 evicted
    from the tree path; see tree._fan_out_small_input).  Every current
    call site is a plain scan pipeline, so the skip is latent-only; an
    operator composing onto a derived relation keeps that relation's
    partitioning, which is the safe default (derived relations got their
    width from whatever exchange produced them)."""
    sc = df.sparkSession.sparkContext
    n = estimate_scan_partitions(df)
    if n is not None and n < sc.defaultParallelism:
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
