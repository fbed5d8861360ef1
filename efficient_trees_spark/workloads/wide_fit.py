"""AMEX-shaped wide-fit benchmark workload.

The reference's only published benchmark fits a 5.5M-row, ~190-float-feature
parquet (the Kaggle AMEX table) at ``max_depth=4`` with entropy after
``fill_null(0.0)`` (``/root/reference/examples/memory_profiling.py:30-45,63``,
table shape at :78-79).  The driver testdata is narrow (~7 numeric columns),
so every fit bench so far has only exercised the melt at width 7 — but the
melt (`operators/split_finder.py:melt_features`) inflates rows x n_features
map-side before the partial aggregation, and that inflation has to be
measured at the reference's real width.

This workload derives a deterministic ``N_FEATURES``-float-feature table
FROM the driver's lineitem parquet (no synthetic row universe — every row is
a lineitem row; features are xxhash64-mixed with real column signal so splits
carry information; ~1% of cells are NULL to exercise the reference's
``fill_null(0.0)`` preamble), caches it as parquet under the repo, and fits
the same shape the reference benchmarks: depth 4, entropy, binary target.

The cached table is a bench asset, not testdata: it is regenerated on demand
from the driver parquet and never committed (.bench_cache is gitignored).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_trees_spark.enums import Criterion
from efficient_trees_spark.tree import DecisionTreeClassifier
from efficient_trees_spark.workloads.base import load

N_FEATURES = 190

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def wide_table_path(
    sf_dir: str, n_features: int = N_FEATURES, row_mult: int = 1
) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    mult = f"_x{row_mult}" if row_mult > 1 else ""
    return os.path.join(
        _REPO_ROOT, ".bench_cache", f"wide{n_features}_{tag}{mult}.parquet"
    )


def build_wide_table(
    spark: SparkSession,
    sf_dir: str,
    n_features: int = N_FEATURES,
    row_mult: int = 1,
) -> DataFrame:
    """190 f32 feature columns + a binary int target, one row per lineitem row.

    Each feature mixes a per-(row, feature) uniform hash draw with a real
    signal column at a feature-dependent weight, so the fitted tree finds
    genuinely different gains per feature (a pure-noise table would make
    every feature interchangeable and understate the argmax work).  ~1% of
    cells are NULL — the reference's AMEX run fills them with 0.0 before
    fitting and so does :func:`tree_fit_wide`.

    ``row_mult`` row-scales the table independently of the sf ladder (the
    reference's benchmark is 5.5M rows — ~10x the sf0.1 lineitem): each
    replica perturbs the hashed key so its uniform draws are fresh while the
    real-signal columns keep their marginal distributions.  ``row_mult=1``
    is byte-identical to the unscaled table.
    """
    li = load(spark, sf_dir, "lineitem")
    if row_mult > 1:
        li = li.select(
            F.explode(F.sequence(F.lit(0), F.lit(int(row_mult) - 1))).alias("__rep"),
            "*",
        ).withColumn(
            "l_orderkey",
            F.col("l_orderkey") + F.col("__rep") * F.lit(10_000_000_000),
        )
    # Binary target from real data (roughly balanced on the TPC-H-ish
    # distribution: quantity is uniform 1..50).
    target = (F.col("l_quantity") > 25).cast("int").alias("target")
    # Signal in [0, 1): revenue-ish, decorrelated from the raw quantity cut
    # enough that depth-4 growth doesn't collapse to one feature.
    signal = F.pmod(F.col("l_extendedprice") * (1 - F.col("l_discount")), F.lit(1000.0)) / 1000.0

    feats = []
    for i in range(n_features):
        u = (
            F.pmod(
                F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber"), F.lit(i)),
                F.lit(100_000),
            )
            / 100_000.0
        )
        w = (i % 7) / 10.0  # 0.0 .. 0.6 signal weight, varies by feature
        value = ((1.0 - w) * u + w * signal).cast("float")
        is_null = (
            F.pmod(
                F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber"), F.lit(i + 1_000_000)),
                F.lit(100),
            )
            == 0
        )
        feats.append(F.when(is_null, F.lit(None).cast("float")).otherwise(value).alias(f"f_{i}"))
    return li.select(*feats, target)


def ensure_wide_table(
    spark: SparkSession,
    sf_dir: str,
    n_features: int = N_FEATURES,
    row_mult: int = 1,
) -> str:
    """Materialize the wide table once per (sf, width, row_mult); return its
    path.

    Kept OUT of the timed region (bench.py calls this in its prepare hook):
    the benchmark measures the fit over a real wide parquet — the reference's
    exact setup (scan_parquet -> fill_null -> fit) — not feature synthesis.
    """
    path = wide_table_path(sf_dir, n_features, row_mult)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # Write a scan-friendly layout: enough files to feed every core and
        # BOUNDED row groups.  Spark's 128 MB parquet.block.size default
        # produced ~134 MB row groups here, and a row group is the parquet
        # scan's atomic unit — each task buffers one whole group's column
        # chunks, so at 190 columns a single wide-scan task transiently
        # held ~300-400 MB of heap (measured: 32 concurrent tasks OOM'd a
        # 6 GB local[32] heap) and the sf0.1 table scanned 4-way on 32
        # cores, forcing an up-front repartition shuffle of the full
        # matrix.  32 MB groups (~22k rows at width 190) bound per-task
        # scan memory ~4x below that and make `_fan_out_small_input` a
        # genuine no-op — the same rule a 100 TB writer should follow:
        # size row groups for the READER's width x concurrency budget,
        # not the writer's convenience.
        from efficient_trees_spark.sources.io import (
            write_parquet_for_wide_readers,
        )

        write_parquet_for_wide_readers(
            build_wide_table(spark, sf_dir, n_features, row_mult), path
        )
    return path


def tree_fit_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference benchmark shape on Spark: depth-4 entropy fit over
    ``N_FEATURES`` float features with NULLs filled 0.0, scale path engaged
    (``max_bins=32`` quantile-binned candidates — at 190 features exact mode's
    Sigma-distinct shuffle volume is the known ceiling, see SCALE.md).
    Returns the prediction distribution so the result is a stable tiny frame.
    """
    path = ensure_wide_table(spark, sf_dir)
    # catalog-resolved: the 190-column footer/analysis is paid once per
    # session, not once per construction (immutable once _SUCCESS exists)
    from efficient_trees_spark.sources.io import source_view

    data = source_view(spark, path).na.fill(0.0)
    model = DecisionTreeClassifier(
        max_depth=4, criterion=Criterion.ENTROPY, max_bins=32
    )
    model.fit(data, "target")
    return (
        model.transform(data, null_policy="keep")
        .groupBy("prediction")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def tree_fit_wide_prepare(spark: SparkSession, sf_dir: str) -> None:
    ensure_wide_table(spark, sf_dir)


tree_fit_wide.prepare = tree_fit_wide_prepare  # bench.py hook
