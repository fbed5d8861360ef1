"""Wide-fit (AMEX-shaped) parity and correctness tests.

The reference's published benchmark is a ~190-float-feature depth-4 entropy
fit (``/root/reference/examples/memory_profiling.py:30-45,78-79``).  These
tests pin the three pieces the wide path adds:

* ``operators/histogram.py:binned_histogram_counts`` — Arrow partial
  histograms must reproduce the melt + groupBy counts relation EXACTLY,
  including NULL-drop (reference F1) and NaN-keeps-its-own-slot semantics;
* ``operators/histogram.py:partition_quantile_edges`` — the order-statistic
  merge must produce exact equi-depth edges when the statistics cover every
  row (g >= partition size), and must always include the true max;
* end-to-end: hist_method='arrow' and 'expand' must fit BIT-IDENTICAL trees.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from efficient_trees_spark.enums import Criterion
from efficient_trees_spark.operators import split_finder
from efficient_trees_spark.operators.histogram import (
    binned_histogram_counts,
    partition_quantile_edges,
)
from efficient_trees_spark.tree import DecisionTreeClassifier
from efficient_trees_spark.workloads.wide_fit import build_wide_table

SF_DIR = "/root/testdata/sf0.001"
NAN = float("nan")


@pytest.fixture(scope="module")
def messy_df(spark):
    """Small frame with NULLs, NaNs, and ties — the semantic corners."""
    rows = [
        (1.0, 5.0, 0),
        (1.0, None, 0),
        (2.5, NAN, 1),
        (2.5, 7.5, 1),
        (None, 7.5, 0),
        (4.0, 9.0, 1),
        (4.0, 9.0, 0),
        (NAN, 9.0, 1),
    ]
    return spark.createDataFrame(rows, "a double, b double, __target_idx int").repartition(3)


def _collect_counts(df):
    out = {}
    for r in df.collect():
        v = r["feature_value"]
        key = (r["feature"], "NaN" if v is not None and math.isnan(v) else v)
        out[key] = (r["class_0_count"], r["class_1_count"], r["count_examples"])
    return out


def test_arrow_counts_match_melt_counts(spark, messy_df):
    edges = {"a": [1.0, 2.5, 4.0], "b": [5.0, 7.5, 9.0]}
    arrow = _collect_counts(
        binned_histogram_counts(messy_df, ["a", "b"], 2, edges, "__target_idx")
    )

    # Reference relation: snap (values are already edges here), melt, count.
    long_df = split_finder.melt_features(messy_df, ["a", "b"], "__target_idx")
    melt = _collect_counts(
        long_df.groupBy("feature", "feature_value").agg(
            F.count(F.when(F.col("__target_idx") == 0, 1)).alias("class_0_count"),
            F.count(F.when(F.col("__target_idx") == 1, 1)).alias("class_1_count"),
            F.count(F.lit(1)).alias("count_examples"),
        )
    )
    assert arrow == melt
    # NULLs dropped (a has 7 non-null rows), NaN kept as its own slot.
    assert ("a", "NaN") in arrow
    assert sum(v[2] for k, v in arrow.items() if k[0] == "a") == 7


def test_arrow_counts_snap_between_edges(spark):
    df = spark.createDataFrame(
        [(0.2, 0), (0.4, 1), (0.6, 0), (0.9, 1), (1.0, 1)],
        "a double, __target_idx int",
    )
    counts = _collect_counts(
        binned_histogram_counts(df, ["a"], 2, {"a": [0.5, 1.0]}, "__target_idx")
    )
    # 0.2, 0.4 -> 0.5 ; 0.6, 0.9, 1.0 -> 1.0
    assert counts == {("a", 0.5): (1, 1, 2), ("a", 1.0): (1, 2, 3)}


def test_partition_quantile_edges_exact_when_stats_cover(spark):
    rng = np.random.default_rng(7)
    vals = rng.normal(size=400).round(3)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double").repartition(4)
    n_bins = 8
    edges = partition_quantile_edges(df, ["x"], n_bins, stats_per_partition=400)["x"]
    s = np.sort(vals)
    expected = sorted(
        {float(s[min(int(np.ceil(k / n_bins * s.size)) - 1, s.size - 1)]) for k in range(1, n_bins)}
        | {float(s[-1])}
    )
    assert edges == expected
    assert edges[-1] == float(s[-1])  # true max is always the top edge


def test_partition_quantile_edges_drops_null_nan(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,), (NAN,)], "x double"
    )
    edges = partition_quantile_edges(df, ["x"], 2, 64)["x"]
    assert edges[-1] == 3.0
    assert all(not math.isnan(e) for e in edges)


def test_wide_fit_arrow_expand_parity(spark):
    data = build_wide_table(spark, SF_DIR, n_features=24)
    trees = {}
    for hm in ("arrow", "expand"):
        m = DecisionTreeClassifier(
            max_depth=3, criterion=Criterion.ENTROPY, max_bins=16, hist_method=hm
        )
        m.fit(data, "target")
        trees[hm] = json.dumps(m.tree, sort_keys=True)
        assert m.tree["type"] == "node"  # the fit actually split
    assert trees["arrow"] == trees["expand"]


def test_hist_method_validation(spark):
    data = build_wide_table(spark, SF_DIR, n_features=4)
    with pytest.raises(ValueError, match="requires max_bins"):
        DecisionTreeClassifier(max_depth=2, hist_method="arrow").fit(data, "target")
    with pytest.raises(ValueError, match="unknown hist_method"):
        DecisionTreeClassifier(hist_method="numpy")
