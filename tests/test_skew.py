"""Skew mitigation operators (operators/skew.py): salted two-phase
aggregation, hot-key detection, and the salted skew join — results must be
EXACTLY the unsalted plan's, on data with a deliberate whale key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efficient_trees_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share key 'whale'; the rest spread over 50 cold keys."""
    df = spark.range(5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("whale"))
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 50).cast("string")))
        .alias("k"),
        (F.col("id") % 97).cast("long").alias("v"),
        F.col("id").alias("rid"),
    )
    return df.persist()


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_aggregate_matches_plain(skewed):
    plain = skewed.groupBy("k").agg(
        F.sum("v").alias("s"),
        F.count("v").alias("c"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.avg("v").alias("m"),
    )
    salted = skew.salted_aggregate(
        skewed,
        ["k"],
        {
            "s": ("sum", "v"),
            "c": ("count", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
            "m": ("avg", "v"),
        },
        n_salts=8,
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)
    assert salted.columns == plain.columns  # salt never escapes


def test_salted_aggregate_rejects_nonalgebraic(skewed):
    with pytest.raises(ValueError, match="unsupported"):
        skew.salted_aggregate(skewed, ["k"], {"d": ("collect_list", "v")})


def test_hot_keys_finds_the_whale(skewed):
    hot = skew.hot_keys(skewed, ["k"], min_count=1000)
    assert hot == [("whale",)]


def test_salted_join_matches_plain_inner_and_left(spark, skewed):
    small = spark.createDataFrame(
        [("whale", 1.0), ("cold_3", 2.0), ("cold_3", 3.0), ("absent", 9.0)],
        "k string, w double",
    )
    hot = skew.hot_keys(skewed, ["k"], min_count=1000)
    for how in ("inner", "left"):
        plain = skewed.join(small, ["k"], how)
        salted = skew.salted_join(skewed, small, ["k"], hot, n_salts=8, how=how)
        assert _sorted_rows(salted) == _sorted_rows(plain), how
        assert sorted(salted.columns) == sorted(plain.columns)


def test_salted_join_empty_hot_list_is_plain_join(spark, skewed):
    small = spark.createDataFrame([("cold_1", 5.0)], "k string, w double")
    out = skew.salted_join(skewed, small, ["k"], hot=[], n_salts=4)
    assert _sorted_rows(out) == _sorted_rows(skewed.join(small, ["k"], "inner"))


def test_salted_aggregate_is_deterministic(skewed):
    a = _sorted_rows(
        skew.salted_aggregate(skewed, ["k"], {"s": ("sum", "v")}, n_salts=8)
    )
    b = _sorted_rows(
        skew.salted_aggregate(skewed, ["k"], {"s": ("sum", "v")}, n_salts=8)
    )
    assert a == b


def test_phase1_bounds_group_fanout(skewed):
    """The whole point: phase 1 splits the whale group over n_salts
    partial groups, so no single reducer sees the whale alone."""
    n_salts = 8
    salted = skewed.withColumn(
        "__salt", skew._salt_expr(skewed, ["k"], n_salts, None)
    )
    whale_salts = (
        salted.filter(F.col("k") == "whale").select("__salt").distinct().count()
    )
    assert whale_salts == n_salts
