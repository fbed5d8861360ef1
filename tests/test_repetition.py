"""Repetition signals (Gopher-style filters): duplicate-line fraction and
top-bigram coverage."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from efficient_trees_spark.functions import text


def _vals(spark, rows, expr):
    df = spark.createDataFrame(rows, ["id", "body"])
    return {r["id"]: r["v"] for r in df.select("id", expr.alias("v")).collect()}


def test_duplicate_line_fraction(spark):
    got = _vals(
        spark,
        [
            (1, "alpha\nbeta\ngamma"),            # all unique
            (2, "same line\nsame line\nsame line"),  # 2 of 3 are repeats
            (3, "a\n\n\na"),                       # blank lines dropped; 1 of 2 repeats
            (4, ""),                               # no lines at all
            (5, "one line only"),
        ],
        text.duplicate_line_fraction("body"),
    )
    assert got[1] == 0.0
    assert math.isclose(got[2], 2 / 3)
    assert got[3] == 0.5
    assert got[4] == 0.0
    assert got[5] == 0.0


def test_top_bigram_fraction(spark):
    got = _vals(
        spark,
        [
            (1, "spam ham spam ham spam ham spam ham"),  # "spam ham" dominates
            (2, "all tokens here are fully distinct words"),
            (3, "one"),
            (4, ""),
        ],
        text.top_bigram_fraction("body"),
    )
    # 8 tokens, "spam ham" occurs 4 times → 2*4/8 = 1.0 (capped)
    assert got[1] == 1.0
    # 7 distinct tokens → every bigram unique → 2*1/7
    assert math.isclose(got[2], 2 / 7)
    assert got[3] == 0.0 and got[4] == 0.0


def test_repetition_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "a b a b")], ["id", "body"])
    out = df.select(
        text.duplicate_line_fraction("body").alias("dl"),
        text.top_bigram_fraction("body").alias("tb"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
