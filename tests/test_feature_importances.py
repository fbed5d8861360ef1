"""Gain-based feature importances (tree + forest): normalization, domain,
and the sanity signal that the split-dominating feature ranks first."""

from __future__ import annotations

import math

from efficient_trees_spark.enums import Criterion
from efficient_trees_spark.ensemble import RandomForestClassifier
from efficient_trees_spark.tree import DecisionTreeClassifier
from tests.iris_fixture import IRIS, FEATURE_NAMES


def _iris_df(spark):
    targets = [i // 50 for i in range(len(IRIS))]  # 50 per class, in order
    rows = [tuple(x) + (y,) for x, y in zip(IRIS, targets)]
    return spark.createDataFrame(rows, [*FEATURE_NAMES, "target"])


def test_tree_importances_normalized_and_sensible(spark):
    df = _iris_df(spark)
    model = DecisionTreeClassifier(max_depth=3, criterion=Criterion.GINI)
    model.fit(df, "target")
    imp = model.feature_importances()
    assert imp, "fitted tree with >=1 split must yield importances"
    assert all(v >= 0 for v in imp.values())
    assert math.isclose(sum(imp.values()), 1.0, rel_tol=1e-12)
    assert set(imp) <= set(FEATURE_NAMES)
    # on iris, a petal measurement separates the classes and must dominate
    top = max(imp, key=imp.get)
    assert "petal" in top, imp


def test_unsplit_tree_has_no_importances(spark):
    df = _iris_df(spark)
    model = DecisionTreeClassifier(max_depth=0)
    model.fit(df, "target")
    assert model.feature_importances() == {}


def test_forest_importances(spark):
    df = _iris_df(spark)
    forest = RandomForestClassifier(
        n_trees=3, max_depth=3, criterion=Criterion.GINI, seed=11
    )
    forest.fit(df, "target")
    imp = forest.feature_importances()
    assert math.isclose(sum(imp.values()), 1.0, rel_tol=1e-12)
    assert all(v >= 0 for v in imp.values())
    assert "petal" in max(imp, key=imp.get)


def test_importances_survive_json_roundtrip(spark):
    df = _iris_df(spark)
    model = DecisionTreeClassifier(max_depth=3, criterion=Criterion.GINI)
    model.fit(df, "target")
    back = DecisionTreeClassifier.from_json(model.to_json())
    assert back.feature_importances() == model.feature_importances()
