"""NULL handling on legal inputs: a NULL category value and a NULL target
label are both valid data (the reference's polars ``replace`` maps NULL like
any value) and must not crash the literal-map or broadcast-join encoders."""

import pandas as pd
import pytest

from efficient_trees_spark import tree as tree_mod
from efficient_trees_spark.tree import DecisionTreeClassifier


def _df_with_null_category(spark):
    pdf = pd.DataFrame(
        {
            "color": ["red", "blue", None, "red", "blue", None] * 5,
            "x": [1.0, 2.0, 3.0, 1.1, 2.1, 3.1] * 5,
            "target": [0, 1, 1, 0, 1, 1] * 5,
        }
    )
    return spark.createDataFrame(pdf)


def test_fit_with_null_category_literal_map(spark):
    df = _df_with_null_category(spark)
    model = DecisionTreeClassifier(max_depth=3, categorical_columns=["color"])
    model.fit(df, "target")
    assert None in model.categorical_mappings["color"]
    preds = model.predict_many(df)
    assert len(preds) == 30
    assert set(preds) <= {0, 1}


def test_fit_with_null_category_broadcast_path(spark, monkeypatch):
    monkeypatch.setattr(tree_mod, "_LITERAL_MAP_MAX", 1)  # force join encoder
    df = _df_with_null_category(spark)
    model = DecisionTreeClassifier(max_depth=3, categorical_columns=["color"])
    model.fit(df, "target")
    encoded = model.apply_categorical_mappings(df)
    codes = {r["color"] for r in encoded.select("color").distinct().collect()}
    assert None not in codes  # every category, including NULL, got a code
    assert codes == set(model.categorical_mappings["color"].values())


def test_fit_with_null_target_label(spark):
    pdf = pd.DataFrame(
        {
            "x": [1.0, 2.0, 3.0, 4.0] * 5,
            "target": pd.array([0, 1, None, 1] * 5, dtype="Int64"),
        }
    )
    df = spark.createDataFrame(pdf)
    model = DecisionTreeClassifier(max_depth=2)
    model.fit(df, "target")  # NULL is simply a third class
    assert model.tree is not None


def test_null_category_routes_consistently(spark):
    """Rows whose category is NULL must route to the same ordinal every time
    (train vs apply), so predictions on NULL-category rows are deterministic."""
    df = _df_with_null_category(spark)
    model = DecisionTreeClassifier(max_depth=3, categorical_columns=["color"])
    model.fit(df, "target")
    a = model.predict_many(df)
    b = model.predict_many(df)
    assert a == b
