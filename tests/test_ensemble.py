"""RandomForestClassifier: vote semantics, determinism, persistence."""

from __future__ import annotations

import pandas as pd

from efficient_trees_spark import RandomForestClassifier
from tests.iris_fixture import train_test_frames


def _iris(spark):
    train_pd, test_pd = train_test_frames(string_labels=False)
    train = spark.createDataFrame(train_pd.drop(columns=["categorical_feature"]))
    test = spark.createDataFrame(test_pd.drop(columns=["categorical_feature"]))
    return train, test, list(test_pd["target"])


def test_forest_accuracy_and_determinism(spark):
    train, test, labels = _iris(spark)
    rf = RandomForestClassifier(n_trees=7, max_depth=4, feature_fraction=0.75, seed=42)
    rf.fit(train, "target")
    preds = rf.predict_many(test)
    acc = sum(p == l for p, l in zip(preds, labels)) / len(labels)
    assert acc >= 0.9
    rf2 = RandomForestClassifier(n_trees=7, max_depth=4, feature_fraction=0.75, seed=42)
    rf2.fit(train, "target")
    assert rf.trees == rf2.trees  # same seed → identical forest


def _leaf_forest(values, targets):
    rf = RandomForestClassifier(n_trees=len(values))
    rf.trees = [{"type": "leaf", "value": v} for v in values]
    rf._unique_targets = targets
    return rf


def test_vote_majority_and_tie_break(spark):
    df = spark.createDataFrame([(1.0,)], ["x"])
    # clear majority
    rf = _leaf_forest([1, 1, 0], [0, 1])
    assert rf.transform(df).collect()[0]["prediction"] == 1
    # 2-2 tie breaks to the smaller class, like the single tree's majority vote
    rf = _leaf_forest([1, 1, 0, 0], [0, 1])
    assert rf.transform(df).collect()[0]["prediction"] == 0


def test_vote_null_abstention(spark):
    # both trees split on x; a NULL x means every tree abstains → NULL
    node = {
        "type": "node",
        "feature": "x",
        "threshold": 0.5,
        "information_gain": 0.1,
        "criterion_value": 0.5,
        "target_distribution": [1, 1],
        "left": {"type": "leaf", "value": 0},
        "right": {"type": "leaf", "value": 1},
    }
    rf = RandomForestClassifier(n_trees=2)
    rf.trees = [node, node]
    rf._unique_targets = [0, 1]
    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, None]}))
    kept = rf.transform(df, null_policy="keep").orderBy("x").collect()
    assert [r["prediction"] for r in kept] == [None, 1]
    assert rf.transform(df, null_policy="drop").count() == 1


def test_forest_roundtrip(spark, tmp_path):
    train, test, _ = _iris(spark)
    rf = RandomForestClassifier(n_trees=3, max_depth=3, seed=7)
    rf.fit(train, "target")
    path = str(tmp_path / "forest.pkl")
    rf.save_model(path)
    loaded = RandomForestClassifier()
    loaded.load_model(path)
    assert loaded.predict_many(test) == rf.predict_many(test)


def test_forest_json_roundtrip_with_categoricals(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "color": ["red", "blue", "red", "green", "blue", "green"] * 5,
            "x": [1.0, 2.0, 1.5, 3.0, 2.5, 3.5] * 5,
            "target": [0, 1, 0, 1, 1, 1] * 5,
        }
    )
    df = spark.createDataFrame(pdf)
    rf = RandomForestClassifier(n_trees=2, max_depth=3, seed=3, categorical_columns=["color"])
    rf.fit(df, "target")
    clone = RandomForestClassifier.from_json(rf.to_json())
    assert clone.categorical_mappings == rf.categorical_mappings
    assert clone.predict_many(df) == rf.predict_many(df)


def test_binned_forest_packed_matches_snapped_expand(spark, monkeypatch):
    """A binned forest (the 100 TB path) now trains on the shared packed
    uint8 code relation; forcing the >253-edge fallback (snap + expand)
    must yield the IDENTICAL forest — same bootstrap rows (the pack pass is
    a 1:1 row map, so seeded sampling picks the same logical rows), same
    candidate edges, same trees."""
    from efficient_trees_spark.operators import histogram

    train, _, _ = _iris(spark)
    kwargs = dict(
        n_trees=5, max_depth=3, feature_fraction=0.75, max_bins=8, seed=11
    )
    rf_packed = RandomForestClassifier(**kwargs)
    rf_packed.fit(train, "target")

    monkeypatch.setattr(histogram, "_MAX_PACKED_EDGES", -1)
    rf_fallback = RandomForestClassifier(**kwargs)
    rf_fallback.fit(train, "target")

    assert rf_packed.trees == rf_fallback.trees
