"""Property-based parity (hypothesis): on arbitrary small numeric datasets,
the compiled-CASE batch plan, the driver-side tree walk, and the
level-wise/node-wise training strategies must all agree.

Data strategy: up to 24 rows, 2 features drawn from a SMALL value grid
(collisions and exact-threshold sits are the interesting cases — a uniform
float draw would almost never produce ties), binary-ish labels.  One shared
Spark session; hypothesis deadline disabled (Spark latency dominates).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from efficient_trees_spark.enums import Criterion
from efficient_trees_spark.tree import DecisionTreeClassifier

VALUES = [0.0, 1.0, 1.5, 2.0, 3.0]
LABELS = [0, 1, 2]

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(VALUES), st.sampled_from(VALUES), st.sampled_from(LABELS)
    ),
    min_size=4,
    max_size=24,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_compiled_case_equals_driver_walk_and_strategies_agree(spark, rows):
    df = spark.createDataFrame(rows, ["f1", "f2", "target"])
    model = DecisionTreeClassifier(max_depth=3, criterion=Criterion.GINI)
    model.fit(df, "target", strategy="level")

    node_model = DecisionTreeClassifier(max_depth=3, criterion=Criterion.GINI)
    node_model.fit(df, "target", strategy="node")
    assert model.tree == node_model.tree  # PLANET == reference recursion

    # compiled CASE plan vs pure-driver walk, row for row (same input order:
    # the transform plan is select-only, so collected order == input order)
    batch = model.predict_many(df)
    walked = model.predict([{"f1": f1, "f2": f2} for f1, f2, _ in rows])
    assert batch == walked
