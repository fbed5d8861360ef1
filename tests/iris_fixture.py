"""The reference's golden parity fixture.

Data + split live in :mod:`efficient_trees_spark.datasets` (inlined UCI iris,
sklearn-equivalent seed-42 split — see that module's docstring).  This module
adds the reference's hard-coded golden predictions
(`/root/reference/tests/integration/test_tree.py:37-56`) — behavioral ground
truth the Spark engine must reproduce bit-for-bit.
"""

from __future__ import annotations

import pandas as pd

from efficient_trees_spark.datasets import (
    IRIS_DATA as IRIS,
    IRIS_FEATURE_NAMES as FEATURE_NAMES,
    IRIS_TARGET_NAMES as LABELS,
    iris_train_test,
)

__all__ = ["IRIS", "FEATURE_NAMES", "LABELS", "GOLDEN", "golden", "train_test_frames"]

# fmt: off
GOLDEN = {
    "train_entropy": [
        1, 2, 2, 1, 2, 1, 2, 1, 0, 2, 1, 0, 0, 1, 1, 2, 1, 0, 0, 1, 0, 1, 2, 0, 1, 2, 0, 2, 2, 1, 1, 2, 1, 0, 1, 2,
        0, 0, 1, 1, 0, 2, 0, 0, 2, 1, 2, 2, 2, 2, 1, 0, 0, 1, 2, 0, 0, 0, 1, 2, 0, 2, 2, 0, 1, 1, 2, 1, 2, 0, 2, 1,
        2, 1, 1, 1, 0, 1, 1, 0, 1, 2, 2, 0, 1, 2, 2, 0, 2, 0, 1, 2, 2, 1, 2, 1, 1, 2, 2, 0, 1, 2, 0, 1, 2
    ],
    "test_entropy": [
        1, 0, 2, 1, 1, 0, 1, 2, 1, 1, 2, 0, 0, 0, 0, 1, 2, 1, 1, 2, 0, 2, 0, 2, 2, 2, 2, 2, 0, 0, 0, 0, 1, 0, 0, 2,
        1, 0, 0, 0, 2, 2, 1, 0, 0
    ],
    "train_gini": [
        1, 2, 2, 1, 2, 1, 2, 1, 0, 2, 1, 0, 0, 1, 1, 2, 1, 0, 0, 1, 0, 1, 2, 0, 1, 2, 0, 2, 2, 1, 1, 2, 1, 0, 1, 2,
        0, 0, 1, 2, 0, 2, 0, 0, 2, 1, 2, 2, 2, 2, 1, 0, 0, 2, 2, 0, 0, 0, 1, 2, 0, 2, 2, 0, 1, 1, 2, 1, 2, 0, 2, 1,
        2, 1, 1, 1, 0, 1, 1, 0, 1, 2, 2, 0, 1, 2, 2, 0, 2, 0, 1, 2, 2, 1, 2, 1, 1, 2, 2, 0, 1, 2, 0, 1, 2
    ],
    "test_gini": [
        1, 0, 2, 1, 1, 0, 1, 2, 1, 1, 2, 0, 0, 0, 0, 1, 2, 1, 1, 2, 0, 2, 0, 2, 2, 2, 2, 2, 0, 0, 0, 0, 1, 0, 0, 2,
        1, 0, 0, 0, 2, 2, 1, 0, 0
    ],
}
# fmt: on


def train_test_frames(string_labels: bool) -> tuple[pd.DataFrame, pd.DataFrame]:
    return iris_train_test(string_labels=string_labels, categorical_feature=True)


def golden(key: str, string_labels: bool) -> list:
    preds = GOLDEN[key]
    return [LABELS[p] for p in preds] if string_labels else preds
