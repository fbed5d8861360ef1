"""Column-expression library for split scoring.

Pure functions returning ``pyspark.sql.Column`` trees — the Spark-first
re-expression of the reference's Polars expression pipeline
(``/root/reference/efficient_trees/tree.py:206-330``).  Everything here is a
Catalyst expression: it runs inside whole-stage codegen on executors, with no
Python in the hot path.

Naming convention: classes are addressed by *position* in the caller's
``unique_targets`` list (``class_0``, ``class_1``, …) rather than by label
value, so arbitrary label values (strings with spaces, floats) never leak into
column names.

Semantics notes vs the reference:

* ``0 * log2(0)``: Polars produces NaN and the reference patches it with
  ``fill_nan(0.0)`` (tree.py:215).  Spark's ``log2(0)`` returns NULL (not
  -inf), so the guarded form ``CASE WHEN p > 0 THEN p*log2(p) ELSE 0 END`` is
  both the cleaner and the correct translation.
* Scalar-broadcast aggregates (Polars ``col(c).sum()`` inside a select,
  tree.py:261-268) become window aggregates over ``partitionBy(feature)`` —
  they run on the post-aggregation relation (one row per distinct value), so
  the window input is small and partitioned by feature for parallelism.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from efficient_trees_spark.enums import Criterion


def class_count_col(index: int) -> str:
    return f"class_{index}_count"


def conditional_class_counts(target_col: str, n_classes: int) -> list[Column]:
    """Per-class conditional counts for a groupBy().agg(...).

    Reference: the per-distinct-feature-value ``filter(t == v).len()``
    aggregation (tree.py:243-254).  Spark form: ``count(CASE WHEN t = v THEN 1
    END)`` — a single hash aggregate with map-side partial aggregation, one
    shuffle regardless of class count.

    The target column is expected to be pre-encoded to its class *index*
    (see ``split_finder``); this keeps the comparison a cheap int equality.
    """
    return [
        F.count(F.when(F.col(target_col) == index, F.lit(1))).alias(class_count_col(index))
        for index in range(n_classes)
    ]


def sum_horizontal(cols: list[Column]) -> Column:
    """Row-wise sum across generated per-class columns.

    Reference ``pl.sum_horizontal`` (tree.py:210-218, 226-228): columns are
    generated in Python either way, so the Spark form is a plain ``+`` fold.
    """
    return reduce(operator.add, cols)


def entropy_expr(proportion_cols: list[Column]) -> Column:
    """Shannon entropy of a distribution given as proportion columns.

    Reference tree.py:206-221.  ``p=0`` terms contribute 0 (see module note on
    log2(0) semantics).
    """
    terms = [
        F.when(p > 0, p * F.log2(p)).otherwise(F.lit(0.0)) for p in proportion_cols
    ]
    return -1.0 * sum_horizontal(terms)


def gini_expr(proportion_cols: list[Column]) -> Column:
    """Gini impurity ``1 - sum(p^2)``.  Reference tree.py:222-231."""
    return F.lit(1.0) - sum_horizontal([p * p for p in proportion_cols])


def criterion_expr(criterion: Criterion, proportion_cols: list[Column]) -> Column:
    if criterion == Criterion.ENTROPY:
        return entropy_expr(proportion_cols)
    if criterion == Criterion.GINI:
        return gini_expr(proportion_cols)
    raise ValueError(f"unknown criterion: {criterion!r}")


def weighted_child_criterion(
    left_criterion: Column,
    right_criterion: Column,
    left_count: Column,
    total_count: Column,
) -> Column:
    """Size-weighted mean of child impurities.  Reference tree.py:314-324."""
    right_count = total_count - left_count
    return (
        left_count / total_count * left_criterion
        + right_count / total_count * right_criterion
    )


def information_gain(parent_criterion: Column, child_criterion: Column) -> Column:
    """Reference tree.py:325-330."""
    return parent_criterion - child_criterion
