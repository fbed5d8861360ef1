"""Unified best-split search — ONE Spark job per tree node.

The reference builds an independent lazy plan per feature and materializes all
of them with ``pl.collect_all`` (``/root/reference/efficient_trees/tree.py:237-339``).
Spark has no cross-action plan sharing, so a literal translation would re-scan
the node's data once per feature.  Instead the whole search is ONE declarative
plan (SURVEY.md §7.2, the PLANET-style layout):

    unpivot features to long form  (feature, feature_value, target_idx)
      → groupBy(feature, feature_value): per-class conditional counts   [1 shuffle]
      → Window.partitionBy(feature).orderBy(feature_value): prefix sums [1 shuffle]
      → proportions → criterion → information gain                      [projections]
      → global argmax with total-order tie-break                        [tiny]

Scale properties:
* The unpivot multiplies rows by n_features but is map-local (no shuffle) and
  feeds straight into a partial (map-side) aggregation, so the shuffled volume
  is bounded by Σ_f |distinct(f)| rows — the aggregated relation, not the raw one.
* The window partitions by ``feature`` → parallelism = n_features, and its
  input is the aggregated relation, so the single-partition global-sort hazard
  of the reference's per-feature cum_sum (tree.py:255-268) never appears.
* Everything is built-in Catalyst expressions — whole-stage codegen end to end,
  zero Python UDFs.

Determinism: the reference breaks gain ties by engine internals
(SURVEY.md §2.11.4).  Here ties break by (gain desc, feature position in the
caller's feature list asc, threshold asc) — a total order, so results are
stable under any partitioning.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from efficient_trees_spark.enums import Criterion
from efficient_trees_spark.functions import exprs

# Internal column names (never collide with user feature names because the
# unpivoted relation only carries these fixed columns).
FEATURE = "feature"
FEATURE_VALUE = "feature_value"
TARGET_IDX = "__target_idx"


def melt_features(
    df: DataFrame, feature_names: list[str], target_idx_col: str = TARGET_IDX
) -> DataFrame:
    """Long-form (feature, feature_value, target_idx) relation.

    Reference equivalent: the per-feature ``select([f, t]).filter(is_not_null)
    .rename({f: "feature_value"})`` loop (tree.py:239-240), fused into one
    relation.  Null feature values are dropped per-feature, exactly like the
    reference's F1 filter.
    """
    unpivoted = df.unpivot(
        ids=[target_idx_col],
        values=feature_names,
        variableColumnName=FEATURE,
        valueColumnName=FEATURE_VALUE,
    )
    return unpivoted.filter(F.col(FEATURE_VALUE).isNotNull())


def candidate_split_gains(
    df: DataFrame,
    feature_names: list[str],
    n_classes: int,
    criterion: Criterion,
    target_idx_col: str = TARGET_IDX,
) -> DataFrame:
    """Information gain of EVERY candidate split of every feature.

    Input: ``df`` with double-typed feature columns and an integer class-index
    column.  Output columns: ``feature``, ``feature_value`` (candidate
    threshold), ``information_gain``, ``parent_criterion``.

    Mirrors the reference's per-feature pipeline (tree.py:243-330) with the
    scalar-broadcast totals (tree.py:261-268) expressed as
    ``Window.partitionBy(feature)`` aggregates and the last-candidate filter
    (tree.py:274-277) as a plain column comparison.
    """
    long_df = melt_features(df, feature_names, target_idx_col)

    counts = long_df.groupBy(FEATURE, FEATURE_VALUE).agg(
        *exprs.conditional_class_counts(target_idx_col, n_classes),
        F.count(F.lit(1)).alias("count_examples"),
    )

    w_cum = (
        Window.partitionBy(FEATURE)
        .orderBy(FEATURE_VALUE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(FEATURE)

    cum_cols = [
        F.sum(exprs.class_count_col(i)).over(w_cum).alias(f"cum_class_{i}")
        for i in range(n_classes)
    ] + [F.sum("count_examples").over(w_cum).alias("cum_n")]
    tot_cols = [
        F.sum(exprs.class_count_col(i)).over(w_tot).alias(f"sum_class_{i}")
        for i in range(n_classes)
    ] + [F.sum("count_examples").over(w_tot).alias("sum_n")]

    cum = counts.select(FEATURE, FEATURE_VALUE, *cum_cols, *tot_cols)

    # Drop the maximal value of each feature: a split there leaves the right
    # child empty (reference F3, tree.py:274-277).
    cum = cum.filter(F.col("sum_n") > F.col("cum_n"))

    left_p = [F.col(f"cum_class_{i}") / F.col("cum_n") for i in range(n_classes)]
    right_p = [
        (F.col(f"sum_class_{i}") - F.col(f"cum_class_{i}"))
        / (F.col("sum_n") - F.col("cum_n"))
        for i in range(n_classes)
    ]
    parent_p = [F.col(f"sum_class_{i}") / F.col("sum_n") for i in range(n_classes)]

    left_crit = exprs.criterion_expr(criterion, left_p)
    right_crit = exprs.criterion_expr(criterion, right_p)
    parent_crit = exprs.criterion_expr(criterion, parent_p)
    child_crit = exprs.weighted_child_criterion(
        left_crit, right_crit, F.col("cum_n"), F.col("sum_n")
    )

    gains = cum.select(
        FEATURE,
        FEATURE_VALUE,
        exprs.information_gain(parent_crit, child_crit).alias("information_gain"),
        parent_crit.alias("parent_criterion"),
    )
    # Reference F4 (tree.py:331); Spark math yields NULL rather than NaN in the
    # degenerate paths, so guard both.
    return gains.filter(
        F.col("information_gain").isNotNull() & ~F.isnan("information_gain")
    )


def find_best_split(
    df: DataFrame,
    feature_names: list[str],
    n_classes: int,
    criterion: Criterion,
    target_idx_col: str = TARGET_IDX,
) -> dict[str, Any] | None:
    """Globally best split, or None when no candidate has finite gain.

    Total-order tie-break: gain desc, feature position asc (matches the
    reference's stable concat-then-sort in feature-list order,
    tree.py:341-348), threshold asc.
    """
    gains = candidate_split_gains(df, feature_names, n_classes, criterion, target_idx_col)

    # Feature-list position for the tie-break, as a tiny literal map.
    position = F.create_map(
        *[x for i, name in enumerate(feature_names) for x in (F.lit(name), F.lit(i))]
    )[F.col(FEATURE)]

    best = (
        gains.orderBy(
            F.desc("information_gain"), position.asc(), F.asc(FEATURE_VALUE)
        )
        .limit(1)
        .collect()
    )
    if not best:
        return None
    row = best[0]
    return {
        "feature": row[FEATURE],
        "threshold": row[FEATURE_VALUE],
        "information_gain": row["information_gain"],
        "parent_criterion": row["parent_criterion"],
    }
