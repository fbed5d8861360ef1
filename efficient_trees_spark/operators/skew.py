"""Skew mitigation: salted aggregation and salted joins for hot keys.

Skewed keys are the classic large-cluster failure mode: one reducer gets the
whale key's rows while 999 executors idle.  Spark's AQE already splits
skewed SORT-MERGE JOIN partitions at runtime (`skewJoin.enabled`, on in
`session.py`), so reach for THESE operators when AQE can't help:

* **Aggregations** — AQE never splits a hash-aggregate group: a single hot
  group key still lands on one task.  :func:`salted_aggregate` runs the
  standard two-phase rewrite: group by (keys, salt) first (the hot group
  fans out over ``n_salts`` reducers), then re-aggregate the per-salt
  partials by the real keys (a tiny second shuffle — at most
  ``n_salts`` rows per group survive phase 1).  Only works for algebraic
  aggregates whose partials compose (sum/count/min/max, avg via
  sum+count) — exactly the ones declared here.
* **Joins where the build side is too big to broadcast and AQE's split
  heuristics don't trigger** (e.g. one key is 100x the split threshold, or
  the join is streaming).  :func:`salted_join` replicates the small side's
  HOT rows ``n_salts`` times (a bounded explode: |hot keys| x n_salts
  extra rows) and fans the big side's hot rows out over matching salt
  values; cold keys keep salt 0 and pay nothing.

Salts are DETERMINISTIC — ``xxhash64`` of the row's non-key columns (or
caller-chosen columns), never ``rand()`` — so results are reproducible and
retried tasks don't double-count.  The salt column never escapes: both
operators return relations with the original schema.

At 100 TB: phase-1 output is bounded by groups x n_salts regardless of row
count; the hot-key list is driver-held and broadcast, so nothing data-sized
converges on one place.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# Algebraic aggregates whose per-salt partials recompose exactly.
_PHASE1 = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_PHASE2 = {
    "sum": F.sum,
    "count": F.sum,  # counts add up
    "min": F.min,
    "max": F.max,
}


def _salt_expr(df: DataFrame, keys: Sequence[str], n_salts: int, salt_cols) -> Column:
    cols = list(salt_cols) if salt_cols else [c for c in df.columns if c not in keys]
    if not cols:  # key-only relation: fall back to partition id
        return F.pmod(F.spark_partition_id(), F.lit(n_salts)).cast("int")
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe ``groupBy(keys).agg(...)``.

    ``aggs`` maps output column name -> (function, input column) with
    function in {'sum', 'count', 'min', 'max', 'avg'}.  Results are exactly
    ``df.groupBy(keys).agg(...)`` — integer sums/counts are bit-identical,
    float sums differ only by addition order (same caveat any parallel
    aggregation has).

    Phase 1 groups by (keys, salt): a hot key's rows spread over
    ``n_salts`` reducers instead of one.  Phase 2 re-aggregates the
    ≤ n_salts partial rows per group by the real keys.  avg decomposes to
    sum+count partials and divides in phase 2 (never an average of
    averages).
    """
    for name, (fn, _col) in aggs.items():
        if fn not in ("sum", "count", "min", "max", "avg"):
            raise ValueError(f"unsupported salted aggregate: {fn!r} (column {name})")

    keys = list(keys)
    salted = df.withColumn(_SALT, _salt_expr(df, keys, n_salts, salt_cols))

    phase1, phase2, post = [], [], []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            phase1 += [
                F.sum(col).alias(f"__{name}_sum"),
                F.count(col).alias(f"__{name}_cnt"),
            ]
            phase2 += [
                F.sum(f"__{name}_sum").alias(f"__{name}_sum"),
                F.sum(f"__{name}_cnt").alias(f"__{name}_cnt"),
            ]
            post.append(
                (F.col(f"__{name}_sum") / F.col(f"__{name}_cnt")).alias(name)
            )
        else:
            phase1.append(_PHASE1[fn](col).alias(name))
            phase2.append(_PHASE2[fn](name).alias(name))
            post.append(F.col(name))

    partials = salted.groupBy(*keys, _SALT).agg(*phase1)
    return partials.groupBy(*keys).agg(*phase2).select(*keys, *post)


def hot_keys(
    df: DataFrame, keys: Sequence[str], min_count: int, max_keys: int = 10_000
) -> list[tuple]:
    """Key tuples whose row count reaches ``min_count`` — the whales worth
    salting.  The count itself is skew-safe (two-phase via
    :func:`salted_aggregate`); the result is driver-held and bounded by
    ``max_keys`` (take the heaviest)."""
    keys = list(keys)
    counts = salted_aggregate(df, keys, {"__n": ("count", keys[0])})
    rows = (
        counts.filter(F.col("__n") >= min_count)
        .orderBy(F.desc("__n"), *keys)
        .limit(max_keys)
        .collect()
    )
    return [tuple(row[k] for k in keys) for row in rows]


def salted_join(
    large: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    hot: list[tuple],
    n_salts: int = 16,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: ``large.join(small, keys, how)`` with the hot
    keys' probe rows fanned out over ``n_salts`` reducers.

    The small side's hot rows are replicated once per salt (bounded:
    |hot| x n_salts extra rows); its cold rows and ALL of the large side
    keep one copy.  Supports 'inner' and 'left' (the shapes where the
    probe side's fan-out is safe: each large row still matches exactly the
    same small rows, just in a salted bucket).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = list(keys)
    if not hot:
        return large.join(small, keys, how)

    spark = large.sparkSession
    hot_df = spark.createDataFrame(
        [tuple(k) for k in hot], large.select(*keys).schema
    ).withColumn("__is_hot", F.lit(True))
    hot_b = F.broadcast(hot_df)

    l = large.join(hot_b, keys, "left").withColumn(
        _SALT,
        F.when(
            F.col("__is_hot"), _salt_expr(large, keys, n_salts, salt_cols)
        ).otherwise(F.lit(0)),
    ).drop("__is_hot")

    salts = spark.range(n_salts).select(F.col("id").cast("int").alias(_SALT))
    s_hot = (
        small.join(hot_b, keys, "inner").drop("__is_hot").crossJoin(F.broadcast(salts))
    )
    s_cold = (
        small.join(hot_b, keys, "left")
        .filter(F.col("__is_hot").isNull())
        .drop("__is_hot")
        .withColumn(_SALT, F.lit(0))
    )
    s = s_hot.unionByName(s_cold)

    return l.join(s, keys + [_SALT], how).drop(_SALT)
