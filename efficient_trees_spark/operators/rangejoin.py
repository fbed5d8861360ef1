"""Bounded range join — windowed aggregation of one stream against another.

``windowed_agg_join`` answers "for each left row, aggregate the right rows of
the same key whose timestamp falls in the trailing window
``[left_ts - window, left_ts)``" — the sliding-feature lookup behind fraud
features ("clicks in the last 30 minutes"), rate limiting, and leakage-safe
training features.

Spark's planner executes a raw inequality join as a broadcast nested loop —
O(n·m) per key, unrunnable at scale.  The scale formulation here buckets both
sides into window-width bins and equi-joins on ``(keys, bin)``, with the
right side EXPLODED into the 2 bins it can influence (its own and the next);
a trailing window of width w at time t can only contain right rows from bins
``⌊t/w⌋`` and ``⌊t/w⌋ − 1``.  The exact predicate then filters inside the
equi-join's hash match, and a final groupBy restores one row per left row.

Cost: right side duplicated 2× map-side, one hash shuffle per side on
``(keys, bin)``, one aggregation — all AQE-skew-handleable equi operations;
the inequality never reaches the join planner.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"
_RID = "__range_left_id"


def windowed_agg_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    aggs: dict[str, Column],
    left_id_cols: list[str] | None = None,
) -> DataFrame:
    """Left rows + trailing-window aggregates of right rows.

    :param aggs: output-name → aggregate Column over the matched right rows;
        right columns must be referenced with an ``r_`` prefix (the join
        renames them to avoid collisions), e.g.
        ``{"n_clicks": F.count("r_ts"), "click_sum": F.sum("r_value")}``.
        Unmatched left rows aggregate over zero rows (count→0, sum→NULL —
        coalesce in the caller if 0 is wanted).
    :param left_id_cols: columns that uniquely identify a left row — used as
        the restore-group key after the join.  Pass these whenever a natural
        key exists: they survive stage retries and caller-side repartitions,
        whereas the ``monotonically_increasing_id`` fallback (for inputs with
        no unique key, where duplicate left rows must stay distinct rows) is
        only stable within a single uninterrupted plan execution.
    """
    window_us = int(window_seconds) * 1_000_000

    if left_id_cols:
        l = left.select(
            "*",
            (F.unix_micros(F.col(left_ts)) / window_us).cast("long").alias(_BIN),
        )
        group_cols = list(left_id_cols)
        first_cols = [c for c in left.columns if c not in group_cols]
    else:
        l = left.select(
            "*",
            F.monotonically_increasing_id().alias(_RID),
            (F.unix_micros(F.col(left_ts)) / window_us).cast("long").alias(_BIN),
        )
        group_cols = [_RID]
        first_cols = list(left.columns)
    r = right.select(
        *[F.col(k).alias(f"r_{k}") for k in keys],
        F.col(right_ts).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in keys and c != right_ts
        ],
    ).withColumn(
        _BIN,
        F.explode(
            F.array(
                (F.unix_micros(F.col("r_ts")) / window_us).cast("long"),
                (F.unix_micros(F.col("r_ts")) / window_us).cast("long") + 1,
            )
        ),
    )

    key_eq = [l[k] == r[f"r_{k}"] for k in keys]
    in_window = (r["r_ts"] >= l[left_ts] - F.expr(f"INTERVAL {window_seconds} SECOND")) & (
        r["r_ts"] < l[left_ts]
    )
    joined = l.join(r, [*key_eq, l[_BIN] == r[_BIN], in_window], "left")
    return (
        joined.groupBy(*group_cols)
        .agg(
            *[F.first(c).alias(c) for c in first_cols],
            *[expr.alias(name) for name, expr in aggs.items()],
        )
        .select(*left.columns, *aggs.keys())
    )
