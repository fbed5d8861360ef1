"""As-of join — the time-series operator Spark's DataFrame API lacks.

For each left row, attach the payload of the LATEST right row with
``right_ts <= left_ts`` (backward as-of) sharing the join keys — the
point-in-time lookup behind feature stores, trade/quote alignment, and
"state as of this event" enrichment.

Spark-first formulation: NOT a range join (which explodes to a per-key
cartesian filtered by the time predicate — O(n·m) per key and a planner
blind spot), but the union + running ``last_value(ignorenulls)`` pattern:

    right rows tagged side=0, left rows side=1
      → unionByName                                    [no shuffle]
      → Window.partitionBy(keys).orderBy(ts, side)
        rowsBetween(unboundedPreceding, currentRow)    [ONE shuffle on keys]
      → keep side=1 rows; payload = last non-null      [projection]

One hash shuffle on the join keys, a per-key sort, and a running frame that
streams (WindowExec holds only the current frame's tail for a growing
frame).  Ties: a right row at exactly left_ts sorts BEFORE the left row
(side 0 < 1), so equal timestamps match — the same contract as DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``, which the oracle uses.

The payload travels as ONE struct column (non-NULL for every right row even
when individual fields are NULL), so ``last(struct, ignorenulls=True)``
returns all payload fields atomically from the single latest right row —
filling each column independently would stitch fields from different right
rows whenever the latest row holds a NULL field.  Right rows tied on
(keys, ts) are ordered by the payload struct itself as a deterministic
tie-break (largest struct wins).

At 100 TB scale this behaves like any keyed window: parallelism = #keys,
skewed keys are the hazard (mitigate upstream with AQE skew handling or key
salting plus a second pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + ``prefix``-named payload columns from the latest right row
    at-or-before each left row's timestamp (NULL when no prior right row).

    ``left`` and ``right`` may be arbitrary DataFrames sharing ``keys``;
    payload column names must not collide with left columns after prefixing.
    """
    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias(_PAYLOAD),
    )
    l_tagged = left.select(
        "*", F.col(left_ts).alias(_TS), F.lit(1).alias(_SIDE)
    )
    unioned = l_tagged.unionByName(r, allowMissingColumns=True)

    # _PAYLOAD as the trailing sort key: left rows carry NULL (sorts first,
    # harmless — _SIDE already separates them) and right rows tied on
    # (keys, ts) get a deterministic winner instead of partition-order luck.
    w = (
        Window.partitionBy(*keys)
        .orderBy(_TS, _SIDE, _PAYLOAD)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last(_PAYLOAD, ignorenulls=True).over(w).alias("__filled")
    )
    return (
        filled.filter(F.col(_SIDE) == 1)
        .select(
            *left.columns,
            *[F.col(f"__filled.{c}").alias(f"{prefix}{c}") for c in payload_cols],
        )
    )
