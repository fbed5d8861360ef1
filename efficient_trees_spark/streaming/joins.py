"""Stream-stream interval join with watermark-bounded state.

The attribution join every event pipeline needs (click → conversion within
a horizon), expressed as Spark's native stream-stream inner join: both
sides carry an event-time watermark and the join condition bounds the
right side's time to a window after the left's, so Spark can (a) buffer
only the in-horizon slice of each side in the state store and (b) evict
state as the watermarks advance — bounded memory on unbounded streams.

Scale shape: the join shuffles both streams on the key exactly once; state
per key is O(events within the horizon), independent of stream length.
This is the streaming twin of the batch bin-bucketed range join
(``operators/rangejoin.py``) — same pairing semantics, and parity between
the two is asserted in ``tests/test_streaming_joins.py``.

The reference has no streaming at all (SURVEY.md §2.10: its
``streaming=True`` is bounded-memory batch); this module is extension
surface, like the rest of ``streaming/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    horizon_minutes: int = 5,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Pairs of (left event, right event) with the same ``key`` where the
    right event lands in ``(left.ts, left.ts + horizon]``.

    Required input schema (both sides): ``key``, an event-time ``ts``, and
    an ``event_id`` payload column — the same contract as the batch twin.
    The strict lower bound keeps self-join pairs (same stream on both
    sides) irreflexive; the inclusive upper bound matches the batch twin
    in the parity test.
    """
    lhs = left.withWatermark("ts", watermark_delay).select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    rhs = right.withWatermark("ts", watermark_delay).select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    horizon = F.expr(f"INTERVAL {int(horizon_minutes)} MINUTES")
    return lhs.join(
        rhs,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + horizon),
        "inner",
    ).select(
        F.col("l_key").alias(key),
        "l_event_id",
        "r_event_id",
        "l_ts",
        "r_ts",
    )


def interval_join_batch(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    horizon_minutes: int = 5,
    max_pairs_per_key: int | None = 5_000_000,
) -> DataFrame:
    """Batch twin of :func:`interval_join_stream` — identical pairing
    semantics over bounded inputs, for parity testing and backfills.

    A plain range-condition join CARTESIANS within each key group — this
    form exists as the parity gate (the semantics stated without an
    intermediary), not the scale path; at corpus scale use the
    bin-bucketed :func:`~efficient_trees_spark.operators.rangejoin.\
range_join`, which bounds comparisons to adjacent time buckets.  To keep
    that footgun loud rather than latent, the default runs an EAGER guard
    before building the join: per-key counts on both sides (two keys-sized
    aggregations, one small driver job) and a ``ValueError`` if any single
    key's left x right pair count exceeds ``max_pairs_per_key``.  Pass
    ``None`` to skip the guard (and its job) when the inputs are known
    small — e.g. inside tight parity loops."""
    if max_pairs_per_key is not None:
        lc = left.groupBy(F.col(key).alias("__k")).agg(
            F.count(F.lit(1)).alias("__lc")
        )
        rc = right.groupBy(F.col(key).alias("__k")).agg(
            F.count(F.lit(1)).alias("__rc")
        )
        worst = (
            lc.join(rc, "__k")
            .select((F.col("__lc") * F.col("__rc")).alias("__pairs"))
            .agg(F.max("__pairs").alias("__max"))
            .first()["__max"]
        )
        if worst is not None and worst > max_pairs_per_key:
            raise ValueError(
                f"interval_join_batch: a single {key!r} group would compare "
                f"{worst:,} left x right pairs (> max_pairs_per_key="
                f"{max_pairs_per_key:,}).  This form cartesians within each "
                "key group and is meant for parity gates and small "
                "backfills — use operators.rangejoin.range_join (bin-"
                "bucketed, bounded fan-out) at this scale, or raise/disable "
                "the guard explicitly."
            )
    lhs = left.select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    rhs = right.select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    horizon = F.expr(f"INTERVAL {int(horizon_minutes)} MINUTES")
    return lhs.join(
        rhs,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + horizon),
        "inner",
    ).select(
        F.col("l_key").alias(key),
        "l_event_id",
        "r_event_id",
        "l_ts",
        "r_ts",
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-STATIC enrichment join — the workhorse streaming op: attach
    dimension attributes (user segment, document metadata, experiment arm)
    to an event stream before windowing or routing.

    The static side is joined per micro-batch and BROADCAST (dimension
    tables are small by contract), so the stream side never shuffles for
    the join and no streaming state is created — unlike stream-stream
    joins, no watermark is needed because the static side cannot be late.
    Left join by default: an event with no dimension row survives with
    NULL attributes rather than silently dropping (inner is opt-in).
    Composes with downstream watermarked aggregations — the enriched
    columns are ordinary columns to the window operator
    (parity-tested stream == batch in ``tests/test_streaming_joins.py``).

    At 100 TB-stream scale: a dimension too large to broadcast should be
    pre-bucketed storage joined via ``how`` with the broadcast hint dropped
    — but at that point the right design is usually enrichment BEFORE the
    stream (upstream producer) or a state-store lookup, not a per-batch
    shuffle."""
    return events.join(F.broadcast(dim), key, how)
