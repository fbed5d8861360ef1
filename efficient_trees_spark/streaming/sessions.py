"""Streaming sessionization — the event-time twin of the batch
``events_sessionization`` workload (workloads/timeseries.py).

The batch form assigns sessions with a lag-gap window: a NEW session starts
when ``ts - prev_ts > 1800`` seconds (timestamps compared after cast to whole
seconds).  The streaming form uses Spark's native ``session_window`` state
operator, whose merge is INCLUSIVE — an event starting exactly at
current_end = last_ts + gap still joins the session (verified empirically:
two events exactly 1801s apart merged under gap=1801s).  On whole-second
timestamps:

    merge  iff  diff <= gap_seconds

so ``gap_seconds = 1800`` reproduces the batch rule ``diff <= 1800`` exactly,
and the stream aggregation is bit-parity with the batch one once all
sessions have been closed by the watermark.

Finite-input caveat (and the honest way tests handle it): in append mode a
session emits only when the watermark passes session_end; the final session
of each user therefore stays in state until LATER data advances the
watermark.  The parity test appends a far-future sentinel event to the
source directory to close them — exactly how a drained Kafka topic behaves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAP_SECONDS = 1800  # inclusive merge: same session iff gap <= 1800s


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = GAP_SECONDS,
    watermark: str = "1 second",
) -> DataFrame:
    """Per-(user, session) aggregates over a streaming events frame.

    Input: streaming frame with ``user_id`` and timestamp ``ts`` (see
    ``windows.read_events_stream``).  Output (append mode, rows emitted as
    the watermark closes each session): user_id, session_start, session_end,
    n_events.
    """
    # Whole-second precision to match the batch workload's long-cast compare.
    ts_sec = F.timestamp_seconds(F.col("ts").cast("long"))
    return (
        events.withColumn("ts", ts_sec)
        .withWatermark("ts", watermark)
        .groupBy(
            F.session_window(F.col("ts"), f"{gap_seconds} seconds").alias("s"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )
