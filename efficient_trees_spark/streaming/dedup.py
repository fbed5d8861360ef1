"""Streaming deduplication — the event-time twin of batch ``distinct()``.

An ingest stream redelivers records (at-least-once sources, replayed files,
duplicated producers); the batch answer — ``distinct()`` over the whole
table — has no streaming analogue because "the whole table" never arrives.
``dropDuplicatesWithinWatermark`` is the bounded-state formulation: a key is
remembered only until the watermark passes its event time + the allowed
lateness, so state is O(keys per watermark window) instead of O(all keys
ever) — the property that keeps an always-on ingest pipeline at a fixed
memory footprint while still suppressing every duplicate whose copies
arrive within the lateness bound (the real-world redelivery case: retries
and replays are seconds-to-minutes apart, not days).

Parity contract (tested): for a finite replayed source whose duplicates all
fall inside the watermark window, the deduped stream equals batch
``distinct()`` over the same files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate ``keys`` rows from a streaming frame, keeping the
    first arrival; duplicates are suppressed as long as they arrive within
    ``watermark`` of the retained row's event time."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
