"""Custom stateful streaming operator via ``applyInPandasWithState``.

``session_window`` covers plain gap sessionization (sessions.py); this module
implements a session rule the built-in operator CANNOT express: a session
closes on a 30-minute silence gap OR when it reaches ``max_events`` events,
whichever comes first.  Event-count caps are the standard guard against
bot/firehose users whose "session" would otherwise grow without bound — at
100 TB that unbounded state is an OOM, so the cap is a scale feature, not a
toy.

Pattern demonstrated (the build brief's ``applyInPandasWithState`` surface):

* state per group key (user): the open session's (start_sec, last_sec, n);
* Arrow-batched user events walked in event-time order, closed sessions
  emitted incrementally (append mode);
* **event-time timeout** closes the final session of quiet users when the
  watermark passes session_end + gap — the streaming-native way to flush
  tail state, exercised in tests by a watermark-advancing sentinel event.

The same semantics in batch form (for the DuckDB oracle and parity tests):
gap-sessionize with lag/cumsum, then sub-split every gap-session by
``floor(row_number / max_events)`` — counting is order-insensitive within a
session, so (start, end, n) match the stream exactly.

``transformWithStateInPandas`` migration (evaluated, blocked by the
environment): Spark 4's arbitrary-state API fits these semantics cleanly —
a ``StatefulProcessor`` with one ``ValueState`` for the open session's
(start, last, n) and a registered event-time timer replacing
``setTimeoutTimestamp``; per-key Arrow batching is the same shape.  In
THIS container the migration cannot run: the TWS Python worker speaks
protobuf to the JVM state server
(``pyspark/sql/streaming/stateful_processor_api_client.py`` imports
``google.protobuf``), and protobuf is not installed (probe:
``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE`` → ``ImportError:
cannot import name 'descriptor' from 'google.protobuf'``; the RocksDB
state-store provider itself initializes fine).  On a cluster with
protobuf available the sketch above is the drop-in upgrade — it removes
the GroupState timeout dance (real timers), supports state TTL, and
queues multiple state variables per key.  Re-checked round 10 and again
round 11: ``import google.protobuf`` still fails (``No module named
'google'``) — the migration stays environment-blocked.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

GAP_SECONDS = 1800
MAX_EVENTS = 50

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),  # whole seconds
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("start_sec", LongType()),
        StructField("last_sec", LongType()),
        StructField("n", LongType()),
    ]
)


def capped_sessions_stream(
    events: DataFrame,
    gap_seconds: int = GAP_SECONDS,
    max_events: int = MAX_EVENTS,
    watermark: str = "1 second",
) -> DataFrame:
    """Per-user capped sessions over a streaming frame with ``user_id`` and
    timestamp ``ts``.  Emits (user_id, session_start, session_end, n_events)
    in append mode as sessions close — by gap, by cap, or by event-time
    timeout once the watermark passes the open session's horizon."""

    def walk(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        user_id = key[0]
        cols = ["user_id", "session_start", "session_end", "n_events"]

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([(user_id, start, last, n)], columns=cols)
            return

        secs: list[int] = []
        for pdf in pdfs:
            secs.extend(int(s) for s in pdf["sec"])
        secs.sort()

        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[Any, int, int, int]] = []
        for s in secs:
            if start is None:
                start, last, n = s, s, 1
            elif s - last > gap_seconds or n >= max_events:
                closed.append((user_id, start, last, n))
                start, last, n = s, s, 1
            else:
                last, n = s, n + 1

        state.update((start, last, n))
        # Flush the open session when the event-time watermark passes its
        # gap horizon; the timestamp must exceed the current watermark.
        horizon_ms = (last + gap_seconds) * 1000
        state.setTimeoutTimestamp(max(horizon_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    prepared = events.select(
        F.col("user_id"),
        F.timestamp_seconds(F.col("ts").cast("long")).alias("ts"),
        F.col("ts").cast("long").alias("sec"),
    ).withWatermark("ts", watermark)
    return prepared.groupBy("user_id").applyInPandasWithState(
        walk,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
