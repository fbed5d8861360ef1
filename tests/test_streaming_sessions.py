"""Streaming sessionization parity: session_window + watermark must
reproduce the batch lag-gap sessionization once all sessions are closed.

The stream first drains the real events file; the final session of each user
is still open (watermark hasn't passed it), so a far-future sentinel event is
appended to the source directory — the watermark jumps, every real session
closes and emits.  This also exercises genuine late-data mechanics rather
than bypassing them with complete-mode state.
"""

from __future__ import annotations

import shutil

import pandas as pd

from efficient_trees_spark.streaming import sessions, windows
from efficient_trees_spark.workloads.timeseries import events_sessionization


def test_stream_sessionization_matches_batch(spark, sf_small, tmp_path):
    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy(f"{sf_small}/events.parquet", src / "events.parquet")

    stream = windows.read_events_stream(spark, str(src), glob="*.parquet")
    agg = sessions.sessionize_stream(stream)

    query = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_sessions")
        .start()
    )
    try:
        query.processAllAvailable()
        # Close the tail sessions: one sentinel event far in the future
        # (user -1, filtered below) advances the watermark past everything.
        ts_max = pd.read_parquet(f"{sf_small}/events.parquet")["ts"].max()
        # tz-naive datetime64[us] → parquet TIMESTAMP(MICROS,
        # isAdjustedToUTC=false), the exact type of the real events file, so
        # the NTZ streaming schema (windows.EVENTS_SCHEMA) reads both.
        sentinel = pd.DataFrame(
            {
                "event_id": [-1],
                "ts": [ts_max + pd.Timedelta(days=365)],
                "user_id": [-1],
                "event_type": ["sentinel"],
                "value": [0.0],
                "props": ["{}"],
            }
        )
        sentinel["ts"] = sentinel["ts"].astype("datetime64[us]")
        sentinel.to_parquet(src / "sentinel.parquet")
        query.processAllAvailable()
    finally:
        query.stop()

    stream_pdf = (
        spark.sql(
            """
            SELECT user_id,
                   count(*) AS n_sessions,
                   sum(n_events) AS n_events
            FROM stream_sessions
            WHERE user_id >= 0
            GROUP BY user_id
            """
        )
        .toPandas()
        .astype({"user_id": "int64", "n_sessions": "int64", "n_events": "int64"})
        .sort_values("user_id", ignore_index=True)
    )
    batch_pdf = (
        events_sessionization(spark, sf_small)
        .toPandas()
        .astype({"user_id": "int64", "n_sessions": "int64", "n_events": "int64"})
        .sort_values("user_id", ignore_index=True)
    )
    assert stream_pdf.equals(batch_pdf)
