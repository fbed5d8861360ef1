"""Parity: the applyInPandasWithState capped-session operator must reproduce
the batch twin (events_capped_sessions) once every session has closed.

Closure happens two ways, both exercised here: mid-stream sessions close on
gap/cap as data flows; each user's FINAL session closes via event-time
TIMEOUT when a far-future sentinel event advances the watermark — the
sentinel belongs to a different user, so only the timeout path (not a data
row) can flush the other users' state.
"""

from __future__ import annotations

import shutil

import pandas as pd

from efficient_trees_spark.streaming import stateful, windows
from efficient_trees_spark.workloads.timeseries import events_capped_sessions


def test_stream_capped_sessions_match_batch(spark, sf_small, tmp_path):
    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy(f"{sf_small}/events.parquet", src / "events.parquet")

    stream = windows.read_events_stream(spark, str(src), glob="*.parquet")
    agg = stateful.capped_sessions_stream(stream)

    query = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("capped_sessions")
        .start()
    )
    try:
        query.processAllAvailable()
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
            "SELECT user_id, session_start, session_end, n_events "
            "FROM capped_sessions WHERE user_id >= 0"
        )
        .toPandas()
        .astype("int64")
        .sort_values(["user_id", "session_start", "session_end"], ignore_index=True)
    )
    batch_pdf = (
        events_capped_sessions(spark, sf_small)
        .toPandas()
        .astype("int64")
        .sort_values(["user_id", "session_start", "session_end"], ignore_index=True)
    )
    assert len(batch_pdf) > 0
    assert stream_pdf.equals(batch_pdf)
