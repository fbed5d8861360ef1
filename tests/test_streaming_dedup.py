"""Streaming dedup parity: a source that redelivers every event (the same
parquet file appears twice in the stream directory) must come out of
``dropDuplicatesWithinWatermark`` equal to batch ``distinct()`` over one
copy."""

from __future__ import annotations

import shutil

from efficient_trees_spark.streaming import dedup as sdedup
from efficient_trees_spark.streaming import windows
from efficient_trees_spark.workloads.base import load


def test_stream_dedup_matches_batch_distinct(spark, sf_small, tmp_path):
    src = tmp_path / "events_dup_stream"
    src.mkdir()
    # two copies of the same file = every event delivered twice
    shutil.copy(f"{sf_small}/events.parquet", src / "events_a.parquet")
    shutil.copy(f"{sf_small}/events.parquet", src / "events_b.parquet")

    stream = windows.read_events_stream(spark, str(src), glob="*.parquet")
    deduped = sdedup.dedup_stream(stream, ["event_id"], watermark="10 minutes")

    query = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup")
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()

    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM stream_dedup"
    ).first()
    batch = load(spark, sf_small, "events").count()
    # every event exactly once: no duplicates survived, nothing was lost
    assert got.n == got.d == batch
