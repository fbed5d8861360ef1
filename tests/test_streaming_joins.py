"""Stream-stream interval join: streaming result must match the batch twin,
and both must match a DuckDB re-derivation."""

import duckdb

from pyspark.sql import functions as F

from efficient_trees_spark.streaming import joins, windows
from efficient_trees_spark.workloads.base import load

HORIZON_MIN = 180


def _run_append_to_memory(sdf, name):
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _sorted_pairs(pdf):
    return sorted(
        (int(r.l_event_id), int(r.r_event_id)) for r in pdf.itertuples()
    )


def test_stream_interval_join_matches_batch_and_sql(spark, sf_small):
    stream = windows.read_events_stream(spark, sf_small)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    joined = joins.interval_join_stream(
        clicks, purchases, horizon_minutes=HORIZON_MIN
    )
    assert joined.isStreaming
    _run_append_to_memory(joined, "stream_ij")
    stream_pairs = _sorted_pairs(
        spark.sql("SELECT * FROM stream_ij").toPandas()
    )

    batch_events = load(spark, sf_small, "events")
    batch = joins.interval_join_batch(
        batch_events.filter(F.col("event_type") == "click"),
        batch_events.filter(F.col("event_type") == "purchase"),
        horizon_minutes=HORIZON_MIN,
    )
    batch_pairs = _sorted_pairs(batch.toPandas())

    sql_pairs = sorted(
        (int(a), int(b))
        for a, b in duckdb.sql(
            f"""
            WITH ev AS (SELECT * FROM '{sf_small}/events.parquet'),
            l AS (SELECT * FROM ev WHERE event_type = 'click'),
            r AS (SELECT * FROM ev WHERE event_type = 'purchase')
            SELECT l.event_id, r.event_id
            FROM l JOIN r ON l.user_id = r.user_id
              AND r.ts > l.ts
              AND r.ts <= l.ts + INTERVAL {HORIZON_MIN} MINUTES
            """
        ).fetchall()
    )

    assert len(stream_pairs) > 0, "fixture horizon produced no pairs"
    assert stream_pairs == batch_pairs == sql_pairs


def test_stream_interval_join_state_is_watermark_bounded(spark, sf_small):
    """The physical plan must carry event-time watermarks on both sides —
    the property that lets the state store evict (bounded memory on
    unbounded streams)."""
    stream = windows.read_events_stream(spark, sf_small)
    joined = joins.interval_join_stream(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
    )
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
