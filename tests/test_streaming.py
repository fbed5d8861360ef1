"""Structured Streaming: the windowed aggregation must match its batch twin."""

from efficient_trees_spark.streaming import windows
from efficient_trees_spark.workloads.timeseries import events_tumbling_window


def test_stream_matches_batch(spark, sf_small):
    stream = windows.read_events_stream(spark, sf_small)
    assert stream.isStreaming
    agg = windows.tumbling_window_counts(stream)
    windows.run_stream_to_memory(agg, "stream_windows")

    stream_pdf = (
        spark.sql("SELECT * FROM stream_windows")
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    batch_pdf = (
        events_tumbling_window(spark, sf_small)
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    assert stream_pdf.equals(batch_pdf)
