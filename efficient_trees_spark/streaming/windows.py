"""Structured Streaming over the events table.

The reference's ``streaming=True`` is bounded-memory BATCH execution
(SURVEY.md §2.10) — covered natively by Spark partitioning.  This module is
the genuine event-time extension: the same windowed aggregation that runs in
batch (``workloads/timeseries.py``) expressed as a streaming query with a
watermark, so late events are handled and state is bounded.  Batch/stream
parity is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# Explicit schema: streaming readers cannot infer. events.ts is parquet
# TIMESTAMP(NANOS), which Spark 4.1 reads as timestamp_ntz (micros, truncated
# like the batch reader — see workloads/base.py load()).
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """File-source stream over the events parquet (one file = one microbatch
    in tests; a real deployment points the same code at a Kafka source).

    :param glob: file filter — the default pins to the events table so the
        source can point at a testdata directory full of other tables; pass
        ``"*.parquet"`` for a dedicated drop-directory where late files
        (e.g. the parity test's watermark-advancing sentinel) must be picked
        up too.
    """
    # Same normalization as batch load(): UTC session + NTZ→timestamp cast so
    # watermarks, windows, and epoch arithmetic see the UTC instant.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", glob)
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_window_counts(
    events: DataFrame, window: str = "6 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of the
    ``events_tumbling_window`` batch workload (same output schema)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_stream_to_memory(sdf: DataFrame, query_name: str) -> None:
    """Drive a streaming frame to completion against the in-memory sink
    (synchronous; test/demo harness).  Results land in table ``query_name``.

    outputMode=complete because the aggregation should emit every window —
    the memory sink holds the final table like a batch result."""
    query = (
        sdf.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
