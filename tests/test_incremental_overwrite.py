"""Incremental partition reprocessing: dynamic partition overwrite must
replace ONLY the partitions present in the written frame — the daily
backfill pattern for a 100 TB date-partitioned table (static overwrite mode
would truncate the whole table; plain append would duplicate the day).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from efficient_trees_spark.workloads.base import load


def test_dynamic_partition_overwrite_replaces_only_written_day(spark, sf_small, tmp_path):
    out = str(tmp_path / "events_by_day")
    ev = load(spark, sf_small, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.partitionBy("day").parquet(out)

    days = [r["day"] for r in spark.read.parquet(out).select("day").distinct().collect()]
    assert len(days) > 1
    target_day = sorted(days)[0]
    before = spark.read.parquet(out)
    before_other = before.filter(F.col("day") != target_day).count()
    before_target = before.filter(F.col("day") == target_day).count()

    # backfill: reprocess one day (here: halve it) and overwrite in place
    corrected = ev.filter(
        (F.col("day") == target_day) & (F.col("event_id") % 2 == 0)
    )
    corrected_n = corrected.count()
    assert 0 < corrected_n < before_target

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        corrected.write.mode("overwrite").partitionBy("day").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    after = spark.read.parquet(out)
    # the target day was replaced...
    assert after.filter(F.col("day") == target_day).count() == corrected_n
    # ...and every other partition is byte-for-byte untouched
    assert after.filter(F.col("day") != target_day).count() == before_other
    assert after.count() == before_other + corrected_n
