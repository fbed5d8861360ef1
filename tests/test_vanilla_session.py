"""Environment-proofing: the correctness driver builds its own BARE
SparkSession (no repo confs), so conf-dependent behavior must work on a
default-config session.  Round 2 was burned exactly here: the events
timestamp path relied on a session conf (nanosAsLong) that Spark 4.1
silently ignores — these tests make the next environment shift surface in
pytest instead of in the driver gate.

The shared session fixture (conftest) is close to vanilla already, but this
module pins the specific invariants ``load()`` must guarantee REGARDLESS of
how the session was built: events.ts arrives as an epoch-arithmetic-capable
timestamp and the session timezone is UTC afterward.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from efficient_trees_spark.workloads.base import load
from efficient_trees_spark.workloads.timeseries import events_sessionization


def test_load_normalizes_events_ts(spark, sf_small):
    ev = load(spark, sf_small, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # load() must pin UTC so NTZ wall-clock == UTC instant
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # epoch arithmetic works (this exact cast crashed the round-2 driver)
    row = ev.select(
        F.col("ts").cast("long").alias("sec"),
        F.unix_micros("ts").alias("us"),
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
    ).orderBy("sec").first()
    assert row.sec * 1_000_000 <= row.us < (row.sec + 1) * 1_000_000
    assert row.d.startswith("2024")


def test_events_query_runs_on_fresh_default_session(spark, sf_small, tmp_path):
    """An events workload end-to-end on a session with NO repo tuning confs
    beyond what load() itself sets at runtime."""
    # newSession() shares the JVM but gets fresh (default) SQL conf state —
    # the closest replica of the driver's own session without paying a
    # second JVM startup.
    fresh = spark.newSession()
    assert fresh.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "false"
    out = events_sessionization(fresh, sf_small)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.n_sessions >= 1 and r.n_events >= r.n_sessions for r in rows)


def test_session_defaults_carry_perf_confs(spark):
    """Regression gate for the round-6 session levers: the generated-class
    cache must stay raised (the 100-entry Spark default re-pays full
    Janino+C1 compilation of every per-level tree-fit plan in any
    multi-query session — measured 2x on the wide fit), and the tuned
    driver memory must hold.  Static confs, so they only bind at session
    build — this asserts the repo's own get_spark applied them."""
    assert int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 1000
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
