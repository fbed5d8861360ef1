"""Event-stream analytics on the ``events`` table.

The reference's ``streaming=True`` is out-of-core batch, not event-time
streaming (SURVEY.md §2.10) — Spark's partitioned execution covers that for
free.  These workloads are the *extension* surface a training-data pipeline
needs over an event log: tumbling-window aggregation, sessionization, JSON
prop extraction.  Their batch forms are oracle-checked here; the same
window aggregation also runs under Structured Streaming in
``efficient_trees_spark/streaming/windows.py`` (tested in tests/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from efficient_trees_spark.workloads.base import load, workload


@workload(
    "events_tumbling_window",
    oracle="""
        SELECT strftime(time_bucket(INTERVAL 6 hours, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    description="Tumbling 6h window aggregation (F.window batch form; same plan "
    "runs under Structured Streaming with a watermark)",
    tags=("timeseries", "bench"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
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


@workload(
    "events_sessionization",
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 30 minutes
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM gaps
        )
        SELECT user_id,
               count(DISTINCT session_id) AS n_sessions,
               count(*) AS n_events
        FROM sessions GROUP BY user_id
    """,
    description="Sessionization: lag-gap > 30min marks a session boundary, "
    "prefix-sum assigns ids — windows partition by user so parallelism = users",
    tags=("timeseries",),
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gaps = ev.withColumn("prev_ts", F.lag("ts").over(w_order)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts").cast("long") - F.col("prev_ts").cast("long") > 1800),
            1,
        ).otherwise(0),
    )
    sessions = gaps.withColumn("session_id", F.sum("new_session").over(w_cum))
    return sessions.groupBy("user_id").agg(
        F.count_distinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@workload(
    "events_session_window",
    oracle="""
        WITH e AS (
            -- floor, not cast: DuckDB double->int casts round-half-even,
            -- Spark's timestamp cast("long") floors
            SELECT user_id, floor(epoch(ts))::BIGINT AS sec FROM events
        ),
        gaps AS (
            SELECT user_id, sec,
                   CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec) > 1800
                        OR lag(sec) OVER (PARTITION BY user_id ORDER BY sec) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM e
        ),
        s AS (
            SELECT user_id, sec,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY sec
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM gaps
        )
        SELECT user_id,
               strftime(to_timestamp(min(sec)), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(to_timestamp(max(sec) + 1800), '%Y-%m-%d %H:%M:%S') AS session_end,
               count(*) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    description="Native session_window operator (batch form; identical "
    "aggregation runs under Structured Streaming with a watermark in "
    "streaming/sessions.py): 30min-gap sessions per user with start/end/size. "
    "session_window merges inclusively (event at exactly session_end joins "
    "it), so gap=1800s over whole-second timestamps equals the lag rule",
    tags=("timeseries",),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.timestamp_seconds(F.col("ts").cast("long")).alias("ts")
    )
    return (
        ev.groupBy(F.session_window("ts", "1800 seconds").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("s.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("s.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


@workload(
    "events_json_extract",
    oracle="""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
                   / count(json_extract_string(props, '$.k')) AS avg_k
        FROM events GROUP BY event_type
    """,
    description="JSON prop extraction (get_json_object) + aggregation",
    tags=("timeseries",),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # props.k is integral in the data: exact bigint sum / count gives the
    # same double in any summation order (a double mean would be ULP-unstable)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        (F.sum(k).cast("double") / F.count(k)).alias("avg_k")
    )


@workload(
    "events_capped_sessions",
    oracle="""
        WITH e AS (
            SELECT user_id, floor(epoch(ts))::BIGINT AS sec FROM events
        ),
        gaps AS (
            SELECT user_id, sec,
                   CASE WHEN sec - lag(sec) OVER w > 1800
                        OR lag(sec) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY sec)
        ),
        s AS (
            SELECT user_id, sec,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY sec
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
            FROM gaps
        ),
        capped AS (
            SELECT user_id, sec, gid,
                   (row_number() OVER (PARTITION BY user_id, gid ORDER BY sec) - 1) // 50 AS sub
            FROM s
        )
        SELECT user_id,
               min(sec) AS session_start,
               max(sec) AS session_end,
               count(*) AS n_events
        FROM capped GROUP BY user_id, gid, sub
    """,
    description="Capped sessionization (batch twin of the "
    "applyInPandasWithState stream operator, streaming/stateful.py): a "
    "session closes on a >30min gap OR at 50 events — the cap bounds "
    "per-user state, which session_window cannot express.  Gap-session via "
    "lag/cumsum, then sub-split by floor(row_number/50); (start, end, n) "
    "are order-insensitive within a session so both forms agree exactly",
    tags=("timeseries",),
)
def events_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from efficient_trees_spark.streaming.stateful import GAP_SECONDS, MAX_EVENTS

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("long").alias("sec")
    )
    w_order = Window.partitionBy("user_id").orderBy("sec")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gaps = ev.withColumn("prev_sec", F.lag("sec").over(w_order)).withColumn(
        "new_session",
        F.when(
            F.col("prev_sec").isNull()
            | (F.col("sec") - F.col("prev_sec") > GAP_SECONDS),
            1,
        ).otherwise(0),
    )
    sessions = gaps.withColumn("gid", F.sum("new_session").over(w_cum))
    w_sub = Window.partitionBy("user_id", "gid").orderBy("sec")
    capped = sessions.withColumn(
        "sub", F.floor((F.row_number().over(w_sub) - 1) / MAX_EVENTS)
    )
    return capped.groupBy("user_id", "gid", "sub").agg(
        F.min("sec").alias("session_start"),
        F.max("sec").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("gid", "sub")


@workload(
    "events_asof_join",
    oracle="""
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S.%g') AS ts,
               p.value AS purchase_value,
               c.value AS asof_value,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S.%g') AS asof_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    description="Backward as-of join: each purchase enriched with the user's "
    "latest click at-or-before it (point-in-time lookup). Implemented as "
    "union + running last_value over a per-user window — ONE shuffle on the "
    "key, no range join — and checked against DuckDB's native ASOF JOIN",
    tags=("timeseries", "inventory"),
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from efficient_trees_spark.operators.asof import asof_join_backward

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join_backward(
        purchases, clicks, keys=["user_id"], left_ts="ts", right_ts="ts",
        payload_cols=["value", "ts"],
    )
    # Timestamps formatted to strings (millisecond data) so both engines hash
    # identical representations.
    return out.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
        "purchase_value",
        "asof_value",
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("asof_ts"),
    )


@workload(
    "events_range_join_features",
    oracle="""
        SELECT p.event_id, p.user_id,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S.%g') AS ts,
               count(c.ts) AS n_clicks_30m,
               CAST(coalesce(sum(CAST(c.value AS DECIMAL(18,4))), 0) AS DOUBLE)
                   AS click_sum_30m
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts >= p.ts - INTERVAL 30 MINUTE
         AND c.ts < p.ts
        GROUP BY p.event_id, p.user_id, p.ts
    """,
    description="Trailing-window range join: per purchase, count/sum of the "
    "user's clicks in the preceding 30 minutes. Both sides bucketed into "
    "window-width bins and equi-joined on (user, bin) with the right side "
    "exploded into its 2 reachable bins — the inequality never reaches the "
    "join planner, so no O(n*m) nested loop at scale",
    tags=("timeseries", "inventory"),
)
def events_range_join_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from efficient_trees_spark.operators.rangejoin import windowed_agg_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = windowed_agg_join(
        purchases, clicks, keys=["user_id"], left_ts="ts", right_ts="ts",
        window_seconds=1800,
        aggs={
            # count on the join timestamp — a matched click with NULL value
            # still counts, same as the oracle's count(c.ts)
            "n_clicks_30m": F.count("r_ts"),
            # decimal-exact sum (value is 2-dp data): order-independent, so
            # both engines produce the same double bit pattern
            "click_sum_30m": F.coalesce(
                F.sum(F.col("r_value").cast("decimal(18,4)")), F.lit(0)
            ).cast("double"),
        },
        left_id_cols=["event_id"],
    )
    return out.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
        "n_clicks_30m", "click_sum_30m",
    )


@workload(
    "events_rollup_cascade",
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
               event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total,
               min(value) AS vmin, max(value) AS vmax
        FROM events
        GROUP BY 1, 2
    """,
    description="Hypertable-style cascading rollup: events aggregate to "
    "1-minute buckets, and the hour level RE-AGGREGATES the minute relation "
    "(sum of sums, min of mins...) instead of rescanning raw events — the "
    "continuous-aggregate pattern where each resolution reads the one below "
    "it. The oracle aggregates raw events straight to hours, proving the "
    "cascade is lossless for decomposable aggregates",
    tags=("timeseries", "inventory"),
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # decimal partials: the minute→hour re-aggregation is then EXACTLY
        # lossless, not merely close, and both engines agree bit-for-bit
        F.sum(F.col("value").cast("decimal(18,4)")).alias("total"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    return minute.groupBy(
        F.date_trunc("hour", "bucket").alias("bucket"), "event_type"
    ).agg(
        F.sum("n").alias("n"),
        F.sum("total").cast("double").alias("total"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    ).withColumn("bucket", F.date_format("bucket", "yyyy-MM-dd HH:mm:ss"))


@workload(
    "events_rollup_percentiles",
    oracle="""
        SELECT coalesce(event_type, 'ALL') AS event_type, count(*) AS n,
               round(quantile_cont(value, 0.5), 9) AS p50,
               round(quantile_cont(value, 0.9), 9) AS p90
        FROM events GROUP BY ROLLUP(event_type)
    """,
    description="Multi-level aggregation (ROLLUP: per-event-type rows plus "
    "the grand-total row in one pass — partial aggregation covers every "
    "level, no second scan) with EXACT linear-interpolated percentiles "
    "(Spark percentile == DuckDB quantile_cont bit-for-bit after 9 dp "
    "rounding).  Exact percentile sorts within each group; at 100 TB swap "
    "in approx_percentile (KLL-style mergeable sketch, map-side combinable "
    "like the HLL sketches) — same plan shape, bounded memory, and the "
    "swap is MEASURED, not assumed: the same rollup under approx_percentile "
    "lands within 1% of exact on every group at sf0.1 "
    "(tests/test_extensions.py::test_approx_percentile_swap_in_is_within_"
    "declared_error).  event_type is never NULL "
    "in this data, so the rollup total row is unambiguous under coalesce",
    tags=("timeseries", "inventory"),
)
def events_rollup_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.rollup("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 9).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 9).alias("p90"),
        )
        .withColumn("event_type", F.coalesce("event_type", F.lit("ALL")))
    )


@workload(
    "events_hll_mergeable_sketch",
    # The DataSketches HLL sketch is EXACT (coupon/sparse mode) while the
    # per-group cardinality stays far below 2^lgK = 16384, which holds for
    # the testdata's user universe at the driver's gate scales — so the
    # estimate must equal the true distinct count and an exact SQL oracle
    # applies.  The 3%-error bound for the dense regime stays in pytest.
    oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS distinct_users_est,
               count(*) AS n_events
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'all', count(DISTINCT user_id), count(*) FROM events
    """,
    description="Mergeable distinct-count sketches (Apache DataSketches HLL "
    "via hll_sketch_agg): per-event-type user sketches UNIONED with "
    "hll_union_agg into a global estimate — the only distinct-counting "
    "pattern that scales: partial sketches combine map-side, rollups reuse "
    "finer sketches instead of rescanning, and the shuffle carries KB-sized "
    "sketch blobs instead of the value universe. Error bound vs exact "
    "asserted in tests/test_extensions.py",
    tags=("timeseries", "scale"),
)
def events_hll_mergeable_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # The exact-distinct oracle assumes the sketch never leaves its exact
    # (coupon/sparse) regime — guaranteed while the GLOBAL user universe is
    # far below 2^lgK = 16384.  Guard programmatically so a driver scale
    # change fails as a config error, not a value mismatch (ADVICE r3).
    n_users = ev.select("user_id").distinct().count()
    if n_users >= 8_192:
        from efficient_trees_spark.workloads.base import PinnedOracleScaleError

        raise PinnedOracleScaleError(
            "events_hll_mergeable_sketch: the exact-distinct oracle assumes "
            f"the HLL sketch stays in its exact sparse regime, but {n_users} "
            "distinct users approach 2^lgK=16384 — at this scale the sketch "
            "estimates (±3%) and an exact oracle no longer applies; use the "
            "error-bound pytest instead."
        )
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 14).alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("long").alias(
            "distinct_users_est"
        ),
        F.sum("n_events").alias("n_events"),
    ).select(F.lit("all").alias("event_type"), "distinct_users_est", "n_events")
    per_type_est = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").cast("long").alias("distinct_users_est"),
        "n_events",
    )
    return per_type_est.unionByName(merged)
