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


def test_enrich_stream_matches_batch_and_composes_with_windows(spark, sf_small):
    """Stream-static enrichment: (1) enriched stream rows == the batch join
    row-for-row; (2) the enriched column drives a watermarked tumbling
    aggregation whose streaming result equals the batch twin — the full
    enrich -> window production composition."""
    events_batch = load(spark, sf_small, "events")
    dim = (
        events_batch.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.concat(F.lit("seg_"), (F.col("user_id") % 3)).alias("segment"),
        )
    ).cache()

    stream = windows.read_events_stream(spark, sf_small)
    enriched = joins.enrich_stream(stream, dim)

    # (1) row parity with the batch join
    _run_append_to_memory(
        enriched.select("event_id", "segment"), "enriched_rows"
    )
    got = {
        (int(r.event_id), r.segment)
        for r in spark.table("enriched_rows").toPandas().itertuples()
    }
    want = {
        (int(r.event_id), r.segment)
        for r in joins.enrich_stream(events_batch, dim)
        .select("event_id", "segment")
        .toPandas()
        .itertuples()
    }
    assert got == want and got

    # (2) composition: watermark + tumbling count per enriched segment
    agg = (
        enriched.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "segment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "segment", "n")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("enriched_windows")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.ws, r.segment): int(r.n)
        for r in spark.table("enriched_windows").toPandas().itertuples()
    }
    want = {
        (r.ws, r.segment): int(r.n)
        for r in joins.enrich_stream(events_batch, dim)
        .groupBy(F.window("ts", "1 hour"), "segment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "segment", "n")
        .toPandas()
        .itertuples()
    }
    assert got == want and got
    dim.unpersist()


def test_interval_join_batch_guards_against_whale_key_groups(spark):
    """The batch twin cartesians within key groups — the default eager
    guard must raise on a group whose pair count exceeds the cap, point at
    the scale path, and stay silent for small groups / when disabled."""
    import pytest

    from efficient_trees_spark.streaming.joins import interval_join_batch

    rows = [(1, f"2024-01-01 00:00:{s:02d}", i) for i, s in enumerate([1, 2, 3, 4])]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    with pytest.raises(ValueError, match="range_join"):
        interval_join_batch(df, df, max_pairs_per_key=10)
    # small groups pass the default guard; disabling skips the job entirely
    assert interval_join_batch(df, df).count() == 6  # strictly-after pairs
    assert interval_join_batch(df, df, max_pairs_per_key=None).count() == 6


def test_stream_enrich_model_score_window_composition(spark, sf_small):
    """The full streaming scoring story (r7 verdict item 5): a model
    TRAINED THIS SESSION on batch events is applied unchanged to a stream
    — enrich (broadcast dim) -> compiled-CASE transform (stateless, so it
    must compose into a streaming plan as a pure projection) -> watermark
    -> tumbling window count per prediction — and the streaming result
    equals the batch twin exactly.  Zero new operators: a composition gate."""
    from efficient_trees_spark import Criterion, DecisionTreeClassifier

    events_batch = load(spark, sf_small, "events")
    dim = (
        events_batch.select("user_id")
        .distinct()
        .select("user_id", (F.col("user_id") % 3).cast("double").alias("seg"))
    ).cache()

    # train on the enriched BATCH features; the stream will see the same
    # columns post-enrichment, so the compiled CASE applies verbatim
    train = joins.enrich_stream(events_batch, dim).select(
        "value", "seg", F.col("event_type").alias("target")
    )
    model = DecisionTreeClassifier(max_depth=3, criterion=Criterion.GINI)
    model.fit(train, "target")

    def scored_windows(df):
        enriched = joins.enrich_stream(df, dim)
        scored = model.transform(enriched, null_policy="keep")
        return (
            scored.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"), "prediction")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "prediction", "n")
        )

    stream = windows.read_events_stream(spark, sf_small)
    sdf = scored_windows(stream)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.outputMode("complete")
        .format("memory")
        .queryName("scored_windows")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.ws, r.prediction): int(r.n)
        for r in spark.table("scored_windows").toPandas().itertuples()
    }
    want = {
        (r.ws, r.prediction): int(r.n)
        for r in scored_windows(events_batch)
        .toPandas()
        .itertuples()
    }
    assert got == want and got
    # the model genuinely discriminates on this fixture (not one constant
    # leaf) — otherwise the parity above would be vacuous
    assert len({p for _, p in got}) > 1
    dim.unpersist()


def test_stream_tokenizer_encode_composition(spark, sf_small):
    """A BpeTokenizer trained this session on the batch corpus encodes a
    DOCUMENT STREAM unchanged — the expression strategy is a stateless
    projection, so it composes into a streaming plan like the compiled
    model CASE — and the streamed per-symbol counts equal the batch
    counts exactly."""
    from efficient_trees_spark.operators import bpe

    docs_batch = spark.read.parquet(f"{sf_small}/documents.parquet")
    tok = bpe.fit_bpe(docs_batch, n_merges=12)

    def symbol_counts(df):
        return (
            tok.encode(df, strategy="expression")
            .select(F.explode("bpe_tokens").alias("sym"))
            .groupBy("sym")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    stream = (
        spark.readStream.format("parquet")
        .schema(docs_batch.schema)
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_small)
    )
    sdf = symbol_counts(stream)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_bpe_counts")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.sym: int(r.n)
        for r in spark.table("stream_bpe_counts").toPandas().itertuples()
    }
    want = {r["sym"]: r["n"] for r in symbol_counts(docs_batch).collect()}
    assert got == want and len(got) > 10
