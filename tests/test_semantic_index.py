"""Incremental semantic (embedding) dedup index — the third member of
the incremental triad (BM25 lexical, MinHash shingle, SemanticIndex
embedding): match new crawl batches against the accumulated corpus
without re-assigning or re-shuffling it."""

import pytest
from pyspark.sql import functions as F

from efficient_trees_spark.operators import similarity


@pytest.fixture()
def emb(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/embeddings.parquet")


@pytest.fixture()
def cents(emb):
    return emb.filter("vec_id % 31 = 1").select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )


def _match_set(df):
    return {(r["new_id"], r["old_id"]): r["cos"] for r in df.collect()}


def test_match_equals_cell_local_old_new_pairs(spark, emb, cents):
    """The match must find exactly the old x new same-cell pairs at
    cos >= t that the full-corpus cell assignment implies."""
    old = emb.filter("vec_id % 3 != 0")
    new = emb.filter("vec_id % 3 = 0")
    idx = similarity.semantic_index(old, cents, "vec_id", "embedding")
    got = _match_set(
        similarity.semantic_match_against_index(
            idx, new, "vec_id", "embedding", threshold=0.3
        )
    )

    cells = similarity.nearest_centroids(emb, cents, "vec_id", "embedding", nprobe=1)
    a = cells.select(F.col("vec_id").alias("na"), F.col("cell"))
    b = cells.select(F.col("vec_id").alias("nb"), F.col("cell"))
    vec = similarity.as_double_array("embedding")
    withv = emb.select(
        "vec_id", vec.alias("v"), similarity.norm(vec).alias("n")
    )
    want = {}
    pairs = (
        a.join(b, "cell")
        .filter("na % 3 = 0 AND nb % 3 != 0 AND na != nb")
        .join(withv.select(F.col("vec_id").alias("na"), F.col("v").alias("va"), F.col("n").alias("nna")), "na")
        .join(withv.select(F.col("vec_id").alias("nb"), F.col("v").alias("vb"), F.col("n").alias("nnb")), "nb")
        .select(
            "na",
            "nb",
            F.round(
                similarity.dot(F.col("va"), F.col("vb")) / (F.col("nna") * F.col("nnb")), 6
            ).alias("cos"),
        )
        .filter("cos >= 0.3")
    )
    for r in pairs.collect():
        want[(r["na"], r["nb"])] = r["cos"]
    assert got == want and got


def test_round_trip_merge_remove_and_validate(spark, emb, cents, tmp_path):
    old = emb.filter("vec_id % 3 = 1")
    append = emb.filter("vec_id % 3 = 2")
    probes = emb.filter("vec_id % 3 = 0").limit(30)

    out = str(tmp_path / "sem_idx")
    similarity.semantic_index(old, cents, "vec_id", "embedding").write(out)
    loaded = similarity.read_semantic_index(spark, out)
    assert loaded.round_to == 6
    # the persisted vector keeps the SOURCE element type (float32 stays
    # float32 — half the storage of an eager double cast); the double
    # cast happens lazily at match time
    assert dict(loaded.vectors.dtypes)["vec"] == dict(emb.dtypes)["embedding"]

    # merge == rebuild: identical (id, cell) assignment and row set
    merged = similarity.semantic_index_merge(loaded, append, "vec_id", "embedding")
    rebuilt = similarity.semantic_index(
        old.unionByName(append), cents, "vec_id", "embedding"
    )
    m = {(r["__id"], r["cell"]) for r in merged.vectors.collect()}
    b = {(r["__id"], r["cell"]) for r in rebuilt.vectors.collect()}
    assert m == b

    # validate guard names an overlapping id; disjoint passes
    with pytest.raises(ValueError, match="semantic_index_remove"):
        similarity.semantic_index_merge(
            loaded, old.limit(1), "vec_id", "embedding", validate=True
        )
    similarity.semantic_index_merge(
        loaded, append, "vec_id", "embedding", validate=True
    ).vectors.count()

    before = _match_set(
        similarity.semantic_match_against_index(
            merged, probes, "vec_id", "embedding", threshold=0.8
        )
    )
    if before:
        victim = sorted({o for (_, o) in before})[0]
        removed = similarity.semantic_index_remove(
            merged, spark.createDataFrame([(victim,)], "vec_id long")
        )
        after = _match_set(
            similarity.semantic_match_against_index(
                removed, probes, "vec_id", "embedding", threshold=0.8
            )
        )
        assert after == {p: c for p, c in before.items() if p[1] != victim}
        again = similarity.semantic_index_remove(
            removed, spark.createDataFrame([(victim,)], "vec_id long")
        )
        assert (
            _match_set(
                similarity.semantic_match_against_index(
                    again, probes, "vec_id", "embedding", threshold=0.8
                )
            )
            == after
        )


def test_old_vectors_never_shuffle_for_the_match(spark, emb, cents, tmp_path):
    """From a LOADED index the broadcast-path match plan has ZERO hash
    exchanges: the old vector relation (cells already in the parquet)
    streams through one cell-keyed broadcast join; the shuffled form
    (broadcast=False) exchanges both sides and matches exactly."""
    old = emb.filter("vec_id % 3 != 0")
    new = emb.filter("vec_id % 3 = 0")
    out = str(tmp_path / "sem_idx")
    similarity.semantic_index(old, cents, "vec_id", "embedding").write(out)
    idx = similarity.read_semantic_index(spark, out)

    matched = similarity.semantic_match_against_index(
        idx, new, "vec_id", "embedding", threshold=0.9
    )
    plan = matched._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan, (
        "the old vector relation is being exchanged"
    )

    shuffled = similarity.semantic_match_against_index(
        idx, new, "vec_id", "embedding", threshold=0.9, broadcast=False
    )
    splan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in splan
    assert "ShuffledHashJoin" in splan
    assert _match_set(shuffled) == _match_set(matched)


def test_match_auto_degrades_to_shuffle_past_budget(spark, emb, cents, tmp_path):
    """broadcast='auto' (the default) sizes the NEW batch eagerly —
    count x max-dim — and degrades to the shuffled hash join past
    broadcast_budget_bytes instead of broadcasting a too-large batch:
    the same guard discipline BM25's broadcast_queries='auto' owns, with
    identical matches either side of the budget.  An unknown knob value
    raises with the choices."""
    old = emb.filter("vec_id % 3 != 0")
    new = emb.filter("vec_id % 3 = 0")
    out = str(tmp_path / "sem_idx")
    similarity.semantic_index(old, cents, "vec_id", "embedding").write(out)
    idx = similarity.read_semantic_index(spark, out)

    small_budget = similarity.semantic_match_against_index(
        idx, new, "vec_id", "embedding", threshold=0.9,
        broadcast="auto", broadcast_budget_bytes=64,
    )
    plan = small_budget._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "BroadcastHashJoin" not in plan

    roomy = similarity.semantic_match_against_index(
        idx, new, "vec_id", "embedding", threshold=0.9, broadcast="auto"
    )
    rplan = roomy._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in rplan
    assert _match_set(small_budget) == _match_set(roomy)

    with pytest.raises(ValueError, match="True, False, or 'auto'"):
        similarity.semantic_match_against_index(
            idx, new, "vec_id", "embedding", threshold=0.9, broadcast="maybe"
        )


def test_ivf_topk_against_index_matches_per_call_form(spark, emb, cents, tmp_path):
    """Serving from a persisted SemanticIndex returns exactly what
    ivf_cosine_topk computes per call over the same corpus + centroids."""
    out = str(tmp_path / "sem_idx")
    similarity.semantic_index(emb, cents, "vec_id", "embedding").write(out)
    idx = similarity.read_semantic_index(spark, out)
    queries = emb.filter("vec_id % 25 = 0")

    got = sorted(
        tuple(r)
        for r in similarity.ivf_topk_against_index(
            idx, queries, "vec_id", "embedding", k=5, nprobe=2
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in similarity.ivf_cosine_topk(
            emb, queries, cents, "vec_id", "embedding", k=5, nprobe=2
        ).collect()
    )
    assert got == want and got


def test_stream_static_semantic_match_parity(spark, emb, cents, tmp_path):
    """New batches arrive as a STREAM: semantic_match_against_index
    composes into a streaming plan unchanged (stateless stream-static
    broadcast join — the index side is the static relation) and the
    streamed matches equal the batch twin exactly."""
    old = emb.filter("vec_id % 3 != 0")
    new = emb.filter("vec_id % 3 = 0")
    out = str(tmp_path / "sem_idx")
    similarity.semantic_index(old, cents, "vec_id", "embedding").write(out)
    idx = similarity.read_semantic_index(spark, out)

    new_dir = str(tmp_path / "new_batch")
    new.write.parquet(new_dir)
    stream = spark.readStream.schema(emb.schema).parquet(new_dir)
    sdf = similarity.semantic_match_against_index(
        idx, stream, "vec_id", "embedding", threshold=0.3
    )
    assert sdf.isStreaming
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName("sem_matches")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.new_id, r.old_id): r.cos
        for r in spark.table("sem_matches").toPandas().itertuples()
    }
    want = _match_set(
        similarity.semantic_match_against_index(
            idx, new, "vec_id", "embedding", threshold=0.3
        )
    )
    assert got == want and got


def test_index_format_version_round_trip_and_guards(spark, emb, cents, tmp_path):
    """write() stamps format_version; a LEGACY params relation (round-9
    layout, no version column) reads as version 1; an unknown version
    raises naming both versions instead of misreading the layout."""
    out = str(tmp_path / "sem_idx")
    idx = similarity.semantic_index(emb, cents, "vec_id", "embedding")
    idx.write(out)
    p = spark.read.parquet(f"{out}/params").first()
    assert p["format_version"] == similarity.SemanticIndex.FORMAT_VERSION
    assert similarity.read_semantic_index(spark, out).round_to == idx.round_to

    legacy = str(tmp_path / "legacy_idx")
    idx.write(legacy)
    spark.createDataFrame([(6,)], "round_to int").write.mode(
        "overwrite"
    ).parquet(f"{legacy}/params")
    assert similarity.read_semantic_index(spark, legacy).round_to == 6

    future = str(tmp_path / "future_idx")
    idx.write(future)
    spark.createDataFrame(
        [(6, 99)], "round_to int, format_version int"
    ).write.mode("overwrite").parquet(f"{future}/params")
    with pytest.raises(ValueError, match="format_version 99"):
        similarity.read_semantic_index(spark, future)

    # an explicit-but-NULL version column (e.g. a v1 writer that got the
    # column via schema merge) is the legacy layout, not a TypeError
    nullv = str(tmp_path / "nullv_idx")
    idx.write(nullv)
    spark.createDataFrame(
        [(6, None)], "round_to int, format_version int"
    ).write.mode("overwrite").parquet(f"{nullv}/params")
    assert similarity.read_semantic_index(spark, nullv).round_to == 6


def test_comparable_path_is_scheme_insensitive(tmp_path):
    """The self-overwrite guard must fire for URI paths too: abspath alone
    mangles 's3a://bucket/idx' into '/cwd/s3a:/...' and the guard would
    silently no-op on object stores; file:/// and bare local spellings of
    the same directory (and symlinked forms) must compare equal."""
    cp = similarity._comparable_path
    assert cp("s3a://bucket/idx") == "bucket/idx"
    assert cp("s3a://bucket/idx/vectors/part-0.parquet").startswith(
        cp("s3a://bucket/idx") + "/"
    )
    assert cp("hdfs://nn:8020/warehouse/idx/") == "nn:8020/warehouse/idx"
    d = str(tmp_path / "idx")
    assert cp(f"file://{d}/vectors/part-0.parquet").startswith(cp(d) + "/")
    # distinct paths must NOT match (prefix means directory, not string)
    assert not cp("s3a://bucket/idx2/vectors/p.parquet").startswith(
        cp("s3a://bucket/idx") + "/"
    )
    # symlinked local spelling resolves to the same key
    link = tmp_path / "link"
    link.symlink_to(tmp_path)
    assert cp(str(link / "idx")) == cp(d)


def test_write_refuses_self_overwrite_and_compacts_to_fresh_path(
    spark, emb, cents, tmp_path
):
    """write(mode='overwrite'/'append') into the path the index lazily
    reads from is the classic silent-corruption trap (source deleted
    mid-scan / rows duplicated) — it must refuse loudly.  Writing the
    merged chain to a FRESH path is the compaction step and must
    round-trip the merged contents."""
    p1 = str(tmp_path / "idx1")
    similarity.semantic_index(
        emb.filter("vec_id % 2 = 0"), cents, "vec_id", "embedding"
    ).write(p1)
    idx = similarity.read_semantic_index(spark, p1)
    merged = similarity.semantic_index_merge(
        idx, emb.filter("vec_id % 2 != 0"), "vec_id", "embedding"
    )
    for mode in ("overwrite", "append"):
        with pytest.raises(ValueError, match="refusing to"):
            merged.write(p1, mode=mode)
        with pytest.raises(ValueError, match="refusing to"):
            idx.write(p1, mode=mode)
    # a fresh path compacts the union-of-parquet chain into one relation
    p2 = str(tmp_path / "idx2")
    merged.write(p2)
    back = similarity.read_semantic_index(spark, p2)
    assert back.vectors.count() == emb.count()
    assert "Union" not in back.vectors._jdf.queryExecution().optimizedPlan().toString()
    # an in-memory index (no file inputs) still overwrites freely
    similarity.semantic_index(emb, cents, "vec_id", "embedding").write(
        p2, mode="overwrite"
    )


def test_pq_index_round_trip_and_served_adc_parity(spark, emb, cents, tmp_path):
    """A SemanticIndex built with pq_codebooks persists codes + codebooks
    (format_version 2), and ivf_pq_topk_against_index from the LOADED
    index is bit-identical to the per-call ivf_pq_topk over the same
    corpus/centroids/codebooks — with and without the exact-cosine
    rerank stage (whose raw vectors come from the index itself).  The
    served plan never exchanges more than the per-call plan (the corpus
    side streams from parquet)."""
    seeds = emb.filter("vec_id % 31 = 1")
    books = similarity.pq_codebooks_from_seeds(seeds, "vec_id", "embedding", m=8)
    queries = emb.filter("vec_id % 25 = 0")
    out = str(tmp_path / "pq_idx")
    similarity.semantic_index(
        emb, cents, "vec_id", "embedding", pq_codebooks=books
    ).write(out)
    idx = similarity.read_semantic_index(spark, out)
    assert idx.pq_codebooks == books
    assert "codes" in idx.vectors.columns
    p = spark.read.parquet(f"{out}/params").first()
    assert p["format_version"] == 2 and p["pq_codebooks"]

    for rr in (None, 10):
        served_df = similarity.ivf_pq_topk_against_index(
            idx, queries, "vec_id", "embedding", k=5, nprobe=2, rerank=rr
        )
        served = sorted(tuple(r) for r in served_df.collect())
        percall_df = similarity.ivf_pq_topk(
            emb, queries, cents, books, "vec_id", "embedding",
            k=5, nprobe=2, rerank=rr,
        )
        percall = sorted(tuple(r) for r in percall_df.collect())
        assert served == percall and served
        splan = served_df._jdf.queryExecution().executedPlan().toString()
        pplan = percall_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in splan
        assert splan.count("Exchange hashpartitioning") <= pplan.count(
            "Exchange hashpartitioning"
        )

    # merge encodes the append with the STORED codebooks: == rebuild
    half = emb.filter("vec_id % 2 = 0")
    rest = emb.filter("vec_id % 2 != 0")
    part = str(tmp_path / "pq_half")
    similarity.semantic_index(
        half, cents, "vec_id", "embedding", pq_codebooks=books
    ).write(part)
    merged = similarity.semantic_index_merge(
        similarity.read_semantic_index(spark, part), rest, "vec_id", "embedding"
    )
    assert merged.pq_codebooks == books
    m = {(r["__id"], tuple(r["codes"])) for r in merged.vectors.collect()}
    b = {
        (r["__id"], tuple(r["codes"]))
        for r in similarity.semantic_index(
            emb, cents, "vec_id", "embedding", pq_codebooks=books
        ).vectors.collect()
    }
    assert m == b

    # the serving broadcasts carry the 'auto' budget guard: past the
    # budget every query-batch-shaped side (ADC table, shortlist, exact
    # query relation) degrades to a shuffled hash join with identical rows
    tight_df = similarity.ivf_pq_topk_against_index(
        idx, queries, "vec_id", "embedding", k=5, nprobe=2, rerank=10,
        broadcast_budget_bytes=0,
    )
    tplan = tight_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in tplan
    wide_df = similarity.ivf_pq_topk_against_index(
        idx, queries, "vec_id", "embedding", k=5, nprobe=2, rerank=10
    )
    assert sorted(tuple(r) for r in tight_df.collect()) == sorted(
        tuple(r) for r in wide_df.collect()
    )

    # error paths: PQ serving demands a PQ-bearing index; rerank >= k
    plain = similarity.semantic_index(emb, cents, "vec_id", "embedding")
    with pytest.raises(ValueError, match="no PQ codebooks"):
        similarity.ivf_pq_topk_against_index(
            plain, queries, "vec_id", "embedding", k=5
        )
    with pytest.raises(ValueError, match="rerank must be >= k"):
        similarity.ivf_pq_topk_against_index(
            idx, queries, "vec_id", "embedding", k=5, rerank=2
        )
