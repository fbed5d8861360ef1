"""BM25 lexical retrieval (operators/retrieval.py).

Semantics checked against a hand-computed corpus; plan shape checked for
the scale contract (postings never shuffle for the query join)."""

import math

from pyspark.sql import functions as F

from efficient_trees_spark.operators.retrieval import bm25_topk

DOCS = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "apple cherry cherry date"),
    (4, "date elderberry fig"),
]


def _bm25(tf, dl, df, n, avgdl, k1=1.2, b=0.75):
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def _run(spark, queries, **kw):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    return bm25_topk(docs, qdf, **kw)


def test_single_term_ranking_matches_hand_computation(spark):
    rows = _run(spark, [(0, "apple")], k=10).collect()
    got = {(r.query_id, r.neighbor_id): (r.score, r.rank) for r in rows}
    # corpus: N=4, avgdl = (3+2+4+3)/4 = 3.0; 'apple' df=2
    exp1 = round(_bm25(tf=2, dl=3, df=2, n=4, avgdl=3.0), 6)
    exp3 = round(_bm25(tf=1, dl=4, df=2, n=4, avgdl=3.0), 6)
    assert set(got) == {(0, 1), (0, 3)}
    assert got[(0, 1)] == (exp1, 1)  # tf=2 in a shorter doc wins
    assert got[(0, 3)] == (exp3, 2)
    assert exp1 > exp3


def test_multi_term_scores_sum_and_repeated_query_terms_dedupe(spark):
    rows = _run(spark, [(0, "apple cherry"), (1, "cherry cherry apple")], k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.neighbor_id] = r.score
    # Repeating a term in the query must not change any score.
    assert by_q[0] == by_q[1]
    # doc 3 matches both terms: score is the sum of the two contributions.
    exp = round(
        _bm25(tf=1, dl=4, df=2, n=4, avgdl=3.0)
        + _bm25(tf=2, dl=4, df=2, n=4, avgdl=3.0),
        6,
    )
    assert by_q[0][3] == exp


def test_rank_is_dense_per_query_and_k_caps_results(spark):
    rows = _run(spark, [(0, "apple banana cherry date")], k=2).collect()
    assert sorted(r.rank for r in rows) == [1, 2]


def test_unknown_terms_match_nothing(spark):
    assert _run(spark, [(0, "zzzgone")], k=5).count() == 0


def test_query_join_broadcasts_postings_side_never_shuffles_for_it(spark):
    plan = _run(spark, [(0, "apple")], k=5)._jdf.queryExecution().executedPlan().toString()
    # The postings-x-query-weights join must be broadcast (the corpus-sized
    # side stays put); no cartesian product anywhere.
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_shuffled_fallback_matches_broadcast_path_exactly(spark):
    # Force the fallback via the auto-guard (budget of 0 bytes can
    # broadcast nothing): scores and ranks must be bit-identical to the
    # broadcast path — the decimal fixed-point sum makes both associative.
    a = _run(spark, [(0, "apple cherry"), (1, "banana date")], k=10).collect()
    b = _run(
        spark,
        [(0, "apple cherry"), (1, "banana date")],
        k=10,
        broadcast_queries="auto",
        broadcast_budget_bytes=0,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_default_path_is_lazy_no_eager_query_side_job(spark):
    # The default (broadcast_queries=True) must not run a driver action at
    # plan-construction time — a query relation whose pipeline raises on
    # execution proves construction never executes it.
    from pyspark.sql import functions as F  # noqa: F811

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(0, "apple")], "query_id long, query_text string"
    ).select(
        "query_id",
        F.when(
            F.lit(True), F.col("query_text")
        ).otherwise(F.raise_error("boom")).alias("query_text"),
    )
    bm25_topk(docs, qdf, k=5)  # plan construction only — must not raise/run


def test_persisted_index_serves_batches_without_corpus_rescan(spark, sf_small, tmp_path):
    import shutil

    from efficient_trees_spark.operators.retrieval import (
        bm25_index,
        bm25_search,
        read_bm25_index,
    )

    # Behavioral one-postings-build gate: copy the corpus somewhere
    # deletable, materialize the persisted index, then DELETE the corpus —
    # every subsequent batch must still answer (a rescan would fail).
    corpus_dir = str(tmp_path / "docs.parquet")
    shutil.copy(f"{sf_small}/documents.parquet", corpus_dir)
    docs = spark.read.parquet(corpus_dir)
    expected = {
        tuple(r)
        for r in bm25_topk(docs, spark.createDataFrame(
            [(0, "spark window agg")], "query_id long, query_text string"
        ), k=5).collect()
    }
    idx = bm25_index(docs).persist()
    out = str(tmp_path / "bm25_idx")
    try:
        q1 = spark.createDataFrame(
            [(0, "spark window agg")], "query_id long, query_text string"
        )
        q2 = spark.createDataFrame(
            [(7, "shuffle join broadcast")], "query_id long, query_text string"
        )
        r1 = bm25_search(idx, q1, k=5)
        got1 = {tuple(r) for r in r1.collect()}  # materializes all 3 relations
        # Index/search split changes no semantics vs the one-shot wrapper.
        assert got1 == expected
        # Parquet round-trip written BEFORE the corpus disappears.
        idx.write(out)
        import os

        os.remove(corpus_dir)  # corpus gone — rescans now impossible
        plan = bm25_search(idx, q2, k=5)._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan  # scoring reads the cache
        assert bm25_search(idx, q2, k=5).count() == 5
        assert {tuple(r) for r in bm25_search(idx, q1, k=5).collect()} == expected
    finally:
        idx.unpersist()

    # Written index serves with neither the corpus nor the cache present.
    idx2 = read_bm25_index(spark, out)
    q1 = spark.createDataFrame(
        [(0, "spark window agg")], "query_id long, query_text string"
    )
    assert {tuple(r) for r in bm25_search(idx2, q1, k=5).collect()} == expected


def test_large_query_side_does_not_broadcast_the_weight_table(spark):
    df = _run(spark, [(0, "apple")], k=5, broadcast_queries=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Only the one-row stats crossJoin may broadcast; the qterms scoring
    # join must be a shuffled join in fallback mode.
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan
    got = {(r.query_id, r.neighbor_id) for r in df.collect()}
    assert got == {(0, 1), (0, 3)}


def test_bm25_on_real_documents_is_deterministic_across_partitionings(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    qdf = spark.createDataFrame([(0, "spark window agg")], "query_id long, query_text string")
    a = bm25_topk(docs, qdf, k=5).collect()
    b = bm25_topk(docs.repartition(13), qdf, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 5


def test_index_merge_matches_full_rebuild(spark, sf_small):
    """bm25_index_merge(old, append) must score bit-identically to a full
    rebuild over the concatenated corpus — dfreq/stats re-derive from the
    unioned postings with the same exact-integer expressions."""
    from efficient_trees_spark.operators.retrieval import (
        bm25_index,
        bm25_index_merge,
        bm25_search,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    old_docs = docs.filter("doc_id % 3 != 0")
    new_docs = docs.filter("doc_id % 3 = 0")  # disjoint append batch
    queries = spark.createDataFrame(
        [(0, "spark window agg"), (7, "shuffle join broadcast")],
        "query_id long, query_text string",
    )
    merged = bm25_index_merge(bm25_index(old_docs), new_docs)
    rebuilt = bm25_index(docs)
    got = sorted(tuple(r) for r in bm25_search(merged, queries, k=10).collect())
    want = sorted(tuple(r) for r in bm25_search(rebuilt, queries, k=10).collect())
    assert got == want and got


def test_index_merge_never_needs_old_corpus(spark, sf_small, tmp_path):
    """Appending to a persisted-and-reloaded index works after the ORIGINAL
    corpus files are deleted — the merge reads the old postings relation,
    never the old docs."""
    import os
    import shutil

    from efficient_trees_spark.operators.retrieval import (
        bm25_index,
        bm25_index_merge,
        bm25_search,
        read_bm25_index,
    )

    corpus_dir = str(tmp_path / "docs.parquet")
    shutil.copy(f"{sf_small}/documents.parquet", corpus_dir)
    docs = spark.read.parquet(corpus_dir)
    old_docs = docs.filter("doc_id % 3 != 0")
    # the append batch is materialized independently of the old corpus file
    new_rows = docs.filter("doc_id % 3 = 0").collect()
    out = str(tmp_path / "bm25_idx")
    bm25_index(old_docs).write(out)

    os.remove(corpus_dir)  # old corpus gone — a rescan would fail here
    new_docs = spark.createDataFrame(new_rows, docs.schema)
    merged = bm25_index_merge(read_bm25_index(spark, out), new_docs)
    queries = spark.createDataFrame(
        [(0, "spark window agg")], "query_id long, query_text string"
    )
    res = bm25_search(merged, queries, k=5).collect()
    assert len(res) == 5
    # appended docs are genuinely searchable through the merged index
    appended_ids = {r["doc_id"] for r in new_rows}
    all_hits = {
        r["neighbor_id"]
        for r in bm25_search(merged, queries, k=10_000).collect()
    }
    assert all_hits & appended_ids


def test_index_merge_validate_rejects_overlapping_ids(spark, sf_small):
    """validate=True catches an overlapping append batch (which would
    double-count postings and silently corrupt scores); disjoint batches
    pass the same check."""
    import pytest

    from efficient_trees_spark.operators.retrieval import (
        bm25_index,
        bm25_index_merge,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    old = bm25_index(docs.filter("doc_id % 3 != 0"))
    overlapping = docs.filter("doc_id % 3 != 2")  # shares % 3 == 1 with old
    with pytest.raises(ValueError, match="already present"):
        bm25_index_merge(old, overlapping, validate=True)
    disjoint = docs.filter("doc_id % 3 = 0")
    merged = bm25_index_merge(old, disjoint, validate=True)
    assert merged.stats.first()["__n"] == bm25_index(docs).stats.first()["__n"]


def test_index_remove_matches_rebuild_on_survivors(spark, sf_small):
    """bm25_index_remove must score bit-identically to a full rebuild on
    the surviving corpus; removal of absent ids is a no-op; and
    remove-then-merge supports the upsert composition."""
    from efficient_trees_spark.operators.retrieval import (
        bm25_index,
        bm25_index_merge,
        bm25_index_remove,
        bm25_search,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    queries = spark.createDataFrame(
        [(0, "spark window agg"), (7, "shuffle join broadcast")],
        "query_id long, query_text string",
    )
    full = bm25_index(docs)
    gone = docs.filter("doc_id % 5 = 0").select("doc_id")
    removed = bm25_index_remove(full, gone)
    rebuilt = bm25_index(docs.filter("doc_id % 5 != 0"))
    got = sorted(tuple(r) for r in bm25_search(removed, queries, k=10).collect())
    want = sorted(tuple(r) for r in bm25_search(rebuilt, queries, k=10).collect())
    assert got == want and got
    # removed docs can no longer be retrieved
    hits = {
        r["neighbor_id"]
        for r in bm25_search(removed, queries, k=10_000).collect()
    }
    assert not {r["doc_id"] for r in gone.collect()} & hits

    # idempotent: removing ids that are absent changes nothing
    again = bm25_index_remove(removed, gone)
    got2 = sorted(tuple(r) for r in bm25_search(again, queries, k=10).collect())
    assert got2 == got

    # upsert = remove stale ids, then merge the fresh versions (validated)
    fresh = docs.filter("doc_id % 5 = 0")
    upserted = bm25_index_merge(removed, fresh, validate=True)
    want_full = sorted(tuple(r) for r in bm25_search(full, queries, k=10).collect())
    got_up = sorted(tuple(r) for r in bm25_search(upserted, queries, k=10).collect())
    assert got_up == want_full
