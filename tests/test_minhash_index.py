"""Incremental MinHash dedup index (operators/dedup.py MinHashIndex):
match new crawl batches against the accumulated corpus WITHOUT
re-shingling it — the dedup twin of the BM25 incremental index."""

from pyspark.sql import functions as F

from efficient_trees_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicate_in_new_batch_matches_with_estimate_one(spark):
    old_rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "an entirely different document about spark shuffle partitions"),
    ]
    new_rows = [
        (100, "the quick brown fox jumps over the lazy dog again and again"),
        (101, "nothing like anything in the accumulated corpus whatsoever"),
    ]
    idx = dedup.minhash_index(_docs(spark, old_rows))
    got = {
        (r["new_id"], r["old_id"]): r["estimate"]
        for r in dedup.minhash_match_against_index(
            idx, _docs(spark, new_rows)
        ).collect()
    }
    assert got == {(100, 1): 1.0}


def test_match_equals_self_dedup_cross_pairs(spark, sf_small):
    """Matching new against an old-corpus index must find exactly the
    old x new candidate pairs the SELF-join LSH finds on the full corpus,
    with the same signature-agreement estimate."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    old = docs.filter("doc_id % 3 != 0")
    new = docs.filter("doc_id % 3 = 0")

    idx = dedup.minhash_index(old)
    got = {
        (r["new_id"], r["old_id"]): r["estimate"]
        for r in dedup.minhash_match_against_index(
            idx, new, min_estimate=0.25
        ).collect()
    }

    sigs = dedup.minhash_signatures(docs, "doc_id", "text")
    cand = dedup.lsh_candidate_pairs(sigs, "doc_id")
    agree = sum(
        F.when(F.col(f"a.sig_{i}") == F.col(f"b.sig_{i}"), 1).otherwise(0)
        for i in range(16)
    )
    scored = (
        cand.join(sigs.alias("a"), cand.id_a == F.col("a.doc_id"))
        .join(sigs.alias("b"), cand.id_b == F.col("b.doc_id"))
        .select("id_a", "id_b", F.round(agree / F.lit(16.0), 9).alias("est"))
        .filter(F.col("est") >= 0.25)
    )
    want = {}
    for r in scored.collect():
        a, b = r["id_a"], r["id_b"]
        if a % 3 == 0 and b % 3 != 0:
            want[(a, b)] = r["est"]
        elif b % 3 == 0 and a % 3 != 0:
            want[(b, a)] = r["est"]
    assert got == want and got, "cross-corpus matches diverge from self-dedup"


def test_merge_remove_and_corpusless_round_trip(spark, sf_small, tmp_path):
    """merge == rebuild (signature sets equal); remove drops exactly the
    victim's matchability; both work from a parquet round-trip after the
    original corpus file is gone."""
    import os
    import shutil

    corpus_dir = str(tmp_path / "docs.parquet")
    shutil.copy(f"{sf_small}/documents.parquet", corpus_dir)
    docs = spark.read.parquet(corpus_dir)
    old = docs.filter("doc_id % 3 = 1")
    append_rows = docs.filter("doc_id % 3 = 2").collect()
    probe_rows = docs.filter("doc_id % 3 = 0").limit(20).collect()

    out = str(tmp_path / "mh_idx")
    dedup.minhash_index(old).write(out)
    os.remove(corpus_dir)  # original corpus gone — a re-shingle would fail

    loaded = dedup.read_minhash_index(spark, out)
    assert (loaded.num_hashes, loaded.band_size, loaded.ngram) == (16, 4, 3)
    appended = spark.createDataFrame(append_rows, docs.schema)
    merged = dedup.minhash_index_merge(loaded, appended)

    # merge contract: the merged signature SET is exactly the loaded
    # signatures plus fresh signatures of the append batch — and only the
    # append batch was ever shingled (the old text is already deleted)
    merged_sigs = {tuple(r) for r in merged.signatures.collect()}
    expect_sigs = {tuple(r) for r in loaded.signatures.collect()} | {
        tuple(r)
        for r in dedup.minhash_index(appended).signatures.collect()
    }
    assert merged_sigs == expect_sigs

    probes = spark.createDataFrame(probe_rows, docs.schema)
    before = {
        (r["new_id"], r["old_id"])
        for r in dedup.minhash_match_against_index(
            merged, probes, min_estimate=0.25
        ).collect()
    }
    if before:
        victim = sorted({o for _, o in before})[0]
        removed = dedup.minhash_index_remove(
            merged, spark.createDataFrame([(victim,)], "doc_id long")
        )
        after = {
            (r["new_id"], r["old_id"])
            for r in dedup.minhash_match_against_index(
                removed, probes, min_estimate=0.25
            ).collect()
        }
        assert after == {p for p in before if p[1] != victim}
        again = dedup.minhash_index_remove(
            removed, spark.createDataFrame([(victim,)], "doc_id long")
        )
        assert {
            (r["new_id"], r["old_id"])
            for r in dedup.minhash_match_against_index(
                again, probes, min_estimate=0.25
            ).collect()
        } == after


def test_old_signatures_never_shuffle_for_the_match(spark, tmp_path):
    """The scale contract: from a LOADED index (old side = pure parquet
    scan) the only hash exchanges in the match plan belong to the NEW
    batch (its signature aggregation, twice — bands + scoring) and the
    candidate-set distinct; the old signature relation streams through
    broadcast joins without ever being exchanged."""
    old = _docs(spark, [(i, f"doc number {i} with words {i % 7}") for i in range(50)])
    new = _docs(spark, [(1000, "doc number 3 with words 3")])
    out_dir = str(tmp_path / "mh_idx")
    dedup.minhash_index(old).write(out_dir)
    idx = dedup.read_minhash_index(spark, out_dir)
    out = dedup.minhash_match_against_index(idx, new, min_estimate=0.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 3, (
        "the old signature relation is being exchanged"
    )


def test_non_broadcast_match_parity_and_plan(spark, sf_small):
    """broadcast=False (TB-scale new batch): identical results to the
    broadcast plan, and the executed plan contains NO broadcast join —
    every join is a shuffled hash join that spills instead of OOMing."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    old = docs.filter("doc_id % 3 != 0")
    new = docs.filter("doc_id % 3 = 0")
    idx = dedup.minhash_index(old)

    want = {
        (r["new_id"], r["old_id"]): r["estimate"]
        for r in dedup.minhash_match_against_index(
            idx, new, min_estimate=0.25
        ).collect()
    }
    shuffled = dedup.minhash_match_against_index(
        idx, new, min_estimate=0.25, broadcast=False
    )
    got = {(r["new_id"], r["old_id"]): r["estimate"] for r in shuffled.collect()}
    assert got == want and got

    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_match_whale_guard_names_the_worst_new_doc(spark):
    """A new doc colliding with a boilerplate cluster must trip the eager
    guard BEFORE the broadcast plan executes, naming the whale."""
    boiler = "identical boilerplate template page body repeated verbatim"
    old = _docs(spark, [(i, boiler) for i in range(40)])
    new = _docs(spark, [(1000, boiler), (1001, "unrelated fresh content here")])
    idx = dedup.minhash_index(old)

    try:
        dedup.minhash_match_against_index(idx, new, max_candidate_pairs=10)
        raise AssertionError("guard did not trip")
    except ValueError as exc:
        msg = str(exc)
        assert "1000" in msg and "broadcast=False" in msg and "40" in msg

    # guard off / threshold high / non-broadcast: all succeed
    assert (
        dedup.minhash_match_against_index(
            idx, new, max_candidate_pairs=None
        ).count()
        == 40
    )
    assert (
        dedup.minhash_match_against_index(
            idx, new, max_candidate_pairs=10, broadcast=False
        ).count()
        == 40
    )


def test_minhash_merge_validate_guard(spark):
    """validate=True raises on overlapping append ids (naming one), passes
    on disjoint appends; default stays unvalidated (documented contract)."""
    old = _docs(
        spark,
        [
            (1, "alpha beta gamma delta words"),
            (2, "epsilon zeta eta theta iota words"),
        ],
    )
    idx = dedup.minhash_index(old)

    overlapping = _docs(spark, [(2, "changed text for an existing id")])
    try:
        dedup.minhash_index_merge(idx, overlapping, validate=True)
        raise AssertionError("overlap not detected")
    except ValueError as exc:
        assert "2" in str(exc) and "minhash_index_remove" in str(exc)

    disjoint = _docs(spark, [(3, "a genuinely new document body")])
    merged = dedup.minhash_index_merge(idx, disjoint, validate=True)
    assert merged.signatures.count() == 3
