"""Deterministic training-shard export (sources/shards.py)."""

import glob
import os

from pyspark.sql import functions as F

from efficient_trees_spark.sources.shards import assign_shards, write_training_shards

N = 4


def _docs(spark, sf_small):
    return (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .select("doc_id", "text", F.length("text").alias("n_chars"))
    )


def test_export_partitions_complete_and_disjoint(spark, sf_small, tmp_path):
    docs = _docs(spark, sf_small)
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, "doc_id", N, token_col="n_chars")
    m = {r.shard: (r.n_rows, r.n_tokens) for r in manifest.collect()}

    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    counts = {r.shard: r.n for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert counts == {s: m[s][0] for s in m}
    assert set(counts) <= set(range(N))
    # manifest token totals match a direct re-aggregation
    total = docs.agg(F.sum("n_chars")).first()[0]
    assert sum(v[1] for v in m.values()) == total


def test_assignment_and_order_are_deterministic(spark, sf_small, tmp_path):
    docs = _docs(spark, sf_small)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs.repartition(3), p1, "doc_id", N)
    write_training_shards(docs.repartition(11), p2, "doc_id", N)
    for s in range(N):
        f1 = sorted(glob.glob(os.path.join(p1, f"shard={s}", "*.parquet")))
        f2 = sorted(glob.glob(os.path.join(p2, f"shard={s}", "*.parquet")))
        a = spark.read.parquet(*f1).select("doc_id").collect() if f1 else []
        b = spark.read.parquet(*f2).select("doc_id").collect() if f2 else []
        # same membership AND same in-shard order, independent of input
        # partitioning
        assert [r.doc_id for r in a] == [r.doc_id for r in b]


def test_in_shard_order_is_shuffled_not_sorted(spark, sf_small, tmp_path):
    docs = _docs(spark, sf_small)
    path = str(tmp_path / "s")
    write_training_shards(docs, path, "doc_id", 1)
    ids = [r.doc_id for r in spark.read.parquet(path).select("doc_id").collect()]
    assert ids != sorted(ids)  # pseudo-random training order, not id order


def test_assign_shards_is_a_pure_projection(spark, sf_small):
    docs = _docs(spark, sf_small)
    plan = (
        assign_shards(docs, "doc_id", N)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # assignment itself shuffles nothing


def _py_pack(rows, seq_len, drop_last=True):
    """Pure-Python packing reference: rows = [(id, tokens)] sorted by id,
    concatenated, cut every seq_len."""
    stream = [t for _, toks in sorted(rows) for t in (toks or [])]
    seqs = [stream[i : i + seq_len] for i in range(0, len(stream), seq_len)]
    if drop_last and seqs and len(seqs[-1]) < seq_len:
        seqs.pop()
    return {i: s for i, s in enumerate(seqs)}


def test_pack_sequences_matches_python_reference(spark):
    """Docs span sequence boundaries, empty/NULL docs vanish, drop_last
    controls the trailing partial — all against a pure-Python packer."""
    from efficient_trees_spark.sources.shards import pack_sequences

    rows = [
        (1, ["a", "b", "c"]),
        (2, ["d"]),
        (3, []),          # empty doc contributes nothing
        (4, None),        # NULL doc contributes nothing
        (5, ["e", "f", "g", "h", "i"]),
        (6, ["j", "k"]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    for drop_last in (True, False):
        got = {
            r["seq_id"]: r["tokens"]
            for r in pack_sequences(
                docs, "doc_id", "toks", seq_len=4, drop_last=drop_last
            ).collect()
        }
        want = _py_pack(rows, 4, drop_last)
        assert got == want, f"drop_last={drop_last}"
    # every kept sequence is exactly seq_len under drop_last
    full = pack_sequences(docs, "doc_id", "toks", seq_len=4)
    assert all(len(r["tokens"]) == 4 for r in full.collect())

    import pytest

    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(docs, "doc_id", "toks", seq_len=0)


def test_pack_sequences_sharded_and_partition_invariant(spark):
    """With a shard column each shard is an independent stream (python
    reference per shard), and output is identical under any input
    partitioning — the determinism contract."""
    from efficient_trees_spark.sources.shards import pack_sequences

    rows = [(i, [f"t{i}_{j}" for j in range(i % 5 + 1)]) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    sharded = docs.withColumn("shard", (F.col("doc_id") % 3).cast("int"))

    got = {
        (r["shard"], r["seq_id"]): r["tokens"]
        for r in pack_sequences(
            sharded, "doc_id", "toks", seq_len=6, shard_col="shard"
        ).collect()
    }
    want = {}
    for s in range(3):
        per = _py_pack([(i, t) for i, t in rows if i % 3 == s], 6)
        want.update({(s, k): v for k, v in per.items()})
    assert got == want and got

    repartitioned = sharded.repartition(13, "toks")
    got2 = {
        (r["shard"], r["seq_id"]): r["tokens"]
        for r in pack_sequences(
            repartitioned, "doc_id", "toks", seq_len=6, shard_col="shard"
        ).collect()
    }
    assert got2 == got


def test_pack_sequences_sep_token_marks_document_boundaries(spark):
    """sep_token appends one EOS-style token per non-empty document before
    packing — boundaries survive inside fixed sequences, empty/NULL docs
    still contribute nothing, and the python reference agrees."""
    from efficient_trees_spark.sources.shards import pack_sequences

    rows = [
        (1, ["a", "b", "c"]),
        (2, []),
        (3, None),
        (4, ["d", "e"]),
        (5, ["f"]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    got = {
        r["seq_id"]: r["tokens"]
        for r in pack_sequences(
            docs, "doc_id", "toks", seq_len=3, drop_last=False,
            sep_token="<eos>",
        ).collect()
    }
    want = _py_pack(
        [(i, (t + ["<eos>"]) if t else t) for i, t in rows], 3, drop_last=False
    )
    assert got == want
    assert sum(s.count("<eos>") for s in got.values()) == 3  # one per doc

    # int token-id streams take an int separator (element-type agnostic)
    ids = spark.createDataFrame(
        [(1, [7, 8]), (2, [9])], "doc_id long, toks array<int>"
    )
    got_ids = {
        r["seq_id"]: r["tokens"]
        for r in pack_sequences(
            ids, "doc_id", "toks", seq_len=2, drop_last=False, sep_token=0
        ).collect()
    }
    assert got_ids == {0: [7, 8], 1: [0, 9], 2: [0]}
