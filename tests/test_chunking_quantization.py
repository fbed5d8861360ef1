"""Token chunking and int8 embedding quantization: coverage/overlap
invariants, reconstruction error bounds, cosine preservation, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from efficient_trees_spark.functions import text
from efficient_trees_spark.operators import similarity


# ------------------------------------------------------------- chunking

def _chunks(spark, body, chunk_tokens=8, overlap=2):
    df = spark.createDataFrame([(1, body)], ["doc_id", "body"])
    return df.select(
        F.explode(text.token_chunks("body", chunk_tokens, overlap)).alias("c")
    ).select("c.*").collect()


def test_chunks_cover_all_tokens_with_overlap(spark):
    body = " ".join(f"tok{i}" for i in range(21))
    rows = sorted(_chunks(spark, body, 8, 2), key=lambda r: r.chunk_idx)
    # stride 6 over 21 tokens → chunks start at 0, 6, 12, 18
    assert [r.chunk_idx for r in rows] == [0, 1, 2, 3]
    assert rows[0].chunk_text.split(" ") == [f"tok{i}" for i in range(8)]
    # consecutive chunks share exactly `overlap` tokens
    assert rows[0].chunk_text.split(" ")[-2:] == rows[1].chunk_text.split(" ")[:2]
    # every token appears in some chunk
    seen = {t for r in rows for t in r.chunk_text.split(" ")}
    assert seen == {f"tok{i}" for i in range(21)}
    # tail chunk holds the 3 remaining tokens (18, 19, 20)
    assert rows[-1].n_tokens == 3
    # 20 tokens need only 3 chunks (starts 0, 6, 12 cover through token 19):
    # no redundant trailing window is emitted
    assert len(_chunks(spark, " ".join(f"t{i}" for i in range(20)), 8, 2)) == 3


def test_short_and_empty_docs(spark):
    short = _chunks(spark, "just three tokens", 8, 2)
    assert len(short) == 1 and short[0].n_tokens == 3
    assert _chunks(spark, "", 8, 2) == []


def test_overlap_must_be_smaller():
    with pytest.raises(ValueError, match="overlap"):
        text.token_chunks("body", chunk_tokens=4, overlap=4)


def test_chunking_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "body"])
    out = df.select(F.explode(text.token_chunks("body", 2, 1)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --------------------------------------------------------- quantization

def test_quantize_roundtrip_error_bound(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    q = emb.select(
        "vec_id",
        similarity.as_double_array("embedding").alias("vec"),
        similarity.quantize_embedding("embedding").alias("q"),
    ).withColumn("deq", similarity.dequantize_embedding("q"))
    checked = q.select(
        "vec_id",
        F.array_max(
            F.zip_with("vec", "deq", lambda a, b: F.abs(a - b))
        ).alias("max_err"),
        (F.array_max(F.transform("vec", F.abs)) / F.lit(254.0)).alias("bound"),
        similarity.cosine(F.col("vec"), F.col("deq")).alias("cos_self"),
    )
    rows = checked.collect()
    assert rows
    for r in rows:
        # per-component error ≤ scale/2 = max|x|/254 (+ tiny fp slack)
        assert r.max_err <= r.bound * (1 + 1e-9)
        # quantization preserves direction: cosine(original, dequantized) ≈ 1
        assert r.cos_self > 0.999


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], ["vec_id", "embedding"])
    r = df.select(
        similarity.quantize_embedding("embedding").alias("q")
    ).withColumn("deq", similarity.dequantize_embedding("q")).first()
    assert r.q.scale == 0.0
    assert list(r.q.codes) == [0, 0, 0]
    assert list(r.deq) == [0.0, 0.0, 0.0]


def test_quantized_codes_are_int8_range(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    stats = emb.select(
        similarity.quantize_embedding("embedding").alias("q")
    ).select(
        F.array_max("q.codes").alias("hi"), F.array_min("q.codes").alias("lo")
    ).agg(F.max("hi").alias("hi"), F.min("lo").alias("lo")).first()
    assert -127 <= stats.lo <= stats.hi <= 127


def test_quantized_cosine_close_to_exact(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet").limit(50)
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        similarity.as_double_array("embedding").alias("va"),
        similarity.dequantize_embedding(
            similarity.quantize_embedding("embedding")
        ).alias("qa"),
    )
    b = a.select(
        F.col("id_a").alias("id_b"),
        F.col("va").alias("vb"),
        F.col("qa").alias("qb"),
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b")).select(
        similarity.cosine(F.col("va"), F.col("vb")).alias("exact"),
        similarity.cosine(F.col("qa"), F.col("qb")).alias("approx"),
    )
    worst = pairs.agg(F.max(F.abs(F.col("exact") - F.col("approx")))).first()[0]
    assert worst < 0.01, worst  # int8 keeps cosine within 1e-2 on real data
