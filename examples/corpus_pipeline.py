"""End-to-end training-corpus construction over the documents table.

The composed pipeline a pre-training data team runs, stage by stage, all
Spark-native (extension surface beyond the reference — see COVERAGE.md):

1. profile     — per-doc token counts, quality score, fingerprints
                 (one projection, zero shuffles)
2. PII scrub   — regex redaction to typed placeholders (pure codegen)
3. quality cut — drop low-quality / too-short docs
4. exact dedup — canonical doc per content fingerprint (one shuffle)
4b. span dedup — strip duplicated 8-token spans across docs, keeping the
                 first occurrence (Lee et al. 2021, relational form)
5. mixture     — per-language token budgets at temperature tau=0.5
6. selection   — token-budget sampling per language, best-quality first
7. hold-out    — leakage-free eval split BY fingerprint group (near-dup
                 content never straddles the train/test boundary)

Run: python examples/corpus_pipeline.py  [SPARK_GRAFT_SF_DIR to scale]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from efficient_trees_spark.functions import text
from efficient_trees_spark.operators import dedup, sampling
from efficient_trees_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

spark = get_spark(app_name="corpus-pipeline-example")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

# 1-2. profile + scrub in ONE projection (tokenize once, reuse everywhere)
bound = docs.select(
    "doc_id",
    "text",  # quality_score's alpha_ratio reads the raw text
    text.redact_pii("text").alias("clean_text"),
    text.tokens("text").alias("__toks"),
    text.normalized("text").alias("__norm"),
)
toks = F.col("__toks")
profiled = bound.select(
    "doc_id",
    "clean_text",
    text.token_count("text", toks=toks).alias("n_tokens"),
    F.round(text.quality_score("text", toks=toks), 9).alias("quality"),
    text.content_fingerprint("text", norm=F.col("__norm")).alias("fp"),
    text.lang_id("text", toks=toks).alias("lang"),
)

# 3. quality cut
kept = profiled.filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 5))

# 4. exact dedup: canonical = min doc_id per fingerprint, payload via min_by
payload = F.struct("clean_text", "n_tokens", "quality", "lang")
canonical = (
    kept.groupBy("fp")
    .agg(F.min("doc_id").alias("doc_id"), F.min_by(payload, "doc_id").alias("p"))
    .select("doc_id", "fp", "p.*")
)

# 4b. span-level dedup (Lee et al. 2021): whole-doc dedup above can't see a
# boilerplate paragraph shared by otherwise-distinct docs — strip every
# duplicated 8-token span, keeping its first (lowest doc_id) occurrence.
stripped = dedup.strip_duplicate_spans(canonical, "doc_id", "clean_text", n=8)
canonical = (
    canonical.join(stripped.select("doc_id", "kept_text", "removed_tokens"), "doc_id")
    .withColumn("n_tokens", F.col("n_tokens") - F.col("removed_tokens"))
    .filter(F.col("n_tokens") >= 5)
    .drop("clean_text")
    .withColumnRenamed("kept_text", "clean_text")
).cache()

# 5. mixture budgets: half the surviving tokens, temperature 0.5
surviving = canonical.agg(F.sum("n_tokens")).first()[0]
budgets = sampling.temperature_allocation(
    canonical, "lang", "n_tokens", total_budget=surviving // 2, temperature=0.5
)

# 6. per-language token-budget selection, best quality first
parts = [
    sampling.token_budget_sample(
        canonical.filter(F.col("lang") == lang),
        "lang",
        "n_tokens",
        budget,
        order_by=F.desc("quality"),
    )
    for lang, budget in budgets.items()
]
corpus = parts[0]
for p in parts[1:]:
    corpus = corpus.unionByName(p)

stats = (
    corpus.groupBy("lang")
    .agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )
    .orderBy("lang")
)
# 7. leakage-free eval hold-out: split BY content fingerprint so any docs
# sharing a fingerprint (and their spans, already canonicalized above) land
# on one side — row-wise randomSplit would leak near-dup content across the
# boundary.
held = sampling.group_split(corpus, "fp", test_fraction=0.1, seed=13)
split_counts = {
    r["split"]: r["n"]
    for r in held.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
}

span_removed = canonical.agg(F.sum("removed_tokens")).first()[0]
print(f"input docs: {docs.count()}, after quality+dedup: {canonical.count()}")
print(f"span dedup removed {span_removed} duplicated-span tokens")
print(f"token budget: {surviving // 2} of {surviving} surviving tokens (tau=0.5)")
for r in stats.collect():
    print(
        f"  {r['lang']}: {r['n_docs']} docs, {r['tokens']} tokens "
        f"(budget {budgets.get(r['lang'])}), avg quality {r['avg_quality']}"
    )
print(
    f"eval hold-out by fingerprint group: train={split_counts.get('train', 0)}, "
    f"test={split_counts.get('test', 0)}"
)

# 8. tokenizer training on the TRAIN side only (the held-out text must not
# shape the vocabulary), then encode the whole corpus with the trained
# merges — pure-expression, zero extra shuffles.
from efficient_trees_spark.operators import bpe  # noqa: E402

train_docs = held.filter(F.col("split") == "train").select("doc_id", "clean_text")
merges = bpe.train_bpe(train_docs, n_merges=16, text_col="clean_text")
encoded = bpe.bpe_encode(held, merges, text_col="clean_text")
n_bpe = encoded.agg(F.sum(F.size("bpe_tokens"))).first()[0]
print(f"BPE: {len(merges)} merges trained on train split; "
      f"corpus encodes to {n_bpe} subword tokens "
      f"(first merges: {merges[:4]})")
canonical.unpersist()
spark.stop()
