"""Model-based corpus quality filtering, end to end in-engine.

The standard pretraining-data pattern (fasttext-style): bootstrap a weak
label from a cheap heuristic, train a classifier on per-document features,
then filter the corpus with the model.  Here every stage is the engine's
own surface, composed:

1. profile   — numeric per-doc features (tokens, diversity, alpha share,
               repetition) as ONE pure projection (functions/text.py)
2. weak label— heuristic quality_score >= tau
3. fit       — depth-3 decision tree on the features (tree.py)
4. filter    — the fitted tree compiles to a single CASE column
               (plans/case_compiler.py), so model inference rides the
               corpus scan with ZERO extra shuffles — no model server, no
               UDF, no Python workers.

Run: python examples/quality_filter.py   [SPARK_GRAFT_SF_DIR to scale]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from efficient_trees_spark.functions import text
from efficient_trees_spark.session import get_spark
from efficient_trees_spark.tree import DecisionTreeClassifier
from examples.utils import Timer

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

spark = get_spark(app_name="quality-filter-example")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

# 1. profile: tokenize once, derive every feature from the bound array
toks = F.col("__toks")
features = docs.select(
    "doc_id", "text", text.tokens("text").alias("__toks")
).select(
    "doc_id",
    text.token_count("text", toks=toks).cast("double").alias("n_tokens"),
    F.round(text.distinct_token_ratio("text", toks=toks), 9).alias("distinct_ratio"),
    F.round(text.alpha_ratio("text"), 9).alias("alpha_ratio"),
    F.round(text.duplicate_line_fraction("text"), 9).alias("dup_line_frac"),
    text.quality_score("text", toks=toks).alias("__quality"),
)

# 2. weak label from the heuristic (the bootstrap a real pipeline would
# replace with human ratings or an LLM judge)
labeled = features.withColumn("keep", (F.col("__quality") >= 0.55).cast("int")).drop(
    "__quality"
)

train = labeled.select("n_tokens", "distinct_ratio", "alpha_ratio", "dup_line_frac", "keep")

# 3. fit
model = DecisionTreeClassifier(max_depth=3)
with Timer("fit"):
    model.fit(train, "keep")

# 4. filter: compiled CASE inference inside the corpus scan
scored = model.transform(labeled, null_policy="keep")
agg = scored.select(
    F.count(F.lit(1)).alias("n_docs"),
    F.sum(F.col("prediction")).alias("n_kept"),
    F.avg((F.col("keep") == F.col("prediction")).cast("double")).alias("label_agreement"),
).collect()[0]

print(
    f"docs={agg['n_docs']} kept={agg['n_kept']} "
    f"agreement_with_weak_label={agg['label_agreement']:.3f}"
)
assert agg["label_agreement"] > 0.9, "model should reproduce its weak label closely"
spark.stop()
