"""The incremental-index triad on a daily-batch corpus — end to end.

A production corpus grows by crawl batches; per-batch work must touch the
NEW batch plus persisted index state, never the accumulated raw corpus.
This example runs the whole day-over-day story with all three index
families (extension surface beyond the reference — see COVERAGE.md):

1. day 0  — build the three indexes over the starting corpus and persist
            them to parquet:
              * Bm25Index        (lexical retrieval / decontamination)
              * MinHashIndex     (shingle near-dup)
              * SemanticIndex    (embedding near-dup + IVF ANN serving)
2. DELETE the raw day-0 corpus files — from here on, nothing may need them.
3. day 1  — a new batch arrives: match it against each loaded index
            (only the batch is tokenized / shingled / assigned), drop the
            near-dups it finds, and MERGE the survivors in (validate=True
            guards the append contract on every index).
4. serve  — BM25 answers query batches from the merged index; IVF top-k
            serves from the merged semantic index (corpus-side cell
            assignment was paid at build time).

Run: python examples/incremental_corpus_dedup.py  [SPARK_GRAFT_SF_DIR]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from efficient_trees_spark.operators import dedup, retrieval, similarity
from efficient_trees_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
out_root = tempfile.mkdtemp(prefix="incremental_dedup_")

spark = get_spark(app_name="incremental-corpus-dedup-example")
spark.sparkContext.setLogLevel("ERROR")

# Stage the "day 0" corpus in our own directory so we can delete it later.
day0_docs_dir = os.path.join(out_root, "day0_docs.parquet")
day0_emb_dir = os.path.join(out_root, "day0_emb.parquet")
shutil.copy(f"{sf_dir}/documents.parquet", day0_docs_dir)
shutil.copy(f"{sf_dir}/embeddings.parquet", day0_emb_dir)

docs_all = spark.read.parquet(day0_docs_dir)
emb_all = spark.read.parquet(day0_emb_dir)
day0_docs = docs_all.filter("doc_id % 3 != 0")
day1_docs = docs_all.filter("doc_id % 3 = 0").collect()  # "arrives tomorrow"
day0_emb = emb_all.filter("vec_id % 3 != 0")
day1_emb = emb_all.filter("vec_id % 3 = 0").collect()
doc_schema, emb_schema = docs_all.schema, emb_all.schema

# ---- day 0: build + persist all three indexes ------------------------------
centroids = similarity.CentroidSet(
    emb_all.filter("vec_id % 31 = 1").select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
)
bm25_path = os.path.join(out_root, "bm25_idx")
mh_path = os.path.join(out_root, "mh_idx")
sem_path = os.path.join(out_root, "sem_idx")
retrieval.bm25_index(day0_docs).write(bm25_path)
dedup.minhash_index(day0_docs).write(mh_path)
similarity.semantic_index(day0_emb, centroids, "vec_id", "embedding").write(sem_path)
print(f"day 0: indexed {day0_docs.count()} docs / {day0_emb.count()} vectors")

# ---- the raw day-0 corpus is gone; only index state remains ----------------
os.remove(day0_docs_dir)
os.remove(day0_emb_dir)

bm25 = retrieval.read_bm25_index(spark, bm25_path)
mh = dedup.read_minhash_index(spark, mh_path)
sem = similarity.read_semantic_index(spark, sem_path)

# ---- day 1: match the new batch, drop near-dups, merge survivors -----------
new_docs = spark.createDataFrame(day1_docs, doc_schema)
new_emb = spark.createDataFrame(day1_emb, emb_schema)

shingle_dups = dedup.minhash_match_against_index(mh, new_docs, min_estimate=0.8)
sem_dups = similarity.semantic_match_against_index(
    sem, new_emb, "vec_id", "embedding", threshold=0.98
)
dup_doc_ids = (
    shingle_dups.select(F.col("new_id").alias("doc_id"))
    .unionByName(sem_dups.select(F.col("new_id").alias("doc_id")))
    .distinct()
)
n_dups = dup_doc_ids.count()
survivors = new_docs.join(F.broadcast(dup_doc_ids), "doc_id", "left_anti")
surviving_emb = new_emb.join(
    F.broadcast(dup_doc_ids.select(F.col("doc_id").alias("vec_id"))),
    "vec_id",
    "left_anti",
)
print(f"day 1: {new_docs.count()} new docs, {n_dups} near-dups dropped "
      f"(shingle + embedding evidence), {survivors.count()} accepted")

bm25 = retrieval.bm25_index_merge(bm25, survivors, validate=True)
mh = dedup.minhash_index_merge(mh, survivors, validate=True)
sem = similarity.semantic_index_merge(
    sem, surviving_emb, "vec_id", "embedding", validate=True
)

# ---- serve from the merged indexes ------------------------------------------
queries = spark.createDataFrame(
    [(0, "spark window agg"), (1, "customer query join order")],
    "query_id long, query_text string",
)
hits = retrieval.bm25_search(bm25, queries, k=3)
print("BM25 from the merged index:")
for r in hits.orderBy("query_id", "rank").collect():
    print(f"  q{r['query_id']} #{r['rank']}: doc {r['neighbor_id']} "
          f"score {r['score']:.4f}")

ann = similarity.ivf_topk_against_index(
    sem, new_emb.limit(5), "vec_id", "embedding", k=3, nprobe=2
)
n_ann = ann.count()
assert n_ann > 0, "IVF serving from the merged index returned nothing"
print(f"IVF top-3 served from the merged semantic index: {n_ann} rows "
      f"for 5 query vectors")
spark.stop()
