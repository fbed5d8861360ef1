"""Approximate-nearest-neighbor retrieval over the embeddings table —
every index shape this engine ships, ranked against exact brute force.

A training-data pipeline needs embedding retrieval at several
scale/accuracy points (extension surface beyond the reference — see
COVERAGE.md):

1. brute     — exact cosine top-k; the recall=1.0 baseline and the thing
               every approximate index is judged against
2. lsh       — hyperplane sign buckets: stateless, no training, coarse
3. ivf       — coarse k-means-style cells + nprobe knob: data-adapted
4. pq        — product-quantized ADC: 32x index compression, full scan
5. ivf_pq    — both composed (the billion-vector combination): cells
               bound candidates, ADC scores the remainder

Each approximate method's recall@k vs brute is printed — the number a
practitioner actually tunes nprobe/bands against.  Note the driver's
synthetic embeddings are near-uniform (no cluster structure), which is
the WORST case for every approximate index: real text embeddings
concentrate on a low-dimensional manifold where the same indexes sit at
0.8+ recall.  The point here is the machinery and the measurement, not
the absolute numbers.

Run: python examples/ann_retrieval.py  [SPARK_GRAFT_SF_DIR to scale]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from efficient_trees_spark.operators import similarity
from efficient_trees_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
K = 5

spark = get_spark(app_name="ann-retrieval-example")
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
queries = emb.filter(F.col("vec_id") % 25 == 0)
seeds = emb.filter(F.col("vec_id") % 31 == 1)  # deterministic index state
centroids = seeds.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
books = similarity.pq_codebooks_from_seeds(seeds, "vec_id", "embedding", m=8)

results = {
    "brute": similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=K),
    "ivf": similarity.ivf_cosine_topk(
        emb, queries, centroids, "vec_id", "embedding", k=K, nprobe=2
    ),
    "pq": similarity.pq_adc_topk(emb, queries, books, "vec_id", "embedding", k=K),
    "ivf_pq": similarity.ivf_pq_topk(
        emb, queries, centroids, books, "vec_id", "embedding", k=K, nprobe=2
    ),
}

truth = {
    (r["query_id"], r["neighbor_id"]) for r in results["brute"].collect()
}
n_queries = queries.count()
print(f"{n_queries} queries, top-{K}, {emb.count()} corpus vectors")
for method, df in results.items():
    got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
    recall = len(got & truth) / max(len(truth), 1)
    print(f"{method:8s} recall@{K} vs brute = {recall:.3f}  ({len(got)} pairs)")

spark.stop()
