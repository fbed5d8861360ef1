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
6. ivf_pq_res — full FAISS-IVFPQ shape: PQ codebooks trained on and
               applied to CELL RESIDUALS (x − centroid), same nprobe —
               the codebook budget covers the small residual geometry,
               so recall at equal nprobe improves over plain ivf_pq

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
# ONE collected-once handle shared by every composed operator below
# (ivf / residual training / ivf_pq / the persisted-index serve): the
# centroid rows reach the driver exactly once, however many operators
# compose over them — asserted at the bottom of this script.
centroids = similarity.CentroidSet(
    seeds.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
)
books = similarity.pq_codebooks_from_seeds(seeds, "vec_id", "embedding", m=8)
res_books = similarity.train_pq_residual_codebooks(
    emb, centroids, "vec_id", "embedding", m=8, ksub=16, n_iters=5
)

results = {
    "brute": similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=K),
    "ivf": similarity.ivf_cosine_topk(
        emb, queries, centroids, "vec_id", "embedding", k=K, nprobe=2
    ),
    "pq": similarity.pq_adc_topk(emb, queries, books, "vec_id", "embedding", k=K),
    "ivf_pq": similarity.ivf_pq_topk(
        emb, queries, centroids, books, "vec_id", "embedding", k=K, nprobe=2
    ),
    "ivf_pq_res": similarity.ivf_pq_topk(
        emb, queries, centroids, res_books, "vec_id", "embedding",
        k=K, nprobe=2, residual=True,
    ),
    # production third stage: ADC shortlists 8x the final k, exact cosine
    # re-ranks the shortlist — quantization error stops costing recall
    # beyond the shortlist boundary
    "ivf_pq_rr": similarity.ivf_pq_topk(
        emb, queries, centroids, res_books, "vec_id", "embedding",
        k=K, nprobe=2, residual=True, rerank=8 * K,
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
    print(f"{method:10s} recall@{K} vs brute = {recall:.3f}  ({len(got)} pairs)")

# ---- steady-state serving from a PERSISTED index ----
# A crawl-cadence pipeline does not re-assign the corpus per query batch:
# it builds a SemanticIndex once per epoch (vector, norm, centroid cell
# materialized to parquet) and serves every batch from it —
# ivf_topk_against_index pays only the batch's own map-only nprobe
# assignment plus the cell join; results are identical to the per-call
# ivf form over the same corpus and centroids.
import shutil
import tempfile

idx_dir = tempfile.mkdtemp(prefix="sem_idx_")
try:
    # pq_codebooks=: the PQ codes are born in the same build projection,
    # so the ONE persisted index serves exact-cosine IVF *and* ADC
    similarity.semantic_index(
        emb, centroids, "vec_id", "embedding", pq_codebooks=books
    ).write(idx_dir, mode="overwrite")
    idx = similarity.read_semantic_index(spark, idx_dir)
    served = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk_against_index(
            idx, queries, "vec_id", "embedding", k=K, nprobe=2
        ).collect()
    }
    per_call = {
        (r["query_id"], r["neighbor_id"]) for r in results["ivf"].collect()
    }
    print(
        f"\nserved from persisted index: {len(served)} pairs, "
        f"identical to per-call ivf = {served == per_call}"
    )
    adc_served = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_pq_topk_against_index(
            idx, queries, "vec_id", "embedding", k=K, nprobe=2
        ).collect()
    }
    adc_per_call = {
        (r["query_id"], r["neighbor_id"]) for r in results["ivf_pq"].collect()
    }
    print(
        f"ADC served from the same index: {len(adc_served)} pairs, "
        f"identical to per-call ivf_pq = {adc_served == adc_per_call}"
    )
finally:
    shutil.rmtree(idx_dir, ignore_errors=True)

# the whole composition — residual training, ivf, ivf_pq (x3), index
# build + serve — collected the centroid rows from the cluster ONCE
print(f"centroid collects across all composed operators: {centroids.collect_count}")
assert centroids.collect_count <= 1

# ---- residual IVFPQ on CLUSTERED data — the regime it exists for ----
# The uniform table above is the worst case for every ANN index (and
# residuals specifically: with centroids near-orthogonal to every point,
# x − c is no smaller than x).  Real text embeddings cluster; emulate that
# deterministically from the same table: each vector is pulled onto one of
# 8 anchor directions with a 0.15 mix of its own (unit) direction.  At
# equal nprobe and equal codebook budget, residual codebooks resolve the
# small within-cluster geometry that raw-vector codebooks waste their
# entries spanning — recall@k roughly doubles.
anchors = [
    r["avec"]
    for r in emb.filter(F.col("vec_id") % 61 == 3)
    .limit(8)
    .select(similarity.unit_vector(F.col("embedding")).alias("avec"))
    .collect()
]
lit_anchors = F.array(
    *[F.array(*[F.lit(float(x)) for x in a]) for a in anchors]
)
clustered = emb.select(
    "vec_id",
    F.zip_with(
        F.element_at(lit_anchors, (F.col("vec_id") % 8 + 1).cast("int")),
        similarity.unit_vector(F.col("embedding")),
        lambda x, y: x + 0.15 * y,
    ).alias("embedding"),
).cache()
clustered.count()
c_centroids = spark.createDataFrame(
    [(i, a) for i, a in enumerate(anchors)], "cid long, cvec array<double>"
)
c_queries = clustered.filter(F.col("vec_id") % 25 == 0)
plain_books = similarity.train_pq_codebooks(
    clustered, "vec_id", "embedding", m=8, ksub=16, n_iters=5
)
resid_books = similarity.train_pq_residual_codebooks(
    clustered, c_centroids, "vec_id", "embedding", m=8, ksub=16, n_iters=5
)
c_truth = {
    (r["query_id"], r["neighbor_id"])
    for r in similarity.cosine_topk(
        clustered, c_queries, "vec_id", "embedding", k=K
    ).collect()
}
print("\nclustered corpus (8 anchors, 0.15 mix), equal nprobe=2 and budget:")
for method, df in {
    "ivf_pq": similarity.ivf_pq_topk(
        clustered, c_queries, c_centroids, plain_books,
        "vec_id", "embedding", k=K, nprobe=2,
    ),
    "ivf_pq_res": similarity.ivf_pq_topk(
        clustered, c_queries, c_centroids, resid_books,
        "vec_id", "embedding", k=K, nprobe=2, residual=True,
    ),
    "ivf_pq_rr": similarity.ivf_pq_topk(
        clustered, c_queries, c_centroids, resid_books,
        "vec_id", "embedding", k=K, nprobe=2, residual=True, rerank=8 * K,
    ),
}.items():
    got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
    recall = len(got & c_truth) / max(len(c_truth), 1)
    print(f"{method:10s} recall@{K} vs brute = {recall:.3f}")

spark.stop()
