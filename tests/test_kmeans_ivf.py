"""Distributed k-means IVF centroid training (operators/similarity.py).

The reference has no ANN trainer at all (its search is brute-force); the
trainer is extension surface, so coverage is pytest-based: determinism,
objective improvement over seed centroids, plug-compatibility with
``ivf_cosine_topk``, and the zero-shuffle assignment plan gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from efficient_trees_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/embeddings.parquet")


def _mean_best_cos(emb, centroids) -> float:
    """Mean cosine of each vector to its assigned centroid — the (cosine)
    k-means objective the Lloyd iterations should improve."""
    vec = similarity.as_double_array("embedding")
    cents = similarity._literal_centroids(centroids)
    vnorm = similarity.norm(vec)
    best = F.array_max(
        F.transform(
            cents,
            lambda c: similarity.dot(vec, c["cvec"]) / (vnorm * c["cnorm"]),
        )
    )
    return emb.select(F.avg(best).alias("m")).collect()[0]["m"]


def _seed_centroids(emb):
    rows = emb.filter(F.expr("vec_id % 31 = 1")).select("vec_id", "embedding").collect()
    return [(i, [float(x) for x in row["embedding"]]) for i, row in enumerate(rows)]


def test_training_is_deterministic(emb):
    a = similarity.train_ivf_centroids(emb, "vec_id", "embedding", k=8, n_iters=2)
    b = similarity.train_ivf_centroids(emb, "vec_id", "embedding", k=8, n_iters=2)
    assert a == b


def test_training_improves_objective_over_seeds(emb):
    seeds = _seed_centroids(emb)
    trained = similarity.train_ivf_centroids(
        emb, "vec_id", "embedding", k=len(seeds), n_iters=4
    )
    assert _mean_best_cos(emb, trained) > _mean_best_cos(emb, seeds)


def test_iterations_monotone_after_first(emb):
    # Lloyd's objective is non-decreasing iteration over iteration (up to the
    # cosine-vs-euclidean mismatch; on this data it holds from iter 1 on).
    scores = [
        _mean_best_cos(
            emb,
            similarity.train_ivf_centroids(emb, "vec_id", "embedding", k=8, n_iters=i),
        )
        for i in (1, 2, 4)
    ]
    assert scores[0] <= scores[1] <= scores[2] + 1e-12


def test_trained_centroids_plug_into_ivf_topk(spark, emb):
    trained = similarity.train_ivf_centroids(emb, "vec_id", "embedding", k=8, n_iters=2)
    cents = similarity.centroids_frame(spark, trained)
    queries = emb.filter(F.expr("vec_id % 17 = 3"))
    out = similarity.ivf_cosine_topk(
        emb, queries, cents, "vec_id", "embedding", k=5, nprobe=2
    )
    rows = out.collect()
    assert rows, "IVF search over trained centroids returned nothing"
    per_query: dict[int, int] = {}
    for r in rows:
        per_query[r["query_id"]] = max(per_query.get(r["query_id"], 0), r["rank"])
    assert all(v <= 5 for v in per_query.values())


def test_assignment_is_zero_shuffle(emb):
    # The literal-centroid assignment must stay a pure projection: no
    # Exchange in the plan before the aggregation consumes it.
    cents = _seed_centroids(emb)[:4]
    plan = (
        emb.select(
            similarity.assign_literal_centroid(
                similarity.as_double_array("embedding"), cents
            )
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
