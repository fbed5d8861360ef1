"""Embedding similarity search: brute-force cosine baseline + LSH-bucketed
approximate variant.

Scale design (corpus = N vectors, queries = Q << N):

* **Brute force** — the Q queries (with precomputed norms) are broadcast; the
  corpus is scanned exactly once with its norms computed inline; no shuffle
  at all until the (small) per-query top-k window.  This is the correct
  baseline up to ~millions × dozens of queries.
* **Hyperplane LSH** — each vector gets a bucket id from the signs of its dot
  products with ``n_planes`` fixed hyperplanes; the query-corpus join becomes
  bucket-equality (shuffle on a small int key, bucket-local compare).  Recall
  is the standard partial-recall tradeoff; planes are deterministic integer
  patterns so results are reproducible and oracle-checkable across engines.

All math is built-in Catalyst array expressions (``zip_with`` +
``aggregate``) in double precision — no UDFs, no Python workers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (matches the oracle's fold order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _with_norm(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    vec = as_double_array(vec_col)
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        vec.alias(f"{prefix}_vec"),
        norm(vec).alias(f"{prefix}_norm"),
    )


def brute_force_scores(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(query_id, neighbor_id, cos) for every query × corpus combination,
    self-pairs excluded.  Queries are broadcast — the corpus never shuffles."""
    q = _with_norm(queries, id_col, vec_col, "query")
    c = _with_norm(corpus, id_col, vec_col, "neighbor")
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    cos = dot(F.col("query_vec"), F.col("neighbor_vec")) / (
        F.col("query_norm") * F.col("neighbor_norm")
    )
    return pairs.select("query_id", "neighbor_id", cos.alias("cos"))


def cosine_above_threshold(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    round_to: int = 6,
) -> DataFrame:
    scores = brute_force_scores(corpus, queries, id_col, vec_col)
    return scores.select(
        "query_id", "neighbor_id", F.round("cos", round_to).alias("cos")
    ).filter(F.col("cos") >= threshold)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    round_to: int = 6,
) -> DataFrame:
    """Top-k neighbors per query, ranked on the ROUNDED score with id
    tie-break — a total order, so results are engine- and partitioning-stable."""
    from pyspark.sql import Window

    scores = brute_force_scores(corpus, queries, id_col, vec_col).select(
        "query_id", "neighbor_id", F.round("cos", round_to).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ------------------------------------------------------------ LSH bucketing

N_PLANES = 8


def plane_weight(p: int, d: int) -> int:
    """Deterministic pseudo-random hyperplane weight in [-6, 6] — an integer
    pattern both engines compute identically (no RNG, no floats)."""
    return (p * 37 + d * 61) % 13 - 6


def bucket_id(vec_col: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Bucket = bit pattern of hyperplane-side signs."""
    v = as_double_array(vec_col) if not isinstance(vec_col, str) else as_double_array(F.col(vec_col))
    out = F.lit(0)
    for p in range(n_planes):
        plane_dot = None
        for d in range(dim):
            term = F.element_at(v, d + 1) * F.lit(float(plane_weight(p, d)))
            plane_dot = term if plane_dot is None else plane_dot + term
        out = out + F.when(plane_dot > 0, F.lit(2**p)).otherwise(F.lit(0))
    return out


def lsh_cosine_above_threshold(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float,
    n_planes: int = N_PLANES,
    round_to: int = 6,
) -> DataFrame:
    """Approximate variant: compare only within matching hyperplane buckets.
    Misses pairs whose vectors straddle a plane (partial recall) — the scale
    path when Q × N brute force is too large."""
    q = _with_norm(queries, id_col, vec_col, "query").withColumn(
        "bucket", bucket_id(F.col("query_vec"), dim, n_planes)
    )
    c = _with_norm(corpus, id_col, vec_col, "neighbor").withColumn(
        "bucket", bucket_id(F.col("neighbor_vec"), dim, n_planes)
    )
    pairs = c.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = dot(F.col("query_vec"), F.col("neighbor_vec")) / (
        F.col("query_norm") * F.col("neighbor_norm")
    )
    return pairs.select(
        "query_id", "neighbor_id", F.round(cos, round_to).alias("cos")
    ).filter(F.col("cos") >= threshold)
