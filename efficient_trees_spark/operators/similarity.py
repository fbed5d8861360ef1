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


# ------------------------------------------------- int8 scalar quantization
#
# The standard memory lever for billion-vector ANN: store int8 codes + one
# float scale per vector (≈4x smaller than float32, ≈8x than float64), score
# candidates on dequantized values.  Symmetric per-vector scheme: scale =
# max|x| / 127, code_i = round(x_i / scale).  Pure collection expressions.


def quantize_embedding(vec_col: Column | str) -> Column:
    """struct<scale: double, codes: array<tinyint>> — symmetric per-vector
    int8 quantization.  All-zero vectors get scale 0 and zero codes."""
    vec = as_double_array(vec_col)
    amax = F.array_max(F.transform(vec, F.abs))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(0.0))
    codes = F.transform(
        vec,
        lambda x: F.when(amax > 0, F.round(x / (amax / 127.0)))
        .otherwise(F.lit(0))
        .cast("tinyint"),
    )
    return F.struct(scale.alias("scale"), codes.alias("codes"))


def dequantize_embedding(q_col: Column | str) -> Column:
    """array<double> reconstruction: code_i * scale (max abs error
    scale/2 = max|x|/254 per component)."""
    q = F.col(q_col) if isinstance(q_col, str) else q_col
    return F.transform(q.getField("codes"), lambda c: c.cast("double") * q.getField("scale"))


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


# ------------------------------------------------------------ IVF bucketing

def nearest_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    nprobe: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """(id, cell, probe_rank) — each vector's ``nprobe`` nearest centroids by
    cosine (rounded, centroid-id tie-break: a total order both engines agree
    on).  ``centroids`` is (cid, cvec); it is broadcast, so assignment is a
    map-only pass over the corpus — the IVF coarse quantizer.
    """
    from pyspark.sql import Window

    c = centroids.select(
        F.col("cid"),
        as_double_array("cvec").alias("cvec"),
        norm(as_double_array("cvec")).alias("cnorm"),
    )
    v = vectors.select(
        F.col(id_col).alias("__vid"),
        as_double_array(vec_col).alias("__vec"),
        norm(as_double_array(vec_col)).alias("__vnorm"),
    )
    scored = v.crossJoin(F.broadcast(c)).select(
        "__vid",
        "cid",
        F.round(
            dot(F.col("__vec"), F.col("cvec")) / (F.col("__vnorm") * F.col("cnorm")),
            round_to,
        ).alias("__ccos"),
    )
    w = Window.partitionBy("__vid").orderBy(F.desc("__ccos"), F.asc("cid"))
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .select(F.col("__vid").alias(id_col), F.col("cid").alias("cell"), "probe_rank")
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    nprobe: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their single nearest
    cell; each query probes its ``nprobe`` nearest cells and ranks only the
    vectors inside them.  Compared to hyperplane LSH this gives data-adapted
    cells (any centroid set works — k-means iterations or a fixed seed
    sample) and an explicit recall knob (nprobe).

    Scale shape: centroid assignment is broadcast-map-only; the candidate
    join keys on the cell id (bounded fan-out = cell size); per-query work
    is |probed cells| not |corpus|.  A query touching nprobe/n_cells of the
    data replaces the brute-force full scan.
    """
    corpus_cells = nearest_centroids(corpus, centroids, id_col, vec_col, nprobe=1, round_to=round_to)
    query_cells = nearest_centroids(queries, centroids, id_col, vec_col, nprobe=nprobe, round_to=round_to)

    c = _with_norm(corpus, id_col, vec_col, "neighbor").join(
        corpus_cells.select(F.col(id_col).alias("neighbor_id"), "cell"), "neighbor_id"
    )
    q = _with_norm(queries, id_col, vec_col, "query").join(
        query_cells.select(F.col(id_col).alias("query_id"), "cell"), "query_id"
    )
    pairs = c.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = dot(F.col("query_vec"), F.col("neighbor_vec")) / (
        F.col("query_norm") * F.col("neighbor_norm")
    )
    scores = pairs.select(
        "query_id", "neighbor_id", F.round(cos, round_to).alias("cos")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scores.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ------------------------------------------------------- IVF centroid training

def _literal_centroids(centroids: list[tuple[int, list[float]]]) -> Column:
    """array<struct<cid, cvec, cnorm>> literal for map-only assignment."""
    import math

    items = []
    for cid, cvec in centroids:
        cnorm = math.sqrt(sum(x * x for x in cvec))
        items.append(
            F.struct(
                F.lit(int(cid)).alias("cid"),
                F.array(*[F.lit(float(x)) for x in cvec]).alias("cvec"),
                F.lit(cnorm).alias("cnorm"),
            )
        )
    return F.array(*items)


def assign_literal_centroid(
    vec: Column, centroids: list[tuple[int, list[float]]], round_to: int = 6
) -> Column:
    """Nearest-centroid cell id as a PURE PROJECTION — no join, no shuffle.

    The centroid set is encoded as a literal array expression (k is small by
    construction: it lives on the driver between Lloyd iterations), so
    assignment costs k inline dot products per row inside whole-stage
    codegen.  Cosine is rounded and ties break on the LOWEST cid — the same
    total order ``nearest_centroids`` uses, so a trained centroid set plugs
    into ``ivf_cosine_topk`` with identical cell semantics.
    """
    vnorm = norm(vec)
    # named_struct, not struct(...alias...): aliases are dropped inside
    # lambda-function bodies (fields would come out col1/col2).
    scored = F.transform(
        _literal_centroids(centroids),
        lambda c: F.named_struct(
            F.lit("cos"),
            F.round(dot(vec, c["cvec"]) / (vnorm * c["cnorm"]), round_to),
            F.lit("neg_cid"),
            -c["cid"],
        ),
    )
    return (-F.array_max(scored)["neg_cid"]).alias("cell")


def train_ivf_centroids(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_iters: int = 5,
    round_to: int = 6,
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd's k-means for the IVF coarse quantizer.

    The reference ships no trainer (its ANN path is brute-force only); this
    is the data-adapted upgrade over seed-sampled centroids for
    ``ivf_cosine_topk``.  Deterministic throughout: init picks the k vectors
    with the smallest ``xxhash64(id)`` (a seeded uniform sample with a total
    order), assignment rounds cosine and tie-breaks on cid, and means are
    exact per-dimension averages.

    Scale shape per iteration (the classic Spark k-means loop):

    * **assign** — centroids ride into the plan as a literal expression
      (``assign_literal_centroid``): one map-only pass, zero shuffle, k dot
      products per row in codegen.  No crossJoin row expansion.
    * **update** — ``posexplode`` to (cell, pos, val) feeds a map-side
      combined ``groupBy(cell, pos).avg``: shuffle volume is
      partitions x k x dim partial sums, never corpus-sized.
    * **driver** — holds exactly k x dim doubles between iterations (the
      centroids ARE broadcast state by design).

    Empty cells drop out (k can shrink on degenerate data) — documented
    k-means behavior; callers needing exact k re-seed.  The input relation
    is persisted for the duration of the loop and unpersisted after.

    Returns ``[(cid, centroid_vector)]`` with cids renumbered 0..k'-1 in
    cell order; feed to ``centroids_frame`` / ``assign_literal_centroid``.
    """
    v = vectors.select(
        F.col(id_col).alias("__vid"), as_double_array(vec_col).alias("__vec")
    ).filter(F.col("__vec").isNotNull())
    v = v.persist()
    try:
        seeds = (
            v.orderBy(F.xxhash64("__vid"), F.col("__vid"))
            .limit(k)
            .select("__vec")
            .collect()
        )
        centroids = [(i, list(row["__vec"])) for i, row in enumerate(seeds)]
        for _ in range(n_iters):
            cell = assign_literal_centroid(F.col("__vec"), centroids, round_to)
            means = (
                v.select(cell, F.posexplode("__vec").alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(F.avg("val").alias("mean_val"))
                .groupBy("cell")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "mean_val"))
                    ).alias("dims")
                )
                .collect()
            )
            centroids = [
                (new_cid, [d["mean_val"] for d in row["dims"]])
                for new_cid, row in enumerate(sorted(means, key=lambda r: r["cell"]))
            ]
        return centroids
    finally:
        v.unpersist()


def centroids_frame(spark, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """(cid, cvec) DataFrame from a trained centroid list — the shape
    ``ivf_cosine_topk`` consumes."""
    return spark.createDataFrame(
        [(cid, [float(x) for x in cvec]) for cid, cvec in centroids],
        "cid long, cvec array<double>",
    )
