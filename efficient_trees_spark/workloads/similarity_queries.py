"""Similarity-search workloads on ``embeddings`` (64-dim float vectors),
oracle-checked against DuckDB list arithmetic.

Query set: ``vec_id % 25 = 0`` — a deterministic ~4% subset standing in for
a query batch.  Scores are computed in double and rounded to 6 dp on both
sides before thresholding/ranking, so FP association differences between
engines cannot flip results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_trees_spark.operators import similarity
from efficient_trees_spark.workloads.base import load, workload

DIM = 64
_Q_FILTER = "vec_id % 25 = 0"

_DOT = (
    "list_sum(list_transform(range(1, {n}), i -> "
    "CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _cos(a: str, b: str) -> str:
    d = _DOT.format(n=DIM + 1, a=a, b=b)
    na = _DOT.format(n=DIM + 1, a=a, b=a)
    nb = _DOT.format(n=DIM + 1, a=b, b=b)
    return f"({d}) / (sqrt({na}) * sqrt({nb}))"


_PAIRS_CTE = f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE {_Q_FILTER}),
    scores AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               round({_cos("q.embedding", "e.embedding")}, 6) AS cos
        FROM q, embeddings e
        WHERE e.vec_id != q.vec_id
    )
"""


def ann_cosine_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine baseline: broadcast query batch × single corpus
    scan, pairs above 0.3 — zero shuffle before the filter.  Registered via
    ``ann_pairs_suite`` (method='brute'); kept callable for bench.py."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.expr(_Q_FILTER))
    return similarity.cosine_above_threshold(emb, queries, "vec_id", "embedding", threshold=0.3)


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 neighbors per query, ranked on rounded score with id
    tie-break (total order → stable under any partitioning).  Registered via
    ``ann_topk_suite`` (method='brute'); kept callable for bench.py."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.expr(_Q_FILTER))
    return similarity.cosine_topk(emb, queries, "vec_id", "embedding", k=5)


def _bucket_sql(vec: str) -> str:
    terms = []
    for p in range(similarity.N_PLANES):
        weights = ", ".join(str(similarity.plane_weight(p, d)) for d in range(DIM))
        dot = (
            f"list_sum(list_transform(range(1, {DIM + 1}), i -> "
            f"CAST({vec}[i] AS DOUBLE) * ([{weights}]::DOUBLE[])[i]))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {2**p} ELSE 0 END)")
    return " + ".join(terms)


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: 8-hyperplane sign LSH buckets the corpus; query-corpus
    compare is bucket-local (partial recall, documented).  Registered via
    ``ann_pairs_suite`` (method='lsh')."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.expr(_Q_FILTER))
    return similarity.lsh_cosine_above_threshold(
        emb, queries, "vec_id", "embedding", dim=DIM, threshold=0.2
    )


_CENTROID_FILTER = "vec_id % 31 = 1"  # ~16 deterministic seed centroids


def _ivf_assign_sql(source_filter: str, nprobe: int) -> str:
    """Rank-limited nearest-centroid assignment as a DuckDB subquery."""
    return f"""
        SELECT vec_id, cid AS cell, rn AS probe_rank FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round({_cos("e.embedding", "c.cvec")}, 6) DESC,
                                c.cid ASC) AS rn
            FROM (SELECT vec_id, embedding FROM embeddings WHERE {source_filter}) e,
                 (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                  WHERE {_CENTROID_FILTER}) c
        ) WHERE rn <= {nprobe}
    """


_IVF_TOPK_ORACLE = f"""
        WITH corpus_cells AS ({_ivf_assign_sql("TRUE", 1)}),
        query_cells AS ({_ivf_assign_sql(_Q_FILTER, 2)}),
        cand AS (
            SELECT qc.vec_id AS query_id, cc.vec_id AS neighbor_id
            FROM query_cells qc
            JOIN corpus_cells cc ON cc.cell = qc.cell
            WHERE cc.vec_id != qc.vec_id
        ),
        scored AS (
            SELECT c.query_id, c.neighbor_id,
                   round({_cos("q.embedding", "e.embedding")}, 6) AS cos
            FROM cand c
            JOIN embeddings q ON q.vec_id = c.query_id
            JOIN embeddings e ON e.vec_id = c.neighbor_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 5
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: ~16 seed centroids partition the corpus into
    cells (broadcast map-only coarse quantizer); queries probe their 2
    nearest cells and rank only those members.  Data-adapted cells with an
    explicit recall knob (nprobe) — the ANN scale path alongside hyperplane
    LSH.  Registered via ``ann_topk_suite`` (method='ivf')."""
    emb = load(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.expr(_CENTROID_FILTER)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    queries = emb.filter(F.expr(_Q_FILTER))
    return similarity.ivf_cosine_topk(
        emb, queries, centroids, "vec_id", "embedding", k=5, nprobe=2
    )


def _tagged(df: DataFrame, method: str, cols: list[str]) -> DataFrame:
    return df.select(F.lit(method).alias("method"), *cols)


# ------------------------------------------------------ product quantization
#
# PQ codebooks are derived from the same deterministic seed rows the IVF
# cells use (vec_id % 31 = 1, ordered by id, unit-normalized): subspace j of
# seed c IS codebook entry (j, c).  That makes the entire PQ pipeline —
# normalize, encode (argmin of rounded subspace L2², lowest-code ties),
# per-query distance tables, ADC sum, ranking — re-derivable in DuckDB SQL
# with no literal state.  production k-means codebooks
# (similarity.train_pq_codebooks) are pytest-covered instead.

_PQ_M = 8  # 64-dim -> 8 subspaces of 8 floats; codes are 8 small ints/vector

_UNIT_CTE = """
    unit AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS uvec
        FROM (SELECT vec_id, embedding,
                     sqrt(list_sum(list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
              FROM embeddings)
    )
"""

_PQ_SUB = DIM // _PQ_M

_PQ_L2SQ = (
    "round(list_sum(list_transform(range(1, {n}), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), 6)"
)

_PQ_TOPK_ORACLE = f"""
    WITH {_UNIT_CTE},
    js AS (SELECT CAST(range AS INT) AS j FROM range(0, {_PQ_M})),
    sseed AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, uvec
              FROM unit WHERE {_CENTROID_FILTER}),
    ssub AS (SELECT j, c, uvec[(j*{_PQ_SUB}+1):(j*{_PQ_SUB}+{_PQ_SUB})] AS sub
             FROM sseed, js),
    vsub AS (SELECT vec_id, j, uvec[(j*{_PQ_SUB}+1):(j*{_PQ_SUB}+{_PQ_SUB})] AS sub
             FROM unit, js),
    scored_codes AS (
        SELECT v.vec_id, v.j, s.c,
               {_PQ_L2SQ.format(n=_PQ_SUB + 1, a="v.sub", b="s.sub")} AS d
        FROM vsub v JOIN ssub s USING (j)
    ),
    codes AS (
        SELECT vec_id, j, c AS code FROM (
            SELECT vec_id, j, c,
                   row_number() OVER (PARTITION BY vec_id, j
                                      ORDER BY d ASC, c ASC) AS rn
            FROM scored_codes
        ) WHERE rn = 1
    ),
    qtable AS (
        SELECT q.vec_id AS query_id, s.j, s.c AS code,
               {_PQ_L2SQ.format(n=_PQ_SUB + 1, a="q.sub", b="s.sub")} AS partial
        FROM (SELECT * FROM vsub WHERE {_Q_FILTER}) q
        JOIN ssub s USING (j)
    ),
    adc AS (
        SELECT t.query_id, c.vec_id AS neighbor_id,
               round(1 - sum(t.partial) / 2, 6) AS cos
        FROM codes c JOIN qtable t ON t.j = c.j AND t.code = c.code
        WHERE c.vec_id != t.query_id
        GROUP BY 1, 2
    ),
    pq_ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM adc
    )
    SELECT query_id, neighbor_id, cos, rank FROM pq_ranked WHERE rank <= 5
"""


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-5: vectors compress to {_PQ_M} uint codes
    (32x smaller than f32 here — the lever that fits billion-vector indexes
    in memory); queries rank candidates via per-subspace distance-table
    sums.  Seed-derived codebooks keep it oracle-exact; swap in
    ``train_pq_codebooks`` for production quality.  Registered via
    ``ann_topk_suite`` (method='pq')."""
    emb = load(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.expr(_CENTROID_FILTER))
    books = similarity.pq_codebooks_from_seeds(seeds, "vec_id", "embedding", m=_PQ_M)
    queries = emb.filter(F.expr(_Q_FILTER))
    return similarity.pq_adc_topk(emb, queries, books, "vec_id", "embedding", k=5)


@workload(
    "ann_pairs_suite",
    oracle=f"""
        SELECT 'brute' AS method, query_id, neighbor_id, cos
        FROM ({_PAIRS_CTE} SELECT query_id, neighbor_id, cos FROM scores WHERE cos >= 0.3)
        UNION ALL
        SELECT 'lsh', query_id, neighbor_id, cos
        FROM (
            WITH withb AS (
                SELECT vec_id, embedding, {_bucket_sql("embedding")} AS bucket
                FROM embeddings
            ),
            q AS (SELECT * FROM withb WHERE {_Q_FILTER})
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   round({_cos("q.embedding", "e.embedding")}, 6) AS cos
            FROM q JOIN withb e USING (bucket)
            WHERE e.vec_id != q.vec_id
              AND round({_cos("q.embedding", "e.embedding")}, 6) >= 0.2
        )
    """,
    description="ANN threshold-pair suite, two candidate-generation paths "
    "side by side: method='brute' is the exactness baseline (broadcast query "
    "batch × one corpus scan, pairs with cos >= 0.3, zero shuffle before the "
    "filter); method='lsh' is the scale path (8-hyperplane sign LSH buckets "
    "the corpus, bucket-local compare, cos >= 0.2, partial recall by design). "
    "Each path keeps its own exact DuckDB re-derivation",
    tags=("similarity", "suite"),
)
def ann_pairs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = ["query_id", "neighbor_id", "cos"]
    return _tagged(ann_cosine_threshold(spark, sf_dir), "brute", cols).unionByName(
        _tagged(ann_lsh_bucketed(spark, sf_dir), "lsh", cols)
    )


@workload(
    "ann_topk_suite",
    oracle=f"""
        SELECT 'brute' AS method, query_id, neighbor_id, cos, rank
        FROM (
            {_PAIRS_CTE},
            ranked AS (
                SELECT query_id, neighbor_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM scores
            )
            SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 5
        )
        UNION ALL
        SELECT 'ivf', query_id, neighbor_id, cos, rank
        FROM ({_IVF_TOPK_ORACLE})
        UNION ALL
        SELECT 'pq', query_id, neighbor_id, cos, rank
        FROM ({_PQ_TOPK_ORACLE})
    """,
    description="ANN top-5 suite: method='brute' is exact ranked retrieval "
    "(total order on rounded score + id tie-break); method='ivf' probes the 2 "
    "nearest of ~16 seed-centroid cells (broadcast coarse quantizer, "
    "cell-local candidates, nprobe recall knob) — the IVF scale path; "
    "method='pq' is product-quantized ADC retrieval (vectors compress to 8 "
    "subspace codes, queries rank by distance-table sums; cos is the PQ "
    "approximation 1 - ADC^2/2 on unit vectors) — the memory scale path",
    tags=("similarity", "suite"),
)
def ann_topk_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = ["query_id", "neighbor_id", "cos", "rank"]
    return (
        _tagged(ann_cosine_topk(spark, sf_dir), "brute", cols)
        .unionByName(_tagged(ann_ivf_topk(spark, sf_dir), "ivf", cols))
        .unionByName(_tagged(ann_pq_topk(spark, sf_dir), "pq", cols))
    )


# ------------------------------------------------------- embedding dedup suite

_DEDUP_EMB_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, vec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_sum(list_transform(range(1, {DIM + 1}),
                     i -> a.vec[i] * b.vec[i])) / (a.nrm * b.nrm), 6) AS cos
        FROM n a JOIN n b ON a.vec_id != b.vec_id
    ),
    cells AS ({_ivf_assign_sql("TRUE", 1)}),
    cell_pairs AS (
        SELECT p.id_a, p.id_b, p.cos
        FROM pairs p
        JOIN cells ca ON ca.vec_id = p.id_a
        JOIN cells cb ON cb.vec_id = p.id_b AND cb.cell = ca.cell
    )
    SELECT 'brute' AS method, v.vec_id,
           least(v.vec_id, coalesce(min(p.id_b), v.vec_id)) AS canonical_id
    FROM v
    LEFT JOIN pairs p ON p.id_a = v.vec_id AND p.cos >= 0.95
    GROUP BY v.vec_id
    UNION ALL
    SELECT 'semdedup' AS method, v.vec_id,
           least(v.vec_id, coalesce(min(p.id_b), v.vec_id)) AS canonical_id
    FROM v
    LEFT JOIN cell_pairs p ON p.id_a = v.vec_id AND p.cos >= 0.95
    GROUP BY v.vec_id
"""


@workload(
    "dedup_embedding_cosine",
    oracle=_DEDUP_EMB_ORACLE,
    description="Embedding near-dup suite: canonical id = least id among "
    "self and all qualifying neighbors with cos >= 0.95.  method='brute' is "
    "the all-pairs exactness baseline (one broadcast, no shuffle before the "
    "agg); method='semdedup' is the SemDeDup scale path (Abbas et al. 2023): "
    "cluster by nearest seed centroid — a broadcast map-only pass — and "
    "compare only WITHIN cells, so pairwise work is sum(|cell|^2) not N^2. "
    "Each path keeps its own exact DuckDB re-derivation",
    tags=("similarity", "dedup", "suite"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    scores = similarity.brute_force_scores(emb, emb, "vec_id", "embedding")
    neighbors = (
        scores.select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"))
        .filter(F.col("cos") >= 0.95)
        .groupBy("query_id")
        .agg(F.min("neighbor_id").alias("min_neighbor"))
    )
    brute = (
        emb.select("vec_id")
        .join(neighbors, emb.vec_id == F.col("query_id"), "left")
        .select(
            "vec_id",
            F.least(
                F.col("vec_id"), F.coalesce(F.col("min_neighbor"), F.col("vec_id"))
            ).alias("canonical_id"),
        )
    )
    centroids = emb.filter(F.expr(_CENTROID_FILTER)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    sem = similarity.semantic_dedup(
        emb, centroids, "vec_id", "embedding", threshold=0.95
    )
    cols = ["vec_id", "canonical_id"]
    return _tagged(brute, "brute", cols).unionByName(_tagged(sem, "semdedup", cols))
