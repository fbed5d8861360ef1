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


def _bucket_sql(vec: str, n_planes: int = similarity.N_PLANES) -> str:
    terms = []
    for p in range(n_planes):
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


def _seed_centroids(emb: DataFrame) -> DataFrame:
    return emb.filter(F.expr(_CENTROID_FILTER)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )


def ann_ivf_topk(
    spark: SparkSession, sf_dir: str, centroids=None
) -> DataFrame:
    """IVF approximate top-5: ~16 seed centroids partition the corpus into
    cells (broadcast map-only coarse quantizer); queries probe their 2
    nearest cells and rank only those members.  Data-adapted cells with an
    explicit recall knob (nprobe) — the ANN scale path alongside hyperplane
    LSH.  Registered via ``ann_topk_suite`` (method='ivf'), which passes a
    shared ``CentroidSet`` so the suite's legs collect the centroid rows
    once between them."""
    emb = load(spark, sf_dir, "embeddings")
    if centroids is None:
        centroids = _seed_centroids(emb)
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

_PQ_L2SQ_RAW = (
    "list_sum(list_transform(range(1, {n}), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
)

_PQ_L2SQ = f"round({_PQ_L2SQ_RAW}, 6)"

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
        -- partials in integer micro-units: the ADC sum is an exact BIGINT,
        -- so no float-association noise can flip the round-6 boundary the
        -- 1 - sum/2 values sit exactly on (mirrors pq_adc_topk).
        SELECT q.vec_id AS query_id, s.j, s.c AS code,
               CAST(round(({_PQ_L2SQ_RAW.format(n=_PQ_SUB + 1, a="q.sub", b="s.sub")}) * 1000000.0) AS BIGINT) AS partial
        FROM (SELECT * FROM vsub WHERE {_Q_FILTER}) q
        JOIN ssub s USING (j)
    ),
    adc AS (
        -- exact integer half-micro units, ONE final division: an odd
        -- micro-sum puts 1 - d^2/2 exactly on a round-6 boundary where
        -- engine round() implementations disagree, so no round() here.
        SELECT t.query_id, c.vec_id AS neighbor_id,
               (10000000 - sum(t.partial) * 5) / 10000000.0 AS cos
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


# IVF + PQ composed: the PQ oracle's codes/qtable restricted to the IVF
# assignment's probed cells — a neighbor is scored iff its (single) cell is
# one of the query's nprobe cells; the score itself is the same exact-
# integer ADC, so shared (query, neighbor) pairs match the pq leg's bits.
_IVF_PQ_TOPK_ORACLE = f"""
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
               CAST(round(({_PQ_L2SQ_RAW.format(n=_PQ_SUB + 1, a="q.sub", b="s.sub")}) * 1000000.0) AS BIGINT) AS partial
        FROM (SELECT * FROM vsub WHERE {_Q_FILTER}) q
        JOIN ssub s USING (j)
    ),
    corpus_cells AS ({_ivf_assign_sql("TRUE", 1)}),
    query_cells AS ({_ivf_assign_sql(_Q_FILTER, 2)}),
    adc AS (
        SELECT t.query_id, c.vec_id AS neighbor_id,
               (10000000 - sum(t.partial) * 5) / 10000000.0 AS cos
        FROM codes c
        JOIN corpus_cells cc ON cc.vec_id = c.vec_id
        JOIN query_cells qc ON qc.cell = cc.cell
        JOIN qtable t ON t.query_id = qc.vec_id AND t.j = c.j AND t.code = c.code
        WHERE c.vec_id != t.query_id
        GROUP BY 1, 2
    ),
    ivfpq_ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM adc
    )
    SELECT query_id, neighbor_id, cos, rank FROM ivfpq_ranked WHERE rank <= 5
"""

# Re-ranked IVFPQ: the SAME ADC pipeline shortlists each query's top 10,
# then the final top-5 is EXACT cosine over the shortlist's raw vectors —
# the production third stage (quantization error stops costing recall
# beyond the shortlist boundary).  The exact-cosine expression is the same
# sequential fold the brute leg uses, so scores are bit-identical to
# cosine_topk output on shared pairs.
_IVF_PQ_RR_ORACLE = _IVF_PQ_TOPK_ORACLE.replace(
    "SELECT query_id, neighbor_id, cos, rank FROM ivfpq_ranked WHERE rank <= 5",
    f"""SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT s.query_id, s.neighbor_id,
               round({_cos("qe.embedding", "ne.embedding")}, 6) AS cos,
               row_number() OVER (PARTITION BY s.query_id
                                  ORDER BY round({_cos("qe.embedding", "ne.embedding")}, 6) DESC,
                                           s.neighbor_id ASC) AS rank
        FROM (SELECT query_id, neighbor_id FROM ivfpq_ranked WHERE rank <= 10) s
        JOIN embeddings qe ON qe.vec_id = s.query_id
        JOIN embeddings ne ON ne.vec_id = s.neighbor_id
    ) WHERE rank <= 5""",
)


def ann_ivf_pq_topk(
    spark: SparkSession, sf_dir: str, centroids=None
) -> DataFrame:
    """IVF + PQ composed (the FAISS-IVFPQ two-level shape, no residuals):
    coarse cells bound the candidate set, ADC code tables score what's
    left — per-query work is |probed cells| x M code rows with PQ's
    compression on the index itself.  Registered via ``ann_topk_suite``
    (method='ivf_pq')."""
    emb = load(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.expr(_CENTROID_FILTER))
    if centroids is None:
        centroids = _seed_centroids(emb)
    books = similarity.pq_codebooks_from_seeds(seeds, "vec_id", "embedding", m=_PQ_M)
    queries = emb.filter(F.expr(_Q_FILTER))
    return similarity.ivf_pq_topk(
        emb, queries, centroids, books, "vec_id", "embedding", k=5, nprobe=2
    )


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


def ann_ivf_pq_rerank_topk(
    spark: SparkSession, sf_dir: str, centroids=None
) -> DataFrame:
    """IVFPQ with the production third stage: ADC shortlists each query's
    top 10, exact cosine over the shortlist's raw vectors ranks the final
    top 5 (shortlist broadcast onto the corpus — map-only semi-join, the
    corpus never shuffles).  Registered via ``ann_topk_suite``
    (method='ivf_pq_rr')."""
    emb = load(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.expr(_CENTROID_FILTER))
    if centroids is None:
        centroids = _seed_centroids(emb)
    books = similarity.pq_codebooks_from_seeds(seeds, "vec_id", "embedding", m=_PQ_M)
    queries = emb.filter(F.expr(_Q_FILTER))
    return similarity.ivf_pq_topk(
        emb, queries, centroids, books, "vec_id", "embedding",
        k=5, nprobe=2, rerank=10,
    )


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


# ------------------------------------------------------------ BM25 retrieval
#
# The lexical leg of the retrieval suite: same (query_id, neighbor_id,
# score, rank) contract as the embedding paths, over the documents table.
# Query batch is a pinned literal set of already-normalized terms from the
# corpus vocabulary, so tokenizing the query strings in Spark yields
# exactly the VALUES list the oracle uses.

_BM25_QUERIES: list[tuple[int, str]] = [
    (0, "spark window agg"),
    (1, "customer query join order"),
    (2, "fast hash table scan"),
]
_BM25_K, _BM25_K1, _BM25_B = 5, 1.2, 0.75

# DuckDB twin of functions/text.py tokenization (same contract as
# workloads/text_pipeline.py).
_BM25_TOKS = (
    "list_filter(string_split(trim(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g')), ' '), t -> t != '')"
)

_BM25_QTERM_VALUES = ", ".join(
    f"({qid}, '{term}')" for qid, q in _BM25_QUERIES for term in q.split()
)

# Constant text below (2.2 / 1.2 / 0.75) round-trips to the exact doubles
# the Spark expression builds via F.lit, and every arithmetic op appears in
# the same order — per-term weights are bit-identical across engines, and
# the per-doc sum goes through DECIMAL(28,12) (exact, associative) so even
# the aggregation is bit-reproducible, not just within rounding noise.
# Parametrized over a corpus filter so the incremental-index legs (merge ==
# rebuild-on-all, remove == rebuild-on-survivors) share one re-derivation.
def _bm25_topk_oracle(doc_filter: str = "TRUE") -> str:
    return f"""
    WITH dl AS (
        SELECT doc_id, len(toks) AS dl, toks
        FROM (SELECT doc_id, {_BM25_TOKS} AS toks FROM documents
              WHERE {doc_filter})
    ),
    postings AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dl)
        GROUP BY 1, 2, 3
    ),
    dfreq AS (SELECT term, count(*) AS dft FROM postings GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
              FROM (SELECT DISTINCT doc_id, dl FROM postings)),
    qterms AS (SELECT DISTINCT * FROM (VALUES {_BM25_QTERM_VALUES}) AS t(query_id, term)),
    qw AS (
        SELECT query_id, term,
               ln((n_docs - dft + 0.5) / (dft + 0.5) + 1.0) AS idf, avgdl
        FROM qterms JOIN dfreq USING (term) CROSS JOIN stats
    ),
    contrib AS (
        SELECT query_id, p.doc_id AS neighbor_id,
               idf * tf * {_BM25_K1 + 1.0!r} / (tf + {_BM25_K1!r} * (1.0 - {_BM25_B!r} + {_BM25_B!r} * p.dl / avgdl)) AS w
        FROM postings p JOIN qw USING (term)
    ),
    scored AS (SELECT query_id, neighbor_id,
                      round(CAST(sum(CAST(w AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
               FROM contrib GROUP BY 1, 2),
    ranked AS (SELECT query_id, neighbor_id, score,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, neighbor_id ASC) AS rank
               FROM scored)
    SELECT CAST(query_id AS BIGINT) AS query_id, neighbor_id, score, rank
    FROM ranked WHERE rank <= {_BM25_K}
"""


_BM25_REMOVE_FILTER = "doc_id % 5 != 0"  # survivors after the deletion batch
_BM25_TOPK_ORACLE = _bm25_topk_oracle()


def ann_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical top-5 over documents (operators/retrieval.py): one
    corpus shuffle for postings, broadcast query-weight table, candidates
    filtered before the scoring aggregation.  Registered via
    ``ann_topk_suite`` (method='bm25')."""
    from efficient_trees_spark.operators.retrieval import bm25_topk

    docs = load(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, query_text string"
    )
    # The query set is a literal handful — assert the broadcast path
    # explicitly rather than paying the auto-guard's query-side size
    # estimate (a driver round-trip) on every bench run.
    return bm25_topk(
        docs, queries, k=_BM25_K, k1=_BM25_K1, b=_BM25_B, broadcast_queries=True
    )


def ann_bm25_merged_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-index twin of :func:`ann_bm25_topk`: the corpus is split
    into a base index (doc_id % 3 != 0) and an APPEND batch, merged with
    ``bm25_index_merge`` (only the append batch is re-scanned), and the
    same queries run against the merged index.  The oracle is the FULL
    REBUILD's SQL — merge == rebuild is the correctness contract, proven
    here against an independent engine.  Registered via ``ann_topk_suite``
    (method='bm25_merged')."""
    from efficient_trees_spark.operators.retrieval import (
        bm25_index,
        bm25_index_merge,
        bm25_search,
    )

    docs = load(spark, sf_dir, "documents")
    merged = bm25_index_merge(
        bm25_index(docs.filter("doc_id % 3 != 0")),
        docs.filter("doc_id % 3 = 0"),
    )
    queries = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, query_text string"
    )
    return bm25_search(
        merged, queries, k=_BM25_K, k1=_BM25_K1, b=_BM25_B,
        broadcast_queries=True,
    )


def ann_bm25_removed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion twin of :func:`ann_bm25_merged_topk`: build on the full
    corpus, REMOVE a batch (doc_id % 5 = 0) with ``bm25_index_remove``
    (broadcast anti-join on the postings — the retained corpus is never
    rescanned), and serve the same queries.  The oracle is a full rebuild
    on the SURVIVING corpus — remove == rebuild-on-survivors proven
    against an independent engine.  Registered via ``ann_topk_suite``
    (method='bm25_removed')."""
    from efficient_trees_spark.operators.retrieval import (
        bm25_index,
        bm25_index_remove,
        bm25_search,
    )

    docs = load(spark, sf_dir, "documents")
    removed = bm25_index_remove(
        bm25_index(docs), docs.filter("doc_id % 5 = 0").select("doc_id")
    )
    queries = spark.createDataFrame(
        _BM25_QUERIES, "query_id long, query_text string"
    )
    return bm25_search(
        removed, queries, k=_BM25_K, k1=_BM25_K1, b=_BM25_B,
        broadcast_queries=True,
    )


@workload(
    "ann_topk_suite",
    oracle=f"""
        SELECT 'brute' AS method, query_id, neighbor_id, cos AS score, rank
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
        SELECT 'ivf', query_id, neighbor_id, cos AS score, rank
        FROM ({_IVF_TOPK_ORACLE})
        UNION ALL
        SELECT 'pq', query_id, neighbor_id, cos AS score, rank
        FROM ({_PQ_TOPK_ORACLE})
        UNION ALL
        SELECT 'ivf_pq', query_id, neighbor_id, cos AS score, rank
        FROM ({_IVF_PQ_TOPK_ORACLE})
        UNION ALL
        SELECT 'ivf_pq_rr', query_id, neighbor_id, cos AS score, rank
        FROM ({_IVF_PQ_RR_ORACLE})
        UNION ALL
        SELECT 'ivf_indexed', query_id, neighbor_id, cos AS score, rank
        FROM ({_IVF_TOPK_ORACLE})
        UNION ALL
        SELECT 'ivfpq_indexed', query_id, neighbor_id, cos AS score, rank
        FROM ({_IVF_PQ_TOPK_ORACLE})
        UNION ALL
        SELECT 'bm25', query_id, neighbor_id, score, rank
        FROM ({_BM25_TOPK_ORACLE})
        UNION ALL
        SELECT 'bm25_merged', query_id, neighbor_id, score, rank
        FROM ({_BM25_TOPK_ORACLE})
        UNION ALL
        SELECT 'bm25_removed', query_id, neighbor_id, score, rank
        FROM ({_bm25_topk_oracle(_BM25_REMOVE_FILTER)})
    """,
    description="Retrieval top-5 suite: method='brute' is exact ranked "
    "cosine retrieval (total order on rounded score + id tie-break); "
    "method='ivf' probes the 2 nearest of ~16 seed-centroid cells (broadcast "
    "coarse quantizer, cell-local candidates, nprobe recall knob) — the IVF "
    "scale path; method='pq' is product-quantized ADC retrieval (vectors "
    "compress to 8 subspace codes, queries rank by distance-table sums; "
    "score is the PQ approximation 1 - ADC^2/2 on unit vectors) — the memory "
    "scale path; method='ivf_pq' composes both (the FAISS-IVFPQ two-level "
    "shape: coarse cells bound candidates, ADC scores the remainder — the "
    "billion-vector combination, bit-identical ADC scores to the pq leg on "
    "shared pairs); method='bm25' is lexical BM25 over the documents table "
    "(operators/retrieval.py: postings in one shuffle, broadcast query "
    "weights, Lucene +1 idf) — the exact-term path for decontamination "
    "sweeps and quality mining; method='ivf_pq_rr' adds the production "
    "third stage to ivf_pq (ADC shortlists top-10, exact cosine over the "
    "shortlist's raw vectors ranks the final top-5 — broadcast semi-join, "
    "corpus never shuffles); method='bm25_merged' serves the same queries "
    "from an INCREMENTALLY MERGED index (base 2/3 of the corpus + append "
    "batch via bm25_index_merge) against the full-rebuild oracle — "
    "merge == rebuild proven against an independent engine; "
    "method='ivf_indexed' serves the SAME ivf queries from a persisted "
    "SemanticIndex (corpus-side vector/norm/cell rows paid for once at "
    "build — the steady-state ANN serving pattern; identical results to "
    "the per-call ivf leg by construction, and the oracle re-derives them "
    "independently); method='ivfpq_indexed' serves the ivf_pq queries "
    "from the SAME persisted index built with pq_codebooks (corpus PQ "
    "codes born in the build projection and stored — ADC serving without "
    "re-encoding the corpus per batch; the oracle re-derives the full "
    "IVFPQ pipeline independently); "
    "method='bm25_removed' serves them from an index with a DELETION batch "
    "applied (bm25_index_remove: broadcast anti-join, survivors re-derive "
    "dfreq/stats) against a rebuild-on-survivors oracle — the other half "
    "of the incremental-index contract",
    tags=("similarity", "suite"),
)
def ann_topk_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    def as_score(df: DataFrame, method: str) -> DataFrame:
        return df.select(
            F.lit(method).alias("method"),
            "query_id",
            "neighbor_id",
            F.col("cos").alias("score"),
            "rank",
        )

    bm25 = ann_bm25_topk(spark, sf_dir).select(
        F.lit("bm25").alias("method"), "query_id", "neighbor_id", "score", "rank"
    )
    bm25_merged = ann_bm25_merged_topk(spark, sf_dir).select(
        F.lit("bm25_merged").alias("method"),
        "query_id", "neighbor_id", "score", "rank",
    )
    bm25_removed = ann_bm25_removed_topk(spark, sf_dir).select(
        F.lit("bm25_removed").alias("method"),
        "query_id", "neighbor_id", "score", "rank",
    )
    # One CentroidSet across the IVF legs: the centroid rows are
    # collected once for the whole suite instead of once per leg.
    emb = load(spark, sf_dir, "embeddings")
    cents = similarity.CentroidSet(_seed_centroids(emb))
    # indexed serving leg: corpus-side (vector, norm, cell) rows come from
    # a SemanticIndex built over the full corpus with the same centroids
    seeds = emb.filter(F.expr(_CENTROID_FILTER))
    books = similarity.pq_codebooks_from_seeds(seeds, "vec_id", "embedding", m=_PQ_M)
    idx = similarity.semantic_index(
        emb, cents, "vec_id", "embedding", pq_codebooks=books
    )
    indexed = similarity.ivf_topk_against_index(
        idx, emb.filter(F.expr(_Q_FILTER)), "vec_id", "embedding", k=5, nprobe=2
    )
    # the SAME persisted index also serves ADC: codes were born in the
    # build projection (pq_codebooks), so this leg re-uses idx
    pq_indexed = similarity.ivf_pq_topk_against_index(
        idx, emb.filter(F.expr(_Q_FILTER)), "vec_id", "embedding", k=5, nprobe=2
    )
    return (
        as_score(ann_cosine_topk(spark, sf_dir), "brute")
        .unionByName(as_score(ann_ivf_topk(spark, sf_dir, cents), "ivf"))
        .unionByName(as_score(indexed, "ivf_indexed"))
        .unionByName(as_score(pq_indexed, "ivfpq_indexed"))
        .unionByName(as_score(ann_pq_topk(spark, sf_dir), "pq"))
        .unionByName(as_score(ann_ivf_pq_topk(spark, sf_dir, cents), "ivf_pq"))
        .unionByName(
            as_score(ann_ivf_pq_rerank_topk(spark, sf_dir, cents), "ivf_pq_rr")
        )
        .unionByName(bm25)
        .unionByName(bm25_merged)
        .unionByName(bm25_removed)
    )


# ------------------------------------------------------- embedding dedup suite

# Guarded-semdedup leg parameters: small enough that several seed cells
# exceed the cap on the ~500-vector sf0.01 corpus (so the LSH re-split
# genuinely engages under the oracle), fixed sub_planes so the plan stays
# lazy and DuckDB can re-derive the exact sub-bucket assignment.
_SEMDEDUP_MAX_CELL = 20
_SEMDEDUP_SUB_PLANES = 2

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
    ),
    cell_counts AS (SELECT cell, count(*) AS cnt FROM cells GROUP BY cell),
    subs AS (
        SELECT c.vec_id, c.cell,
               CASE WHEN cc.cnt > {_SEMDEDUP_MAX_CELL}
                    THEN {{BUCKET2}} ELSE 0 END AS sub
        FROM cells c
        JOIN cell_counts cc USING (cell)
        JOIN embeddings e ON e.vec_id = c.vec_id
    ),
    guarded_pairs AS (
        SELECT p.id_a, p.id_b, p.cos
        FROM pairs p
        JOIN subs sa ON sa.vec_id = p.id_a
        JOIN subs sb ON sb.vec_id = p.id_b
                    AND sb.cell = sa.cell AND sb.sub = sa.sub
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
    UNION ALL
    SELECT 'semdedup_guarded' AS method, v.vec_id,
           least(v.vec_id, coalesce(min(p.id_b), v.vec_id)) AS canonical_id
    FROM v
    LEFT JOIN guarded_pairs p ON p.id_a = v.vec_id AND p.cos >= 0.95
    GROUP BY v.vec_id
    UNION ALL
    -- incremental leg: the NEW third of the corpus canonicalized against
    -- an index built on the OLD two thirds — same cell-local pairs
    -- restricted to old x new (id_a new, id_b old)
    SELECT 'semdedup_incremental' AS method, v.vec_id,
           least(v.vec_id, coalesce(min(p.id_b), v.vec_id)) AS canonical_id
    FROM (SELECT vec_id FROM v WHERE vec_id % 3 = 0) v
    LEFT JOIN cell_pairs p ON p.id_a = v.vec_id AND p.id_b % 3 != 0
                          AND p.cos >= 0.95
    GROUP BY v.vec_id
""".replace("{BUCKET2}", _bucket_sql("e.embedding", _SEMDEDUP_SUB_PLANES))


@workload(
    "dedup_embedding_cosine",
    oracle=_DEDUP_EMB_ORACLE,
    description="Embedding near-dup suite: canonical id = least id among "
    "self and all qualifying neighbors with cos >= 0.95.  method='brute' is "
    "the all-pairs exactness baseline (one broadcast, no shuffle before the "
    "agg); method='semdedup' is the SemDeDup scale path (Abbas et al. 2023): "
    "cluster by nearest seed centroid — a broadcast map-only pass — and "
    "compare only WITHIN cells, so pairwise work is sum(|cell|^2) not N^2; "
    "method='semdedup_guarded' adds the heavy-tail skew guard (cells above "
    f"{_SEMDEDUP_MAX_CELL} members re-split into {2**_SEMDEDUP_SUB_PLANES} "
    "deterministic hyperplane-LSH sub-buckets before the pairwise join — "
    "the quadratic-whale bound, with the documented LSH recall trade-off); "
    "method='semdedup_incremental' is the incremental-index path "
    "(operators/similarity.py SemanticIndex — the embedding member of the "
    "incremental triad alongside Bm25Index and MinHashIndex): an index "
    "built on the old two-thirds of the corpus persists (vector, norm, "
    "cell) rows, and the new third matches against it through ONE "
    "cell-keyed broadcast join with zero old-side exchanges (plan-gated "
    "in tests) — the full cell assignment and old x new pair set "
    "re-derived in SQL.  Each path keeps its own exact DuckDB "
    "re-derivation",
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
    # shared handle: both semdedup legs reuse one centroid collect
    centroids = similarity.CentroidSet(_seed_centroids(emb))
    # explicit None: this leg EXISTS to oracle-check the unguarded plan
    sem = similarity.semantic_dedup(
        emb, centroids, "vec_id", "embedding", threshold=0.95,
        max_cell_size=None,
    )
    guarded = similarity.semantic_dedup(
        emb, centroids, "vec_id", "embedding", threshold=0.95,
        max_cell_size=_SEMDEDUP_MAX_CELL, dim=DIM,
        sub_planes=_SEMDEDUP_SUB_PLANES,
    )
    old = emb.filter("vec_id % 3 != 0")
    new = emb.filter("vec_id % 3 = 0")
    idx = similarity.semantic_index(old, centroids, "vec_id", "embedding")
    matches = similarity.semantic_match_against_index(
        idx, new, "vec_id", "embedding", threshold=0.95
    )
    incremental = (
        new.select("vec_id")
        .join(
            matches.groupBy("new_id").agg(F.min("old_id").alias("min_old")),
            new.vec_id == F.col("new_id"),
            "left",
        )
        .select(
            "vec_id",
            F.least(
                F.col("vec_id"), F.coalesce(F.col("min_old"), F.col("vec_id"))
            ).alias("canonical_id"),
        )
    )
    cols = ["vec_id", "canonical_id"]
    return (
        _tagged(brute, "brute", cols)
        .unionByName(_tagged(sem, "semdedup", cols))
        .unionByName(_tagged(guarded, "semdedup_guarded", cols))
        .unionByName(_tagged(incremental, "semdedup_incremental", cols))
    )
