"""Lexical retrieval: distributed BM25 top-k over a document corpus.

The counterpart to the embedding paths in ``operators/similarity.py`` — a
training-data pipeline needs BOTH retrieval modalities: embeddings for
semantic near-dup / clustering, and lexical BM25 for benchmark
decontamination sweeps, quality mining ("find docs like these seed docs"),
and eval-set leakage audits, where exact-term evidence and an
explainable score matter more than embedding recall.

Plan shape at 100 TB (everything here is plain DataFrame ops — no UDFs):

1. ``postings``: one scan of the corpus, tokenize once per row
   (``functions.text.tokens``), carry the doc length through the explode,
   ONE shuffle to ``(doc_id, term)`` term frequencies.  This is the only
   data-sized shuffle in the flow and it is map-side combined.
2. ``dfreq``: document frequencies re-aggregate the postings relation on
   ``term`` — output is vocabulary-sized, far smaller than the corpus.
3. Corpus stats (N, avgdl) reduce from the postings relation (distinct doc
   lengths), so the corpus is scanned once TOTAL; the one-row result joins
   back by broadcast — never a driver round-trip inside the plan.
4. The query side (small by construction: a benchmark, a seed set) joins
   ``dfreq`` for per-term IDF and then hits the postings as a BROADCAST
   join, so the scoring shuffle carries only postings whose term appears
   in some query — a semi-join-sized slice of the corpus, not the corpus.
5. Scores group-by ``(query_id, doc_id)`` and rank with a window
   partitioned by query — parallelism = number of queries, each group
   already reduced to candidate size.

Scores are rounded to 6 decimals BEFORE ranking so the (score desc,
doc_id asc) order is a total order identical across engines and partition
counts — same discipline as the cosine paths.

Reference scope note: the reference engine (tree.py:16-385) has no
retrieval surface; this operator is part of the extension inventory
(SURVEY §2 extensions), oracle-checked through ``ann_topk_suite``
(method='bm25').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from efficient_trees_spark.functions import text

# Rough serialized row width of the (query_id, term, idf, avgdl) weight
# table used by the broadcast-size estimate: a short term string + an id +
# two doubles, with per-row overhead.
_QTERM_ROW_BYTES = 64


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    query_text: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    broadcast_queries: bool | None = None,
    broadcast_budget_bytes: int = 64 << 20,
) -> DataFrame:
    """Top-``k`` docs per query under BM25 (Robertson/Sparck Jones; the
    Lucene ``+1`` idf variant, so idf > 0 even for terms in most docs).

    Query terms are deduplicated (each distinct term contributes once —
    repeating a word in a query does not double its weight).  Returns
    ``(query_id, neighbor_id, score, rank)`` with rank 1..k per query,
    ties broken by ascending ``neighbor_id`` on the rounded score.

    :param broadcast_queries: ``True`` forces the broadcast scoring join
        (the postings side never shuffles), ``False`` forces a shuffled
        join (for decontamination sweeps against a benchmark collection too
        large to broadcast).  ``None`` (default) decides from a one-pass
        token count of the QUERY side against ``broadcast_budget_bytes`` —
        the count never touches the corpus, and total query tokens upper-
        bounds the weight-table rows.  Both paths produce identical scores.
    """
    from efficient_trees_spark.sources.io import fan_out_small_input

    docs = fan_out_small_input(docs)
    toks = text.tokens(text_col)

    # One corpus scan: doc length rides along the explode, so tf and dl
    # come out of a single shuffle with no doc-level re-join.
    postings = (
        docs.select(
            F.col(doc_id).alias("__doc"),
            F.size(toks).alias("__dl"),
            F.explode(toks).alias("__term"),
        )
        .groupBy("__doc", "__dl", "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = postings.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))

    # Corpus stats derive from the postings relation (distinct doc lengths
    # are doc-sized, far below token volume) so the corpus is scanned ONCE
    # total.  N therefore counts docs with >= 1 token — zero-token docs can
    # match no term anyway.
    stats = (
        postings.select("__doc", "__dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).alias("__n"),
            (F.sum("__dl").cast("double") / F.count(F.lit(1))).alias("__avgdl"),
        )
    )

    qterms = (
        queries.select(
            F.col(query_id).alias("__qid"),
            F.explode(text.tokens(query_text)).alias("__term"),
        )
        .distinct()
        .join(dfreq, "__term")
        .crossJoin(F.broadcast(stats))
        .select(
            "__qid",
            "__term",
            F.log(
                (F.col("__n") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
                + F.lit(1.0)
            ).alias("__idf"),
            "__avgdl",
        )
    )

    if broadcast_queries is None:
        est_rows = (
            queries.select(
                F.sum(F.coalesce(F.size(text.tokens(query_text)), F.lit(0)))
            ).first()[0]
            or 0
        )
        broadcast_queries = est_rows * _QTERM_ROW_BYTES <= broadcast_budget_bytes

    # Broadcast the (queries x terms)-sized weight table when it fits the
    # budget: the big postings side never shuffles for this join, and
    # non-matching postings are dropped before the scoring aggregation.
    # Beyond the budget (a decontamination sweep against a large benchmark
    # collection), fall back to a shuffled hash join on the term — one
    # postings-sized exchange, but no OOM-ing broadcast.
    if broadcast_queries:
        weighted = F.broadcast(qterms)
    else:
        weighted = qterms.hint("shuffle_hash")
    contrib = postings.join(weighted, "__term").select(
        "__qid",
        F.col("__doc").alias("neighbor_id"),
        (
            F.col("__idf")
            * F.col("__tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("__tf")
                + F.lit(k1)
                * (
                    F.lit(1.0)
                    - F.lit(b)
                    + F.lit(b) * F.col("__dl") / F.col("__avgdl")
                )
            )
        ).alias("__w"),
    )

    # Per-term weights are deterministic doubles, but a double SUM's value
    # depends on partial-aggregation association order.  Summing through a
    # fixed-point decimal (exact, associative, still map-side combinable)
    # makes the score identical at any partitioning — and lets the external
    # oracle reproduce it bit-for-bit.
    scored = contrib.groupBy("__qid", "neighbor_id").agg(
        F.round(F.sum(F.col("__w").cast("decimal(28,12)")).cast("double"), 6).alias(
            "score"
        )
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("__qid").alias(query_id), "neighbor_id", "score", "rank")
    )
