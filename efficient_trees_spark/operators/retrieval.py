"""Lexical retrieval: distributed BM25 over a document corpus, with a
persistable index.

The counterpart to the embedding paths in ``operators/similarity.py`` — a
training-data pipeline needs BOTH retrieval modalities: embeddings for
semantic near-dup / clustering, and lexical BM25 for benchmark
decontamination sweeps, quality mining ("find docs like these seed docs"),
and eval-set leakage audits, where exact-term evidence and an
explainable score matter more than embedding recall.

API shape: real retrieval serves MANY query batches against ONE corpus —
so the corpus-derived state is split out as :class:`Bm25Index`
(:func:`bm25_index` builds it; ``.persist()`` caches the three relations,
``.write()`` / :func:`read_bm25_index` round-trip them through parquet),
and :func:`bm25_search` scores a query batch against an existing index
without touching the corpus again.  :func:`bm25_topk` remains the one-shot
composition of the two for single-batch callers and the oracle suite.

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

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from efficient_trees_spark.functions import text

# Rough serialized row width of the (query_id, term, idf, avgdl) weight
# table used by the broadcast-size estimate: a short term string + an id +
# two doubles, with per-row overhead.
_QTERM_ROW_BYTES = 64


@dataclass(frozen=True)
class Bm25Index:
    """The corpus-derived half of BM25: three relations, no query state.

    ``postings`` is corpus-token-sized ((doc, term) -> tf with the doc
    length riding along); ``dfreq`` is vocabulary-sized; ``stats`` is one
    row (N, avgdl).  Scoring parameters (k1, b) are search-time arguments,
    not index state — the same index serves any parameterization.
    """

    postings: DataFrame  # (__doc, __dl, __term, __tf)
    dfreq: DataFrame  # (__term, __df)
    stats: DataFrame  # one row: (__n, __avgdl)

    def persist(self) -> "Bm25Index":
        """Cache all three relations (lazily — materialized on first use)
        so subsequent query batches never re-scan the corpus."""
        self.postings.persist()
        self.dfreq.persist()
        self.stats.persist()
        return self

    def unpersist(self) -> "Bm25Index":
        self.postings.unpersist()
        self.dfreq.unpersist()
        self.stats.unpersist()
        return self

    def write(self, path: str, mode: str = "error") -> None:
        """Persist the index as three parquet relations under ``path`` —
        build once on the cluster that can see the corpus, serve query
        batches anywhere."""
        self.postings.write.mode(mode).parquet(f"{path}/postings")
        self.dfreq.write.mode(mode).parquet(f"{path}/dfreq")
        self.stats.write.mode(mode).parquet(f"{path}/stats")


def read_bm25_index(spark: SparkSession, path: str) -> Bm25Index:
    """Load an index previously written by :meth:`Bm25Index.write`."""
    return Bm25Index(
        postings=spark.read.parquet(f"{path}/postings"),
        dfreq=spark.read.parquet(f"{path}/dfreq"),
        stats=spark.read.parquet(f"{path}/stats"),
    )


def bm25_index(
    docs: DataFrame, doc_id: str = "doc_id", text_col: str = "text"
) -> Bm25Index:
    """Build the BM25 index relations from a corpus — ONE corpus scan, ONE
    data-sized shuffle (the postings aggregation); everything downstream of
    that shuffle is vocabulary- or doc-sized."""
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
    # Corpus stats derive from the postings relation (distinct doc lengths
    # are doc-sized, far below token volume) so the corpus is scanned ONCE
    # total.  N therefore counts docs with >= 1 token — zero-token docs can
    # match no term anyway.
    return _index_from_postings(postings)


def bm25_index_merge(
    old: Bm25Index,
    new_docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    validate: bool = False,
) -> Bm25Index:
    """Incrementally extend an index with an APPEND batch — real corpora
    grow; rebuilding from scratch would rescan the (100 TB) old corpus for
    every append.

    Only ``new_docs`` is scanned: its postings are built fresh (one
    new-batch-sized shuffle) and unioned with the old POSTINGS RELATION;
    dfreq and the corpus stats then re-derive from the unioned postings
    with the exact expressions :func:`bm25_index` uses — the (doc, term,
    tf, dl) set is identical to a full rebuild's (append ids must be
    DISJOINT from the old corpus — this is an append, not an upsert), the
    df counts and N are exact integers, and avgdl is one exact int64 sum
    over distinct doc lengths divided by N, so every BM25 score is
    bit-identical to the full rebuild (test-asserted).  The old index can
    come from :func:`read_bm25_index` — merging never needs the original
    corpus files.

    By default the disjointness contract is NOT checked: an overlapping
    doc id silently yields duplicate (doc, term) postings rows, inflating
    df/N/tf and corrupting every score.  ``validate=True`` opts into an
    eager guard — one semi-join of the new batch's ids against the old
    postings' doc ids (new-batch-sized driver job at merge time, no extra
    old-corpus scan beyond the postings relation itself) that raises on
    any overlap.  For an upsert, remove the stale ids first with
    :func:`bm25_index_remove`."""
    if validate:
        new_ids = new_docs.select(F.col(doc_id).alias("__doc")).distinct()
        overlap = (
            old.postings.select("__doc").join(new_ids, "__doc").limit(1).first()
        )
        if overlap is not None:
            raise ValueError(
                "bm25_index_merge is an APPEND: new_docs contains doc ids "
                "already present in the old index (e.g. "
                f"{overlap['__doc']!r}); merging them would double-"
                "count postings and corrupt scores.  Remove them first "
                "(bm25_index_remove) or rebuild."
            )
    new = bm25_index(new_docs, doc_id=doc_id, text_col=text_col)
    return _index_from_postings(old.postings.unionByName(new.postings))


def bm25_index_remove(old: Bm25Index, doc_ids: DataFrame) -> Bm25Index:
    """Drop documents from an index — the other half of the incremental
    story (:func:`bm25_index_merge` appends): dedup reruns, takedowns, and
    quality-filter sweeps all REMOVE docs from a live corpus, and
    rebuilding from scratch would rescan the 100 TB survivors for every
    deletion batch.

    ``doc_ids`` is a one-column relation of ids to remove (any column
    name).  The removal is a broadcast anti-join on the postings' doc id —
    deletion batches are small by contract, so the postings relation never
    shuffles for it — and dfreq/stats re-derive from the surviving
    postings with the exact :func:`bm25_index` expressions, making every
    score bit-identical to a full rebuild on the surviving corpus
    (test-asserted).  Ids absent from the index are ignored (removal is
    idempotent).  Like merge, this works on an index loaded via
    :func:`read_bm25_index` — the original corpus files are never needed.

    At scale, compact after a deletion burst by ``.write()``-ing the
    returned index: the anti-join filter is carried in the plan until
    then, and a write materializes the survivors once."""
    ids = doc_ids.select(F.col(doc_ids.columns[0]).alias("__doc")).distinct()
    surviving = old.postings.join(F.broadcast(ids), "__doc", "left_anti")
    return _index_from_postings(surviving)


def _index_from_postings(postings: DataFrame) -> Bm25Index:
    """Re-derive the vocabulary- and corpus-level relations from a postings
    relation — the exact expressions :func:`bm25_index` uses, shared by the
    incremental merge/remove paths so their results are bit-identical to a
    rebuild by construction."""
    dfreq = postings.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    stats = (
        postings.select("__doc", "__dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).alias("__n"),
            (F.sum("__dl").cast("double") / F.count(F.lit(1))).alias("__avgdl"),
        )
    )
    return Bm25Index(postings=postings, dfreq=dfreq, stats=stats)


def bm25_search(
    index: Bm25Index,
    queries: DataFrame,
    query_id: str = "query_id",
    query_text: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    broadcast_queries: bool | str = True,
    broadcast_budget_bytes: int = 64 << 20,
) -> DataFrame:
    """Top-``k`` docs per query against an existing :class:`Bm25Index`
    under BM25 (Robertson/Sparck Jones; the Lucene ``+1`` idf variant, so
    idf > 0 even for terms in most docs).

    Query terms are deduplicated (each distinct term contributes once —
    repeating a word in a query does not double its weight).  Returns
    ``(query_id, neighbor_id, score, rank)`` with rank 1..k per query,
    ties broken by ascending ``neighbor_id`` on the rounded score.

    :param broadcast_queries: ``True`` (default — query batches are small
        by construction) keeps the scoring join broadcast: the postings
        side never shuffles and plan construction stays fully lazy.
        ``False`` forces a shuffled join, the opt-out for decontamination
        sweeps against a benchmark collection too large to broadcast.
        ``'auto'`` decides from a one-pass token count of the QUERY side
        against ``broadcast_budget_bytes`` — note this runs an eager
        driver action over the query relation at plan-construction time
        (cache a derived queries relation first if its pipeline is
        expensive).  All paths produce identical scores.
    """
    if broadcast_queries not in (True, False, "auto"):
        raise ValueError(
            "broadcast_queries must be True, False, or 'auto'; got "
            f"{broadcast_queries!r}"
        )
    if broadcast_queries == "auto":
        # Resolved BEFORE qterms is built (r12) so the query-side
        # broadcast hint below can key off the final decision.
        est_rows = (
            queries.select(
                F.sum(F.coalesce(F.size(text.tokens(query_text)), F.lit(0)))
            ).first()[0]
            or 0
        )
        broadcast_queries = est_rows * _QTERM_ROW_BYTES <= broadcast_budget_bytes
    q_distinct = queries.select(
        F.col(query_id).alias("__qid"),
        F.explode(text.tokens(query_text)).alias("__term"),
    ).distinct()
    if broadcast_queries is True:
        # Broadcast the DISTINCT QUERY-TERM side of the dfreq join
        # explicitly (r12): left to size estimates, Spark broadcast the
        # vocabulary-sized dfreq relation instead — backwards at any
        # scale (the query-term set is bounded by the query batch, the
        # vocabulary by the corpus), and the dfreq side keeps the
        # partitioning its aggregation exchange just produced.  Scores
        # identical (inner join, either build side).
        q_distinct = F.broadcast(q_distinct)
    qterms = (
        q_distinct
        .join(index.dfreq, "__term")
        .crossJoin(F.broadcast(index.stats))
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

    # Broadcast the (queries x terms)-sized weight table on the default
    # path: the big postings side never shuffles for this join, and
    # non-matching postings are dropped before the scoring aggregation.
    # The opt-out (a decontamination sweep against a large benchmark
    # collection) falls back to a shuffled hash join on the term — one
    # postings-sized exchange, but no OOM-ing broadcast.
    if broadcast_queries:
        weighted = F.broadcast(qterms)
    else:
        weighted = qterms.hint("shuffle_hash")
    contrib = index.postings.join(weighted, "__term").select(
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
    broadcast_queries: bool | str = "auto",
    broadcast_budget_bytes: int = 64 << 20,
) -> DataFrame:
    """One-shot BM25 top-``k``: build the index and search it in a single
    lazy plan.  For repeated query batches against the same corpus, build
    the index once with :func:`bm25_index` and ``.persist()`` it — this
    wrapper re-derives the postings per call.

    Default ``broadcast_queries='auto'``: one-shot callers may hand in a
    decontamination-scale query relation, so the broadcast decision is
    sized rather than assumed (``bm25_search`` keeps ``True`` — its
    contract is repeated SMALL batches against a persisted index, where
    eager sizing per batch would cost an extra job each call).

    The postings relation is materialized ONCE per call via a lazy local
    checkpoint (r11).  Left fully lazy, the one-shot plan pays the corpus
    scan + tokenize + explode + postings aggregation THREE times — the
    scoring join, dfreq, and stats branches each re-derive it, and column
    pruning specializes each branch's partial aggregate so Spark's
    exchange reuse never fires (measured: the sf0.1 plan carried three
    `Scan parquet -> Generate -> HashAggregate` pipelines and ~48 CPU-s
    for ~3 s of wall).  Checkpointing the postings RDD collapses that to
    one corpus pass; dfreq/stats then re-aggregate the materialized
    postings (token-relation-sized, disk-backed past memory).  Eagerness
    is deferred (``eager=False``) so plan construction stays lazy; the
    blocks live only for this call's lineage and are recomputed from the
    parquet inputs on every invocation.  Note the standard localCheckpoint
    caveat: losing an executor mid-query fails the job instead of
    recomputing (non-issue for a one-shot call; serving flows use
    ``Bm25Index.write``/``persist`` instead)."""
    index = bm25_index(docs, doc_id=doc_id, text_col=text_col)
    return bm25_search(
        _index_from_postings(index.postings.localCheckpoint(eager=False)),
        queries,
        query_id=query_id,
        query_text=query_text,
        k=k,
        k1=k1,
        b=b,
        broadcast_queries=broadcast_queries,
        broadcast_budget_bytes=broadcast_budget_bytes,
    )
