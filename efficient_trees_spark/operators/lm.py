"""Statistical language-model quality scoring (unigram, corpus-fit).

CCNet-style pipelines bucket documents by LM perplexity (Wenzek et al.,
"CCNet", 2020 — a KenLM 5-gram scores each doc and the corpus splits into
head/middle/tail quality buckets).  The full n-gram model is an external
artifact; the UNIGRAM form fits in one aggregation and is the honest
relational first pass: it already separates common-word prose from
rare-token soup / boilerplate ID dumps, with no model file to ship.

Scale shape:

* the unigram table is ONE map-side-combined ``groupBy(token)`` over the
  exploded corpus — vocabulary-sized output regardless of corpus size;
* corpus totals (token count, vocabulary size) are a tiny aggregate
  broadcast back into the probability expression;
* per-doc scoring re-joins exploded tokens to the frequency table on the
  token key (vocabulary-sized build side — broadcastable for real
  vocabularies) and reduces with one ``groupBy(doc)``;
* smoothing is add-alpha over the training vocabulary, so unseen tokens
  (score-time docs outside the fit corpus) still get finite mass.

Reference scope note: the reference engine has no text surface; this is
extension inventory alongside ``functions/text.py`` quality heuristics —
the two signals are complementary (heuristics catch structure, the LM
catches token-distribution weirdness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from efficient_trees_spark.functions import text


def fit_unigram(
    docs: DataFrame, text_col: str = "text", alpha: float = 0.5
) -> DataFrame:
    """Corpus unigram log-probabilities with add-``alpha`` smoothing:
    ``(token, logp)`` where ``p = (count + alpha) / (total + alpha * (V + 1))``
    — the ``+ 1`` reserves one smoothed slot for unseen tokens.  Output is
    vocabulary-sized."""
    from efficient_trees_spark.sources.io import fan_out_small_input

    toks = (
        fan_out_small_input(docs)
        .select(F.explode(text.tokens(text_col)).alias("token"))
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "token",
        F.log(
            (F.col("n") + F.lit(alpha))
            / (F.col("total") + F.lit(alpha) * (F.col("vocab") + F.lit(1)))
        ).alias("logp"),
        "total",
        "vocab",
    )


def score_unigram_logprob(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-doc mean token log-prob under a :func:`fit_unigram` model —
    ``(id, n_tokens, mean_logprob)``, higher = more ordinary text.  Docs
    with zero tokens score NULL (no evidence either way); unseen tokens get
    the smoothed floor ``log(alpha / (total + alpha * (V + 1)))``."""
    from efficient_trees_spark.sources.io import fan_out_small_input

    exploded = fan_out_small_input(docs).select(
        F.col(id_col), F.explode(text.tokens(text_col)).alias("token")
    )
    joined = exploded.join(model.select("token", "logp"), "token", "left")
    # The unseen-token floor needs the model totals, which unmatched rows
    # don't carry — broadcast the one-row totals alongside.
    totals = model.select(
        F.col("total").alias("__t"), F.col("vocab").alias("__v")
    ).limit(1)
    scored = joined.crossJoin(F.broadcast(totals)).select(
        F.col(id_col),
        F.coalesce(
            F.col("logp"),
            F.log(
                F.lit(alpha) / (F.col("__t") + F.lit(alpha) * (F.col("__v") + F.lit(1)))
            ),
        ).alias("lp"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.avg("lp").alias("mean_logprob"),
    )
    all_docs = docs.select(F.col(id_col)).distinct()
    return all_docs.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        "mean_logprob",
    )
