"""Statistical language-model quality scoring (corpus-fit unigram +
bigram-with-stupid-backoff).

CCNet-style pipelines bucket documents by LM perplexity (Wenzek et al.,
"CCNet", 2020 — a KenLM 5-gram scores each doc and the corpus splits into
head/middle/tail quality buckets).  The full KenLM model is an external
artifact; these relational forms cover the same signal in-engine: the
UNIGRAM pass separates common-word prose from rare-token soup, and the
BIGRAM pass with stupid backoff (Brants et al. 2007 — the web-scale
smoothing: no discounting, a fixed backoff factor to the unigram) adds
word-order sensitivity, with no model file to ship.

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

import math

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


# ------------------------------------------------------ bigram + backoff


def fit_bigram(
    docs: DataFrame, text_col: str = "text", alpha: float = 0.5
) -> DataFrame:
    """Conditional bigram log-probabilities with add-``alpha`` smoothing:
    ``(prev, token, logcp)`` where
    ``P(token | prev) = (c(prev, token) + alpha) / (c(prev) + alpha * (V + 1))``
    and ``V`` is the unigram vocabulary.  Output is bigram-vocabulary-sized;
    the pair relation is built map-side (zip of the token array with its
    own tail — no self-join, no window)."""
    from efficient_trees_spark.sources.io import fan_out_small_input

    toks = text.tokens(text_col)
    pairs = (
        fan_out_small_input(docs)
        .select(toks.alias("__toks"))
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("__toks", 1, F.greatest(F.size("__toks") - 1, F.lit(0))),
                    F.slice("__toks", 2, F.greatest(F.size("__toks") - 1, F.lit(0))),
                )
            ).alias("p")
        )
        .select(F.col("p.0").alias("prev"), F.col("p.1").alias("token"))
    )
    counts = pairs.groupBy("prev", "token").agg(F.count(F.lit(1)).alias("n"))
    prev_tot = counts.groupBy("prev").agg(F.sum("n").alias("prev_n"))
    vocab = (
        pairs.select(F.col("token").alias("t"))
        .unionByName(pairs.select(F.col("prev").alias("t")))
        .agg(F.count_distinct("t").alias("vocab"))
    )
    return (
        counts.join(prev_tot, "prev")
        .crossJoin(F.broadcast(vocab))
        .select(
            "prev",
            "token",
            F.log(
                (F.col("n") + F.lit(alpha))
                / (F.col("prev_n") + F.lit(alpha) * (F.col("vocab") + F.lit(1)))
            ).alias("logcp"),
        )
    )


def score_bigram_backoff(
    docs: DataFrame,
    bigram: DataFrame,
    unigram: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    backoff: float = 0.4,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-doc mean log-prob under the bigram model with STUPID BACKOFF
    (Brants et al., "Large Language Models in Machine Translation", 2007 —
    the web-scale scheme: no discounting, unseen bigrams fall back to
    ``log(backoff) + unigram logp``).  The first token of each doc scores
    by unigram.  Returns ``(id, n_tokens, mean_logprob)`` over all docs
    (zero-token docs score NULL).

    Relational shape: doc bigram positions left-join the bigram table on
    (prev, token); misses left-join the unigram table on token, with the
    smoothed unigram floor for tokens outside the fit corpus — three
    key-distributed joins against vocabulary-sized build sides, one per-doc
    reduction, no windows."""
    from efficient_trees_spark.sources.io import fan_out_small_input

    toks = text.tokens(text_col)
    base = fan_out_small_input(docs).select(
        F.col(id_col), F.coalesce(toks, F.array().cast("array<string>")).alias("__toks")
    )
    # position 1 -> (prev=NULL, token), scored by plain unigram (no backoff
    # penalty: there is no bigram context to have missed); positions 2..n ->
    # (prev, token), bigram first, stupid backoff on a miss.
    first = base.filter(F.size("__toks") >= 1).select(
        F.col(id_col),
        F.lit(None).cast("string").alias("prev"),
        F.element_at("__toks", 1).alias("token"),
        F.lit(True).alias("__is_first"),
    )
    rest = base.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice("__toks", 1, F.greatest(F.size("__toks") - 1, F.lit(0))),
                F.slice("__toks", 2, F.greatest(F.size("__toks") - 1, F.lit(0))),
            )
        ).alias("p"),
    ).select(
        F.col(id_col),
        F.col("p.0").alias("prev"),
        F.col("p.1").alias("token"),
        F.lit(False).alias("__is_first"),
    )
    positions = first.unionByName(rest)

    uni_totals = unigram.select(
        F.col("total").alias("__t"), F.col("vocab").alias("__v")
    ).limit(1)
    uni = unigram.select("token", F.col("logp").alias("__uni_lp"))
    big = bigram.select("prev", "token", F.col("logcp").alias("__bi_lp"))

    smoothed_uni = F.coalesce(
        F.col("__uni_lp"),
        F.log(
            F.lit(alpha) / (F.col("__t") + F.lit(alpha) * (F.col("__v") + F.lit(1)))
        ),
    )
    scored = (
        positions.join(big, ["prev", "token"], "left")
        .join(uni, "token", "left")
        .crossJoin(F.broadcast(uni_totals))
        .select(
            F.col(id_col),
            F.when(F.col("__is_first"), smoothed_uni)
            .otherwise(
                F.coalesce(
                    F.col("__bi_lp"), F.lit(math.log(backoff)) + smoothed_uni
                )
            )
            .alias("lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.avg("lp").alias("mean_logprob"),
    )
    return (
        docs.select(F.col(id_col)).distinct()
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "mean_logprob",
        )
    )
