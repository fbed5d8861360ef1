"""Unigram LM quality scoring (operators/lm.py) vs a pure-Python oracle."""

import math

from pyspark.sql import functions as F

from efficient_trees_spark.operators.lm import fit_unigram, score_unigram_logprob

ALPHA = 0.5

FIT = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "cat and dog and cat"),
]


def _py_model(texts):
    counts: dict[str, int] = {}
    for t in texts:
        for tok in t.split():
            counts[tok] = counts.get(tok, 0) + 1
    total = sum(counts.values())
    vocab = len(counts)
    denom = total + ALPHA * (vocab + 1)
    return counts, total, vocab, denom


def _py_score(text, counts, denom):
    toks = text.split()
    if not toks:
        return 0, None
    lps = [math.log((counts.get(t, 0) + ALPHA) / denom) for t in toks]
    return len(toks), sum(lps) / len(lps)


def test_model_probabilities_match_python(spark):
    docs = spark.createDataFrame(FIT, "doc_id long, text string")
    model = fit_unigram(docs, alpha=ALPHA)
    counts, total, vocab, denom = _py_model([t for _, t in FIT])
    got = {r.token: r.logp for r in model.collect()}
    assert set(got) == set(counts)
    for tok, n in counts.items():
        assert abs(got[tok] - math.log((n + ALPHA) / denom)) < 1e-12
    row = model.first()
    assert (row.total, row.vocab) == (total, vocab)


def test_doc_scores_match_python_incl_unseen_and_empty(spark):
    docs = spark.createDataFrame(FIT, "doc_id long, text string")
    model = fit_unigram(docs, alpha=ALPHA)
    counts, _, _, denom = _py_model([t for _, t in FIT])

    score_docs = spark.createDataFrame(
        [
            (10, "the cat"),           # all seen
            (11, "zebra quux"),        # all unseen -> smoothed floor
            (12, "the zebra"),         # mixed
            (13, ""),                  # empty -> NULL score
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.mean_logprob)
        for r in score_unigram_logprob(score_docs, model).collect()
    }
    for doc_id, text in [(10, "the cat"), (11, "zebra quux"), (12, "the zebra")]:
        n, lp = _py_score(text, counts, denom)
        assert got[doc_id][0] == n
        assert abs(got[doc_id][1] - lp) < 1e-12, (doc_id, got[doc_id][1], lp)
    assert got[13] == (0, None)


def test_common_prose_outscores_rare_token_soup(spark):
    docs = spark.createDataFrame(FIT, "doc_id long, text string")
    model = fit_unigram(docs, alpha=ALPHA)
    probe = spark.createDataFrame(
        [(1, "the cat sat"), (2, "qq zz xx vv")], "doc_id long, text string"
    )
    got = {r.doc_id: r.mean_logprob for r in score_unigram_logprob(probe, model).collect()}
    assert got[1] > got[2]


def test_model_is_vocabulary_sized_and_scoring_plan_is_sane(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    model = fit_unigram(docs)
    assert model.count() == model.select("token").distinct().count()
    plan = (
        score_unigram_logprob(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # every doc present, scored docs carry finite scores
    out = score_unigram_logprob(docs, model)
    assert out.count() == docs.count()
    assert out.filter(F.col("mean_logprob").isNull() & (F.col("n_tokens") > 0)).count() == 0


# ------------------------------------------------------ bigram + backoff


def _py_bigram(texts, alpha=0.5):
    from collections import Counter

    pair_counts: Counter = Counter()
    prev_counts: Counter = Counter()
    vocab = set()
    for t in texts:
        toks = t.split()
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            pair_counts[(a, b)] += 1
            prev_counts[a] += 1
    v = len(vocab)
    return pair_counts, prev_counts, v


def _py_bigram_score(text, pair_counts, prev_counts, v, uni_counts, uni_denom,
                     alpha=0.5, backoff=0.4):
    toks = text.split()
    if not toks:
        return 0, None
    def uni(t):
        return math.log((uni_counts.get(t, 0) + alpha) / uni_denom)
    lps = [uni(toks[0])]
    for a, b in zip(toks, toks[1:]):
        if (a, b) in pair_counts:
            lps.append(math.log(
                (pair_counts[(a, b)] + alpha) / (prev_counts[a] + alpha * (v + 1))
            ))
        else:
            lps.append(math.log(backoff) + uni(b))
    return len(toks), sum(lps) / len(lps)


def test_bigram_scores_match_python_incl_backoff_and_first_token(spark):
    from efficient_trees_spark.operators.lm import fit_bigram, score_bigram_backoff

    docs = spark.createDataFrame(FIT, "doc_id long, text string")
    uni = fit_unigram(docs, alpha=ALPHA)
    big = fit_bigram(docs, alpha=ALPHA)

    uni_counts, _, _, uni_denom = _py_model([t for _, t in FIT])
    pair_counts, prev_counts, v = _py_bigram([t for _, t in FIT])

    probe = spark.createDataFrame(
        [
            (10, "the cat sat"),      # seen bigrams
            (11, "cat the"),          # unseen bigram -> backoff
            (12, "zebra"),            # single unseen token -> unigram floor
            (13, ""),                 # empty -> NULL
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.mean_logprob)
        for r in score_bigram_backoff(probe, big, uni).collect()
    }
    for doc_id, text_ in [(10, "the cat sat"), (11, "cat the"), (12, "zebra")]:
        n, lp = _py_bigram_score(
            text_, pair_counts, prev_counts, v, uni_counts, uni_denom
        )
        assert got[doc_id][0] == n
        assert abs(got[doc_id][1] - lp) < 1e-12, (doc_id, got[doc_id][1], lp)
    assert got[13] == (0, None)


def test_bigram_model_rewards_word_order(spark):
    from efficient_trees_spark.operators.lm import fit_bigram, score_bigram_backoff

    docs = spark.createDataFrame(FIT, "doc_id long, text string")
    uni, big = fit_unigram(docs), fit_bigram(docs)
    probe = spark.createDataFrame(
        [(1, "the cat sat"), (2, "sat cat the")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.mean_logprob
        for r in score_bigram_backoff(probe, big, uni).collect()
    }
    # Same bag of words: the in-order phrase must outscore the scrambled one
    # (that is the whole point over the unigram model).
    assert got[1] > got[2]
