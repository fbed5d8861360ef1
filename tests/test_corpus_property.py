"""Property-based parity for the round-4 corpus operators: on arbitrary
small corpora, the Spark plans must agree with direct pure-Python
re-implementations of the math.

Corpus strategy: a tiny vocabulary (collisions between docs are the
interesting case — uniform random words would almost never produce shared
windows or terms), variable doc lengths, a handful of docs.  One shared
Spark session; hypothesis deadline disabled (Spark latency dominates)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from efficient_trees_spark.operators.dedup import duplicate_window_spans
from efficient_trees_spark.operators.retrieval import bm25_topk

VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


def _py_spans(texts: list[str], n: int, min_docs: int):
    toks = [t.split() if t else [] for t in texts]
    windows: dict[tuple, set[int]] = {}
    starts_by_doc: dict[int, list[int]] = {}
    for d, tk in enumerate(toks):
        for s in range(len(tk) - n + 1):
            windows.setdefault(tuple(tk[s : s + n]), set()).add(d)
    dup = {w for w, ds in windows.items() if len(ds) >= min_docs}
    for d, tk in enumerate(toks):
        starts_by_doc[d] = [
            s for s in range(len(tk) - n + 1) if tuple(tk[s : s + n]) in dup
        ]
    out = {}
    for d, tk in enumerate(toks):
        starts = starts_by_doc[d]
        covered = set()
        spans = 0
        prev_end = -1
        for s in starts:
            covered.update(range(s, s + n))
            if s > prev_end:
                spans += 1
            prev_end = s + n - 1
        out[d] = (len(tk), len(starts), spans, len(covered))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=docs_strategy)
def test_duplicate_window_spans_matches_python_oracle(spark, texts):
    n = 3
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.dup_windows, r.n_spans, r.covered_tokens)
        for r in duplicate_window_spans(df, "doc_id", "text", n=n, min_docs=2).collect()
    }
    assert got == _py_spans(texts, n, 2)


def _py_bm25(texts: list[str], qterms: list[str], k1=1.2, b=0.75):
    toks = [t.split() if t else [] for t in texts]
    lens = {d: len(tk) for d, tk in enumerate(toks) if tk}
    if not lens:
        return {}
    n_docs = len(lens)
    avgdl = sum(lens.values()) / n_docs
    dfreq: dict[str, int] = {}
    for tk in toks:
        for term in set(tk):
            dfreq[term] = dfreq.get(term, 0) + 1
    scores: dict[int, float] = {}
    for d, tk in enumerate(toks):
        s = 0.0
        for term in set(qterms):
            tf = tk.count(term)
            if tf == 0 or term not in dfreq:
                continue
            idf = math.log((n_docs - dfreq[term] + 0.5) / (dfreq[term] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(tk) / avgdl))
        if s > 0:
            scores[d] = round(s, 6)
    return scores


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=docs_strategy,
    query=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3).map(" ".join),
)
def test_bm25_matches_python_oracle(spark, texts, query):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    qdf = spark.createDataFrame([(0, query)], "query_id long, query_text string")
    got = {
        r.neighbor_id: r.score
        for r in bm25_topk(docs, qdf, k=100).collect()
    }
    exp = _py_bm25(texts, query.split())
    assert set(got) == set(exp)
    for d, s in exp.items():
        assert abs(got[d] - s) < 2e-6, (d, got[d], s)
