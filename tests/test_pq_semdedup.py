"""Product quantization + SemDeDup.

* PQ encode must be a map-only projection (no shuffle, no Python) and agree
  with a straight numpy re-derivation of argmin-of-rounded-L2² per subspace.
* train_pq_codebooks is deterministic and reduces quantization error vs the
  seed-sampled codebooks it initializes from.
* ADC retrieval must give an exact duplicate of a query the best achievable
  score (ADC to one's own codes is the minimum over all code assignments).
* semantic_dedup canonicalizes within cells only — a crafted near-dup pair
  in the same cell collapses; the same pair split across cells survives.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import numpy as np
import pytest
from pyspark.sql import functions as F

from efficient_trees_spark.operators import similarity


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vid long, vec array<double>",
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).tolist()
    return _vec_df(spark, list(enumerate(vecs)))


@pytest.fixture(scope="module")
def books(corpus):
    seeds = corpus.filter("vid % 10 = 1")  # 4 deterministic seeds
    return similarity.pq_codebooks_from_seeds(seeds, "vid", "vec", m=4)


def test_codebook_shapes(books):
    assert len(books) == 4  # m subspaces
    assert all(len(b) == 4 for b in books)  # ksub = seed count
    assert all(len(e) == 2 for b in books for e in b)  # dim/m floats


def test_pq_encode_matches_numpy(spark, corpus, books):
    got = {
        r["vid"]: list(r["codes"])
        for r in similarity.pq_encode(corpus, "vid", "vec", books).collect()
    }
    rows = corpus.orderBy("vid").collect()
    cb = np.asarray(books)  # (m, ksub, sub)
    m, _, sub = cb.shape
    for r in rows:
        v = np.asarray(r["vec"], dtype=np.float64)
        u = v / np.sqrt((v * v).sum())
        expect = []
        for j in range(m):
            d = np.round(
                ((u[j * sub : (j + 1) * sub] - cb[j]) ** 2).sum(axis=1), 6
            )
            expect.append(int(d.argmin()))  # argmin ties -> lowest code
        assert got[r["vid"]] == expect, r["vid"]


def test_pq_encode_is_map_only(corpus, books):
    plan = plan_of(similarity.pq_encode(corpus, "vid", "vec", books))
    assert "Exchange" not in plan
    # pure Catalyst expressions — no Python UDF/Arrow evaluation nodes
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas"):
        assert node not in plan


def test_trained_codebooks_reduce_error(spark, corpus, books):
    trained = similarity.train_pq_codebooks(
        corpus, "vid", "vec", m=4, ksub=4, n_iters=10, sample_n=1000
    )
    # Determinism: same inputs, same books.
    again = similarity.train_pq_codebooks(
        corpus, "vid", "vec", m=4, ksub=4, n_iters=10, sample_n=1000
    )
    assert trained == again

    def total_err(cbs):
        cb = np.asarray(cbs)
        m, _, sub = cb.shape
        err = 0.0
        for r in corpus.collect():
            v = np.asarray(r["vec"], dtype=np.float64)
            u = v / np.sqrt((v * v).sum())
            for j in range(m):
                err += ((u[j * sub : (j + 1) * sub] - cb[j]) ** 2).sum(axis=1).min()
        return err

    assert total_err(trained) < total_err(books)


def test_adc_ranks_exact_duplicate_first(spark, books):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(20, 8))
    vecs[13] = vecs[0]  # vid 13 duplicates vid 0
    corpus = _vec_df(spark, list(enumerate(vecs.tolist())))
    queries = corpus.filter("vid = 0")
    top = similarity.pq_adc_topk(
        corpus, queries, books, "vid", "vec", k=20
    ).orderBy("rank").collect()
    # An identical vector gets identical codes, and ADC against one's own
    # codes is the MINIMUM over all code assignments (each subspace argmin
    # minimizes its term) — so the duplicate must share the best score.
    # Other vectors may collide into the same codes (quantization); ties
    # then break on id.
    dup = next(r for r in top if r["neighbor_id"] == 13)
    assert dup["cos"] == top[0]["cos"]


def test_ivf_pq_restricts_to_probed_cells_with_pq_identical_scores(spark, corpus, books):
    """ivf_pq_topk = pq_adc_topk restricted to the IVF candidate set: every
    returned neighbor's cell must be one of its query's nprobe cells, and
    every returned (query, neighbor) score must BIT-match the unrestricted
    PQ run (same exact-integer ADC)."""
    seeds = corpus.filter("vid % 10 = 1")
    centroids = seeds.select(F.col("vid").alias("cid"), F.col("vec").alias("cvec"))
    queries = corpus.filter("vid % 7 = 0")
    out = similarity.ivf_pq_topk(
        corpus, queries, centroids, books, "vid", "vec", k=3, nprobe=2
    ).collect()
    assert out, "composition returned nothing"

    cells = {
        r["vid"]: r["cell"]
        for r in similarity.nearest_centroids(
            corpus, centroids, "vid", "vec", nprobe=1
        ).collect()
    }
    probed = {}
    for r in similarity.nearest_centroids(
        queries, centroids, "vid", "vec", nprobe=2
    ).collect():
        probed.setdefault(r["vid"], set()).add(r["cell"])
    for r in out:
        assert cells[r["neighbor_id"]] in probed[r["query_id"]]

    pq_scores = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in similarity.pq_adc_topk(
            corpus, queries, books, "vid", "vec", k=40
        ).collect()
    }
    for r in out:
        assert pq_scores[(r["query_id"], r["neighbor_id"])] == r["cos"]

    again = similarity.ivf_pq_topk(
        corpus.repartition(5), queries, centroids, books, "vid", "vec", k=3, nprobe=2
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_ivf_pq_residual_matches_numpy_oracle(spark, corpus):
    """Residual IVFPQ (ivf_pq_topk residual=True) against a straight numpy
    re-derivation of the whole pipeline: cell assignment by rounded cosine
    (cid tie-break), residual r = u − c(cell), per-subspace argmin of
    rounded L2² for codes, per-(query, probed cell) integer-micro distance
    tables, exact integer ADC score, (score desc, id asc) ranking."""
    seeds = corpus.filter("vid % 10 = 1")
    centroids = seeds.select(F.col("vid").alias("cid"), F.col("vec").alias("cvec"))
    books = similarity.train_pq_residual_codebooks(
        corpus, centroids, "vid", "vec", m=4, ksub=4, n_iters=5, sample_n=1000
    )
    queries = corpus.filter("vid % 7 = 0")
    K, NPROBE = 3, 2
    got = similarity.ivf_pq_topk(
        corpus, queries, centroids, books, "vid", "vec",
        k=K, nprobe=NPROBE, residual=True,
    ).collect()
    assert got, "residual composition returned nothing"

    # ---- numpy oracle ----
    vecs = {r["vid"]: np.asarray(r["vec"], dtype=np.float64) for r in corpus.collect()}
    cents = {r["cid"]: np.asarray(r["cvec"], dtype=np.float64) for r in centroids.collect()}
    cb = np.asarray(books)  # (m, ksub, sub)
    m, _, sub = cb.shape
    scale = 10**6

    def unit(v):
        n = np.sqrt((v * v).sum())
        return v / n if n > 0 else v

    def probe(v, n):
        ranked = sorted(
            (
                (-np.round(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)), 6), cid)
                for cid, c in cents.items()
            )
        )
        return [cid for _, cid in ranked[:n]]

    def codes_of(r):
        return [
            int(np.round(((r[j * sub : (j + 1) * sub] - cb[j]) ** 2).sum(axis=1), 6).argmin())
            for j in range(m)
        ]

    corpus_enc = {}  # vid -> (cell, codes)
    for vid, v in vecs.items():
        cell = probe(v, 1)[0]
        corpus_enc[vid] = (cell, codes_of(unit(v) - cents[cell]))

    expect = {}
    for qid in [v for v in vecs if v % 7 == 0]:
        scored = []
        probed = probe(vecs[qid], NPROBE)
        tables = {}
        for cell in probed:
            qr = unit(vecs[qid]) - cents[cell]
            tables[cell] = [
                np.round(
                    ((qr[j * sub : (j + 1) * sub] - cb[j]) ** 2).sum(axis=1) * scale
                ).astype(np.int64)
                for j in range(m)
            ]
        for nid, (cell, codes) in corpus_enc.items():
            if nid == qid or cell not in tables:
                continue
            total = sum(int(tables[cell][j][codes[j]]) for j in range(m))
            score = (10 * scale - 5 * total) / (10.0 * scale)
            scored.append((-score, nid))
        for rank, (neg, nid) in enumerate(sorted(scored)[:K], start=1):
            expect[(qid, nid)] = (-neg, rank)

    assert {(r["query_id"], r["neighbor_id"]): (r["cos"], r["rank"]) for r in got} == expect

    # partitioning-independence: exact integer ADC is associative
    again = similarity.ivf_pq_topk(
        corpus.repartition(5), queries, centroids, books, "vid", "vec",
        k=K, nprobe=NPROBE, residual=True,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_ivf_pq_rerank_is_exact_cosine_over_the_adc_shortlist(spark, corpus):
    """rerank=k' pins to: take the ADC top-k' pairs (exactly what
    ivf_pq_topk(k=k') returns), score THOSE pairs with true cosine, rank
    (cos desc, id asc), cut at k.  Derived here from the engine's own
    un-reranked output plus a numpy exact-cosine oracle — so the test pins
    both the shortlist identity and the re-ranked scores."""
    seeds = corpus.filter("vid % 10 = 1")
    centroids = seeds.select(F.col("vid").alias("cid"), F.col("vec").alias("cvec"))
    books = similarity.train_pq_residual_codebooks(
        corpus, centroids, "vid", "vec", m=4, ksub=4, n_iters=5, sample_n=1000
    )
    queries = corpus.filter("vid % 7 = 0")
    K, KP, NPROBE = 3, 8, 2
    got = similarity.ivf_pq_topk(
        corpus, queries, centroids, books, "vid", "vec",
        k=K, nprobe=NPROBE, residual=True, rerank=KP,
    ).collect()
    assert got, "re-ranked composition returned nothing"

    shortlist = similarity.ivf_pq_topk(
        corpus, queries, centroids, books, "vid", "vec",
        k=KP, nprobe=NPROBE, residual=True,
    ).collect()
    vecs = {r["vid"]: np.asarray(r["vec"], dtype=np.float64) for r in corpus.collect()}

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    expect = {}
    by_query: dict = {}
    for r in shortlist:
        by_query.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for qid, nids in by_query.items():
        ranked = sorted(
            ((-cos(vecs[qid], vecs[nid]), nid) for nid in nids)
        )[:K]
        for rank, (neg, nid) in enumerate(ranked, start=1):
            expect[(qid, nid)] = (-neg, rank)
    assert {
        (r["query_id"], r["neighbor_id"]): (r["cos"], r["rank"]) for r in got
    } == expect

    with pytest.raises(ValueError, match="rerank must be >= k"):
        similarity.ivf_pq_topk(
            corpus, queries, centroids, books, "vid", "vec",
            k=5, nprobe=2, residual=True, rerank=3,
        )


def test_ivf_pq_rerank_recall_at_least_unreranked(spark):
    """On clustered data, exact re-rank of a 4k shortlist must recover at
    least the recall of the plain ADC cut — quantization error can demote a
    true neighbor below rank k but re-ranking restores any that made the
    shortlist."""
    rng = np.random.default_rng(23)
    anchors = rng.normal(size=(8, 8))
    anchors /= np.linalg.norm(anchors, axis=1)[:, None]
    rows = [
        (i, (anchors[i % 8] + 0.15 * rng.normal(size=8)).tolist())
        for i in range(240)
    ]
    corpus = _vec_df(spark, rows)
    queries = _vec_df(
        spark,
        [(1000 + j, (anchors[j % 8] + 0.15 * rng.normal(size=8)).tolist())
         for j in range(8)],
    )
    centroids = spark.createDataFrame(
        [(c, a.tolist()) for c, a in enumerate(anchors)],
        "cid long, cvec array<double>",
    )
    K, NPROBE = 5, 1
    books = similarity.train_pq_residual_codebooks(
        corpus, centroids, "vid", "vec", m=4, ksub=4, n_iters=5, sample_n=1000
    )

    def unit(v):
        v = np.asarray(v, dtype=np.float64)
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    cvecs = {r[0]: unit(r[1]) for r in rows}
    truth = {}
    for qid, qv in [(1000 + j, q[1]) for j, q in enumerate(queries.collect())]:
        qu = unit(qv)
        scored = sorted(
            ((float(qu @ dv), did) for did, dv in cvecs.items()),
            key=lambda t: (-round(t[0], 6), t[1]),
        )
        truth[qid] = {did for _, did in scored[:K]}

    def recall(result_df):
        got = {}
        for r in result_df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(got.get(q, set()) & t) for q, t in truth.items())

    base = similarity.ivf_pq_topk(
        corpus, queries, centroids, books, "vid", "vec",
        k=K, nprobe=NPROBE, residual=True,
    )
    reranked = similarity.ivf_pq_topk(
        corpus, queries, centroids, books, "vid", "vec",
        k=K, nprobe=NPROBE, residual=True, rerank=4 * K,
    )
    r_base, r_rerank = recall(base), recall(reranked)
    assert r_rerank >= r_base
    assert r_rerank > 0


def test_residual_codebooks_reduce_reconstruction_error(spark):
    """The point of residual encoding: quantizing x − c(x) with the same
    codebook budget reconstructs x (as c + r̂) with LESS error than
    quantizing x directly (as x̂) — the structural recall win.  Uses
    CLUSTERED data (anchors + small noise): residual encoding's advantage
    is exactly that cell centroids absorb the between-cluster variance,
    leaving PQ only the small within-cluster remainder."""
    rng = np.random.default_rng(3)
    anchors = rng.normal(size=(4, 8))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    rows = []
    for i in range(80):
        v = anchors[i % 4] + rng.normal(scale=0.08, size=8)
        rows.append((i, v.tolist()))
    corpus = _vec_df(spark, rows)
    centroids = spark.createDataFrame(
        [(c, a.tolist()) for c, a in enumerate(anchors)],
        "cid long, cvec array<double>",
    )
    plain = similarity.train_pq_codebooks(corpus, "vid", "vec", m=4, ksub=4, n_iters=5, sample_n=1000)
    resid = similarity.train_pq_residual_codebooks(
        corpus, centroids, "vid", "vec", m=4, ksub=4, n_iters=5, sample_n=1000
    )
    cents = {r["cid"]: np.asarray(r["cvec"], dtype=np.float64) for r in centroids.collect()}
    cp = np.asarray(plain)
    cr = np.asarray(resid)
    m, _, sub = cp.shape

    def unit(v):
        n = np.sqrt((v * v).sum())
        return v / n if n > 0 else v

    def nearest_cell(v):
        return min(
            cents, key=lambda cid: (-np.round(
                v @ cents[cid] / (np.linalg.norm(v) * np.linalg.norm(cents[cid])), 6
            ), cid)
        )

    err_plain = err_resid = 0.0
    for r in corpus.collect():
        u = unit(np.asarray(r["vec"], dtype=np.float64))
        # plain: x̂ = concat of nearest entries to u's slices
        # residual: x̂ = c + concat of nearest entries to (u − c)'s slices
        c = cents[nearest_cell(u)]
        ru = u - c
        for j in range(m):
            s = slice(j * sub, (j + 1) * sub)
            err_plain += ((u[s] - cp[j]) ** 2).sum(axis=1).min()
            err_resid += ((ru[s] - cr[j]) ** 2).sum(axis=1).min()
    assert err_resid < err_plain


def test_semantic_dedup_in_cell_vs_cross_cell(spark):
    # Two well-separated cell anchors; a near-dup pair around anchor A.
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    near_a1 = [0.999, 0.01, 0.0, 0.0]
    near_a2 = [0.998, 0.012, 0.0, 0.0]
    corpus = _vec_df(spark, [(0, a), (1, b), (2, near_a1), (3, near_a2)])
    cents = spark.createDataFrame(
        [(0, a), (1, b)], "cid long, cvec array<double>"
    )
    got = {
        r["vid"]: r["canonical_id"]
        for r in similarity.semantic_dedup(
            corpus, cents, "vid", "vec", threshold=0.99, max_cell_size=None
        ).collect()
    }
    # 0, 2, 3 share cell 0 and are mutually cos>=0.99 -> canonical 0; b alone.
    assert got == {0: 0, 1: 1, 2: 0, 3: 0}

    # Same pair but with centroids that split them into different cells:
    # no in-cell neighbor -> nothing collapses.
    cents2 = spark.createDataFrame(
        [(0, near_a1), (1, near_a2)], "cid long, cvec array<double>"
    )
    pair = _vec_df(spark, [(2, near_a1), (3, near_a2)])
    got2 = {
        r["vid"]: r["canonical_id"]
        for r in similarity.semantic_dedup(
            pair, cents2, "vid", "vec", threshold=0.99, max_cell_size=None
        ).collect()
    }
    assert got2 == {2: 2, 3: 3}


def test_semantic_dedup_joins_on_cell_only(spark, corpus):
    """The pairwise join must key on the cell id — never a raw cross join of
    the corpus with itself (the N² trap SemDeDup exists to avoid)."""
    cents = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [-1.0] * 8)], "cid long, cvec array<double>"
    )
    df = similarity.semantic_dedup(
        corpus, cents, "vid", "vec", threshold=0.9, max_cell_size=None
    )
    plan = plan_of(df)
    # the only cartesian/broadcast-nested-loop allowed is vectors x broadcast
    # centroids inside nearest_centroids; the corpus-corpus pair join must be
    # an equi-join (hash) on the cell key.
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_residual_ivfpq_recall_beats_plain_at_equal_budget(spark):
    """The recall claim itself, bounded by a test (not just the example):
    on clustered data, residual IVFPQ at the same (m, ksub, nprobe) budget
    retrieves at least as many true cosine neighbors as non-residual —
    and strictly more in aggregate on this fixture.  Deterministic: fixed
    seeds, fixed tie-breaks."""
    rng = np.random.default_rng(11)
    anchors = rng.normal(size=(4, 8))
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    rows = []
    for i in range(96):
        v = anchors[i % 4] + rng.normal(scale=0.12, size=8)
        rows.append((i, v.tolist()))
    corpus = _vec_df(spark, rows)
    queries = _vec_df(
        spark,
        [(1000 + j, (anchors[j % 4] + rng.normal(scale=0.12, size=8)).tolist())
         for j in range(8)],
    )
    centroids = spark.createDataFrame(
        [(c, a.tolist()) for c, a in enumerate(anchors)],
        "cid long, cvec array<double>",
    )
    K, NPROBE = 5, 1

    # ground truth: brute-force cosine top-K per query (unit-normalized)
    def unit(v):
        v = np.asarray(v, dtype=np.float64)
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    cvecs = {r[0]: unit(r[1]) for r in rows}
    truth = {}
    for qid, qv in [(1000 + j, q[1]) for j, q in enumerate(queries.collect())]:
        qu = unit(qv)
        scored = sorted(
            ((float(qu @ dv), did) for did, dv in cvecs.items()),
            key=lambda t: (-round(t[0], 6), t[1]),
        )
        truth[qid] = {did for _, did in scored[:K]}

    def recall(result_df):
        got = {}
        for r in result_df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(len(got.get(q, set()) & t) for q, t in truth.items())

    plain_books = similarity.train_pq_codebooks(
        corpus, "vid", "vec", m=4, ksub=4, n_iters=5, sample_n=1000
    )
    resid_books = similarity.train_pq_residual_codebooks(
        corpus, centroids, "vid", "vec", m=4, ksub=4, n_iters=5, sample_n=1000
    )
    plain = similarity.ivf_pq_topk(
        corpus, queries, centroids, plain_books, "vid", "vec",
        k=K, nprobe=NPROBE, residual=False,
    )
    resid = similarity.ivf_pq_topk(
        corpus, queries, centroids, resid_books, "vid", "vec",
        k=K, nprobe=NPROBE, residual=True,
    )
    r_plain, r_resid = recall(plain), recall(resid)
    assert r_resid >= r_plain
    assert r_resid > 0


def test_semantic_dedup_whale_cell_guard_bounds_pairwise_work(spark):
    """The skew guard's contract: with one whale cell holding the whole
    corpus, max_cell_size re-splits it into LSH sub-buckets so the
    pairwise join compares far fewer than n² rows — while identical
    vectors (true exact duplicates) always share a sub-bucket and still
    canonicalize together."""
    rng = np.random.default_rng(7)
    dim = 8
    n = 60
    vecs = rng.normal(size=(n, dim)).tolist()
    # plant an exact-duplicate pair inside the whale
    vecs[41] = list(vecs[17])
    corpus = _vec_df(spark, list(enumerate(vecs)))
    # one centroid -> every vector lands in the same (whale) cell
    cents = spark.createDataFrame(
        [(0, [1.0] * dim)], "cid long, cvec array<double>"
    )

    assigned = similarity._semdedup_assignments(
        corpus, cents, "vid", "vec", round_to=6,
        max_cell_size=10, dim=dim, sub_planes=3,
    )
    sizes = [
        r["c"]
        for r in assigned.groupBy("cell", "sub")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert sum(sizes) == n
    assert len(sizes) > 1, "whale cell was not re-split"
    pairs_guarded = sum(c * (c - 1) for c in sizes)
    assert pairs_guarded < n * (n - 1) / 2, (
        "guard did not materially bound the pairwise join"
    )

    got = {
        r["vid"]: r["canonical_id"]
        for r in similarity.semantic_dedup(
            corpus, cents, "vid", "vec", threshold=0.999,
            max_cell_size=10, dim=dim, sub_planes=3,
        ).collect()
    }
    assert len(got) == n
    # the exact duplicate pair survives sub-bucketing (identical vectors
    # always collide in every hyperplane bucket)
    assert got[41] == 17 and got[17] == 17

    # adaptive plane count (sub_planes=None) also engages on the whale ...
    adaptive = similarity._semdedup_assignments(
        corpus, cents, "vid", "vec", round_to=6,
        max_cell_size=10, dim=dim, sub_planes=None,
    )
    assert adaptive.select("sub").distinct().count() > 1
    # ... and is a no-op when nothing is oversized (sub stays all-zero,
    # result identical to the unguarded path)
    unguarded = {
        r["vid"]: r["canonical_id"]
        for r in similarity.semantic_dedup(
            corpus, cents, "vid", "vec", threshold=0.999, max_cell_size=None,
        ).collect()
    }
    relaxed = {
        r["vid"]: r["canonical_id"]
        for r in similarity.semantic_dedup(
            corpus, cents, "vid", "vec", threshold=0.999,
            max_cell_size=n + 1, dim=dim,
        ).collect()
    }
    assert relaxed == unguarded


def test_semantic_dedup_guard_validates_arguments(spark):
    corpus = _vec_df(spark, [(0, [1.0, 0.0])])
    cents = spark.createDataFrame([(0, [1.0, 0.0])], "cid long, cvec array<double>")
    with pytest.raises(ValueError, match="dim"):
        similarity.semantic_dedup(
            corpus, cents, "vid", "vec", threshold=0.9, max_cell_size=5
        )
    with pytest.raises(ValueError, match="max_cell_size"):
        similarity.semantic_dedup(
            corpus, cents, "vid", "vec", threshold=0.9, max_cell_size=0, dim=2
        )
    with pytest.raises(ValueError, match="sub_planes"):
        similarity.semantic_dedup(
            corpus, cents, "vid", "vec", threshold=0.9,
            max_cell_size=1, dim=2, sub_planes=0,
        )


def test_semdedup_assignment_is_map_only_for_inline_centroids(
    spark, corpus, monkeypatch
):
    """The assignment relation (id, vec, norm, cell, sub) must be ONE
    map-only projection over the corpus for inlineable centroid sets —
    no Exchange anywhere in its plan (the window form would shuffle the
    corpus, and a cells re-join would shuffle it again)."""
    cents = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [-1.0] * 8)], "cid long, cvec array<double>"
    )
    assigned = similarity._semdedup_assignments(
        corpus, cents, "vid", "vec", round_to=6,
        max_cell_size=None, dim=None, sub_planes=None,
    )
    plan = plan_of(assigned)
    assert "Exchange" not in plan, "assignment is not map-only"
    assert "Join" not in plan
    got = {r["a_id"]: r["cell"] for r in assigned.collect()}

    # parity: the inline assignment equals the join+window form cell-for-
    # cell (forced — nearest_centroids itself inlines below the cap now)
    monkeypatch.setattr(similarity, "_LITERAL_ASSIGN_MAX_K", 0)
    want = {
        r["vid"]: r["cell"]
        for r in similarity.nearest_centroids(
            corpus, cents, "vid", "vec", nprobe=1
        ).collect()
    }
    assert got == want and got


def test_nearest_centroids_inline_is_map_only_and_matches_window(
    spark, corpus, monkeypatch
):
    """nprobe ranking must be a pure projection for inlineable centroid
    sets — no Exchange, no Window, no Join in the plan (the fallback
    shuffles the k-per-vector scored relation) — and match the window
    form row-for-row including probe_rank, with nprobe past the centroid
    count capping at the centroid count exactly like row_number does."""
    cents = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [-1.0] * 8), (2, [1.0, -1.0] * 4)],
        "cid long, cvec array<double>",
    )
    for nprobe in (1, 2, 5):  # 5 > |centroids|: both forms emit 3 probes
        nc = similarity.nearest_centroids(corpus, cents, "vid", "vec", nprobe=nprobe)
        plan = plan_of(nc)
        assert "Exchange" not in plan and "Window" not in plan
        assert "Join" not in plan
        got = sorted(tuple(r) for r in nc.collect())
        assert got and len(got) == corpus.count() * min(nprobe, 3)

        monkeypatch.setattr(similarity, "_LITERAL_ASSIGN_MAX_K", 0)
        want = sorted(
            tuple(r)
            for r in similarity.nearest_centroids(
                corpus, cents, "vid", "vec", nprobe=nprobe
            ).collect()
        )
        monkeypatch.undo()
        assert got == want


def test_nearest_centroids_null_vector_ranks_last_like_window(
    spark, monkeypatch
):
    """A null vector scores null cosine against every centroid; the window
    form ranks those probes LAST (desc-nulls-last) and the inline form's
    single-reference ascending sort key maps null cosines to +Infinity
    (``coalesce(nanvl(-cos, -inf), +inf)``) to match — pinned here because
    no clean corpus exercises it."""
    rows = spark.createDataFrame(
        [(0, [1.0] * 4), (1, None)], "vid long, vec array<double>"
    )
    cents = spark.createDataFrame(
        [(0, [1.0] * 4), (1, [-1.0] * 4)], "cid long, cvec array<double>"
    )
    inline = sorted(
        tuple(r)
        for r in similarity.nearest_centroids(
            rows, cents, "vid", "vec", nprobe=2
        ).collect()
    )
    monkeypatch.setattr(similarity, "_LITERAL_ASSIGN_MAX_K", 0)
    window = sorted(
        tuple(r)
        for r in similarity.nearest_centroids(
            rows, cents, "vid", "vec", nprobe=2
        ).collect()
    )
    assert inline == window
    # the null vector still emits nprobe probes (arbitrary but stable
    # order: cid tie-break), matching row_number over all-null scores
    assert len([t for t in inline if t[0] == 1]) == 2


def test_nearest_centroids_nan_cosine_ranks_first_like_window(
    spark, monkeypatch
):
    """Pathological-magnitude vectors produce a NaN cosine (inf/inf: the
    dot AND the norm product both overflow — Cauchy-Schwarz makes a
    genuine ±Infinity cosine unreachable in f64, NaN is what actually
    lands).  Spark orders NaN above +Infinity, so the window's desc
    ranks a NaN-cosine probe FIRST; the inline ascending sort key must
    map NaN to -Infinity (``nanvl(-cos, -inf)``) to agree, while the
    outer ``coalesce(..., +inf)`` keeps null-cosine probes LAST — the
    two sentinel slots are vacant by Cauchy-Schwarz, so no collision."""
    # vid 1: dot with cent 2 = 2e308 -> inf, norm(v) = inf -> NaN cosine
    # for cell 2 but cos = 0.0 for the unit cells 0/1 (finite dot / inf).
    rows = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1e308, 1e308]), (2, None)],
        "vid long, vec array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        "cid long, cvec array<double>",
    )
    inline = sorted(
        tuple(r)
        for r in similarity.nearest_centroids(
            rows, cents, "vid", "vec", nprobe=3
        ).collect()
    )
    monkeypatch.setattr(similarity, "_LITERAL_ASSIGN_MAX_K", 0)
    window = sorted(
        tuple(r)
        for r in similarity.nearest_centroids(
            rows, cents, "vid", "vec", nprobe=3
        ).collect()
    )
    monkeypatch.undo()
    assert inline == window
    # pin the semantics, not just agreement: NaN-cosine cell 2 outranks
    # the cos=0.0 cells for the overflow vector
    ranks = {t[2]: t[1] for t in inline if t[0] == 1}
    assert ranks[1] == 2


def test_ivf_query_side_is_map_only_and_topk_matches_fallback(
    spark, corpus, monkeypatch
):
    """The IVF query-side relation (query_id, vec, norm, cell) must be a
    single generator projection for inlineable centroid sets — no
    Exchange/Window/Join (the old form paid a crossJoin+window ranking
    AND a cells re-join) — and ivf_cosine_topk must be bit-identical to
    the join+window fallback."""
    cents = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [-1.0] * 8), (2, [1.0, -1.0] * 4)],
        "cid long, cvec array<double>",
    )
    queries = corpus.filter("vid % 10 = 0")  # limit() would add its own
    # single-partition Exchange and muddy the gate
    q = similarity._probed_query_side(queries, cents, "vid", "vec", 2, 6)
    plan = plan_of(q)
    assert "Exchange" not in plan and "Window" not in plan
    assert "Join" not in plan

    inline = sorted(
        tuple(r)
        for r in similarity.ivf_cosine_topk(
            corpus, queries, cents, "vid", "vec", k=3, nprobe=2
        ).collect()
    )
    monkeypatch.setattr(similarity, "_LITERAL_ASSIGN_MAX_K", 0)
    fallback = sorted(
        tuple(r)
        for r in similarity.ivf_cosine_topk(
            corpus, queries, cents, "vid", "vec", k=3, nprobe=2
        ).collect()
    )
    assert inline == fallback and inline


def test_ivfpq_query_table_is_generator_only(spark, corpus, books, monkeypatch):
    """The non-residual IVFPQ query-side ADC table must be generator-only
    for inlineable centroid sets — the probed cell explodes straight into
    the table projection, no cells re-join (no Join/Exchange/Window in the
    plan) — and the top-k must match the join+window fallback."""
    cents = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [-1.0] * 8), (2, [1.0, -1.0] * 4)],
        "cid long, cvec array<double>",
    )
    queries = corpus.filter("vid % 10 = 0")
    probes = similarity.inline_probe_cells(
        cents, similarity.as_double_array("vec"), 2, 6
    )
    probed = queries.select(
        F.col("vid").alias("query_id"),
        F.col("vec").alias("__qv"),
        F.explode(probes).alias("__p"),
    ).select("query_id", F.col("__p.cell").alias("cell"), "__qv")
    table = similarity._pq_query_table(
        probed, books, "query_id", "__qv", 6, passthrough=("cell",)
    )
    plan = plan_of(table)
    assert "Exchange" not in plan and "Window" not in plan
    assert "Join" not in plan
    assert set(table.columns) == {"query_id", "cell", "j", "code", "partial"}

    inline = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk(
            corpus, queries, cents, books, "vid", "vec", k=3, nprobe=2
        ).collect()
    )
    monkeypatch.setattr(similarity, "_LITERAL_ASSIGN_MAX_K", 0)
    fallback = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk(
            corpus, queries, cents, books, "vid", "vec", k=3, nprobe=2
        ).collect()
    )
    assert inline == fallback and inline


def test_ivfpq_corpus_sides_are_shuffle_free_and_match_fallback(spark, corpus, monkeypatch):
    """Corpus-side assignment in residual_vectors (nprobe=1) and
    ivf_pq_topk must be map-only for inlineable centroid sets — no
    shuffle exchange before the scoring join — and bit-identical to the
    join+window fallback (forced via _LITERAL_ASSIGN_MAX_K=0)."""
    cents = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [-1.0] * 8), (2, [1.0, -1.0] * 4)],
        "cid long, cvec array<double>",
    )

    res = similarity.residual_vectors(corpus, cents, "vid", "vec", nprobe=1)
    assert "Exchange hashpartitioning" not in plan_of(res)
    got = {r["vid"]: (r["cell"], r["resid"]) for r in res.collect()}

    books = similarity.train_pq_codebooks(corpus, "vid", "vec", m=4, ksub=4)
    inline_topk = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk(
            corpus, corpus.limit(5), cents, books, "vid", "vec", k=3
        ).collect()
    )

    monkeypatch.setattr(similarity, "_LITERAL_ASSIGN_MAX_K", 0)
    res_fb = similarity.residual_vectors(corpus, cents, "vid", "vec", nprobe=1)
    want = {r["vid"]: (r["cell"], r["resid"]) for r in res_fb.collect()}
    assert got == want and got

    fallback_topk = sorted(
        tuple(r)
        for r in similarity.ivf_pq_topk(
            corpus, corpus.limit(5), cents, books, "vid", "vec", k=3
        ).collect()
    )
    assert inline_topk == fallback_topk and inline_topk


def test_serving_broadcasts_auto_degrade_past_budget(spark, corpus, books):
    """The query-batch-shaped serving broadcasts (ADC distance table,
    rerank shortlist, exact-stage query relation) are priced against
    broadcast_budget_bytes under the default broadcast='auto': inside the
    budget the plan keeps every broadcast; past it (budget=0) every side
    degrades to a shuffled hash join — ZERO broadcast exchanges on the
    inline-assignment path — with bit-identical rows.  Guards a bulk
    re-scorer feeding a corpus-sized "query" batch from an
    executor-memory cliff."""
    cents = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [-1.0] * 8), (2, [1.0, -1.0] * 4)],
        "cid long, cvec array<double>",
    )
    queries = corpus.limit(5)
    kw = dict(k=3, nprobe=2, rerank=4)

    wide = similarity.ivf_pq_topk(
        corpus, queries, cents, books, "vid", "vec", **kw
    )
    tight = similarity.ivf_pq_topk(
        corpus, queries, cents, books, "vid", "vec",
        broadcast_budget_bytes=0, **kw,
    )
    assert "BroadcastExchange" in plan_of(wide)
    assert "BroadcastExchange" not in plan_of(tight)
    got_w = sorted(tuple(r) for r in wide.collect())
    got_t = sorted(tuple(r) for r in tight.collect())
    assert got_w == got_t and got_w

    # plain ADC path: the one broadcast is the distance table
    adc_w = similarity.pq_adc_topk(corpus, queries, books, "vid", "vec", k=3)
    adc_t = similarity.pq_adc_topk(
        corpus, queries, books, "vid", "vec", k=3, broadcast_budget_bytes=0
    )
    assert "BroadcastExchange" in plan_of(adc_w)
    assert "BroadcastExchange" not in plan_of(adc_t)
    assert sorted(map(tuple, adc_w.collect())) == sorted(
        map(tuple, adc_t.collect())
    )

    with pytest.raises(ValueError, match="broadcast must be"):
        similarity.pq_adc_topk(
            corpus, queries, books, "vid", "vec", k=3, broadcast="maybe"
        )


def test_semantic_dedup_warns_when_guard_unset(spark):
    """Calling without max_cell_size must warn loudly (the default path is
    exactly where the quadratic whale bites); an explicit None opt-out and
    a set guard both stay silent."""
    import warnings

    corpus = _vec_df(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, cvec array<double>"
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        similarity.semantic_dedup(corpus, cents, "vid", "vec", threshold=0.9)
    assert any("max_cell_size" in str(w.message) for w in caught)

    for kwargs in ({"max_cell_size": None}, {"max_cell_size": 5, "dim": 2}):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            similarity.semantic_dedup(
                corpus, cents, "vid", "vec", threshold=0.9, **kwargs
            )
        assert not [w for w in caught if "max_cell_size" in str(w.message)]


def test_centroid_set_collects_once_across_composed_operators(spark):
    """A shared CentroidSet amortizes the inline-assignment collect: four
    composed operators (ivf top-k, residuals, ivf-pq, semantic dedup) over
    one handle trigger exactly ONE driver collect, and every result is
    identical to passing the raw centroid relation."""
    import random

    rng = random.Random(7)
    dim, m = 8, 4
    corpus = _vec_df(
        spark,
        [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(60)],
    )
    cents_df = spark.createDataFrame(
        [(c, [rng.uniform(-1, 1) for _ in range(dim)]) for c in range(4)],
        "cid long, cvec array<double>",
    )
    queries = corpus.filter("vid % 10 = 0")
    books = similarity.train_pq_codebooks(
        corpus, "vid", "vec", m=m, ksub=4, n_iters=2, sample_n=60
    )
    cs = similarity.CentroidSet(cents_df)

    def run(cents):
        ivf = similarity.ivf_cosine_topk(
            corpus, queries, cents, "vid", "vec", k=3, nprobe=2
        ).collect()
        res = similarity.residual_vectors(
            corpus, cents, "vid", "vec", nprobe=1
        ).collect()
        pq = similarity.ivf_pq_topk(
            corpus, queries, cents, books, "vid", "vec", k=3, nprobe=2
        ).collect()
        sem = similarity.semantic_dedup(
            corpus, cents, "vid", "vec", threshold=0.9,
            max_cell_size=10, dim=dim, sub_planes=2,
        ).collect()
        return (
            sorted(tuple(r) for r in ivf),
            sorted((r["vid"], r["cell"], tuple(r["resid"])) for r in res),
            sorted(tuple(r) for r in pq),
            sorted(tuple(r) for r in sem),
        )

    got = run(cs)
    assert cs.collect_count == 1, (
        f"expected one centroid collect, saw {cs.collect_count}"
    )
    assert got == run(cents_df)


def test_literal_builders_fall_back_on_non_finite_values(spark):
    """The one-expr SQL construction has no literal spelling for inf/nan;
    _literal_centroids and _literal_codebooks must fall back to the
    per-element column form and still evaluate (same shape, usable in
    assignment) rather than emit an unparseable string."""
    inf = float("inf")
    cents = [(0, [1.0, 0.0]), (1, [inf, 1.0])]
    row = spark.range(1).select(
        similarity._literal_centroids(cents).alias("a")
    ).first()
    assert [e["cid"] for e in row["a"]] == [0, 1]
    assert row["a"][1]["cvec"][0] == inf

    books = [[[0.5, float("nan")], [1.0, 2.0]]]
    brow = spark.range(1).select(
        similarity._literal_codebooks(books).alias("b")
    ).first()
    assert [e["c"] for e in brow["b"][0]] == [0, 1]
    assert brow["b"][0][1]["sub"] == [1.0, 2.0]

    # FINITE components whose derived norm overflows (sum(x*x) -> inf at
    # ~1e154+) must also take the column form: 'infD' is not a parseable
    # SQL literal and the one-expr form would raise at plan time.
    hot = [(0, [1e200, 1e200]), (1, [1.0, 0.0])]
    hrow = spark.range(1).select(
        similarity._literal_centroids(hot).alias("a")
    ).first()
    assert [e["cid"] for e in hrow["a"]] == [0, 1]
    assert hrow["a"][0]["cnorm"] == inf
    assert hrow["a"][0]["cvec"][0] == 1e200

    # finite path and fallback agree value-for-value
    fin = [(0, [0.25, -1.5]), (7, [3.0, 0.125])]
    got = spark.range(1).select(
        similarity._literal_centroids(fin).alias("a")
    ).first()["a"]
    assert [(e["cid"], list(e["cvec"])) for e in got] == [
        (0, [0.25, -1.5]),
        (7, [3.0, 0.125]),
    ]


def test_bind_evaluates_column_once_per_row(spark):
    """_bind must feed the bound value through unchanged (identity
    semantics) — the once-per-row evaluation is a performance contract,
    the value contract is exact equality with the unbound expression."""
    df = spark.range(5).select(
        F.array(F.col("id") * 2, F.col("id") + 1).alias("v")
    )
    bound = df.select(
        F.col("v"),
        similarity._bind(
            F.col("v"), lambda v: F.element_at(v, 1) + F.element_at(v, 2)
        ).alias("s"),
    ).collect()
    for r in bound:
        assert r["s"] == r["v"][0] + r["v"][1]


def test_inline_cell_collect_is_limit_bounded(spark):
    """A centroid relation past the inline cap must cost the driver at
    most _LITERAL_ASSIGN_MAX_K + 1 rows (never a full-relation collect)
    and fall back to the lazy form (inline_cell_column returns None)."""
    k = similarity._LITERAL_ASSIGN_MAX_K
    big = spark.range(k * 10).select(
        F.col("id").alias("cid"),
        F.array(F.col("id").cast("double"), F.lit(1.0)).alias("cvec"),
    )
    assert similarity.inline_cell_column(big, F.col("v")) is None
    cs = similarity.CentroidSet(big)
    assert similarity.inline_cell_column(cs, F.col("v")) is None
    assert len(cs.rows) == k + 1  # bounded probe, memoized
    assert cs.collect_count == 1


def test_inline_probe_expression_is_single_reference(spark):
    """Catalyst does no CSE into lambda bodies, so every textual
    occurrence of the dot fold in the probe column's analyzed plan is
    re-evaluated per centroid per row — reference count IS cost.  The
    plan must contain exactly TWO aggregate() folds: the dot inside the
    sort-key lambda (once — the nanvl/coalesce form; a when-chain or
    null-flag field that re-references the cosine prints and pays 2-3x,
    the round-10 regression this pins) and the _bind-hoisted norm."""
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, cvec array<double>"
    )
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, v array<double>")
    col = similarity.inline_probe_cells(cents, F.col("v"), 1)
    plan = df.select(col.alias("p"))._jdf.queryExecution().analyzed().toString()
    assert plan.count("aggregate(") == 2, plan

    # the nprobe=1 twin (assign_literal_centroid) owns the same contract
    cell = similarity.assign_literal_centroid(
        F.col("v"), [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    )
    aplan = df.select(cell)._jdf.queryExecution().analyzed().toString()
    assert aplan.count("aggregate(") == 2, aplan
