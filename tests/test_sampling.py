"""Corpus sampling operators: exact strata sizes, budget admission rule,
priority ordering, determinism under a fixed partitioning, and plan shape
(at most one shuffle, no Python stages)."""

from __future__ import annotations

from pyspark.sql import functions as F

from efficient_trees_spark.functions import text
from efficient_trees_spark.operators import sampling
from efficient_trees_spark.workloads.base import load


def _docs_with_tokens(spark, sf_small):
    docs = load(spark, sf_small, "documents")
    return docs.select(
        "doc_id",
        text.lang_id("text").alias("lang"),
        text.token_count("text").alias("n_tokens"),
        F.round(text.quality_score("text"), 9).alias("quality"),
    )


def test_exact_sample_sizes_and_determinism(spark, sf_small):
    d = _docs_with_tokens(spark, sf_small).cache()
    try:
        strata_sizes = dict(
            (r["lang"], r["count"]) for r in d.groupBy("lang").count().collect()
        )
        k = 7
        out = sampling.stratified_exact_sample(d, "lang", k=k, seed=1)
        got = dict((r["lang"], r["count"]) for r in out.groupBy("lang").count().collect())
        for lang, n in strata_sizes.items():
            assert got.get(lang, 0) == min(k, n)
        # sampled rows are real rows
        assert out.join(d, ["doc_id"], "left_anti").count() == 0
        # deterministic for a fixed (cached) partitioning
        again = sampling.stratified_exact_sample(d, "lang", k=k, seed=1)
        assert sorted(r.doc_id for r in out.select("doc_id").collect()) == sorted(
            r.doc_id for r in again.select("doc_id").collect()
        )
    finally:
        d.unpersist()


def test_exact_sample_priority_order(spark, sf_small):
    d = _docs_with_tokens(spark, sf_small)
    out = sampling.stratified_exact_sample(
        d, "lang", k=5, order_by=F.desc("quality")
    )
    # each stratum's sample is exactly its top-5 by quality (desc)
    for lang_row in d.select("lang").distinct().collect():
        lang = lang_row["lang"]
        top = [
            r["doc_id"]
            for r in d.filter(F.col("lang") == lang)
            .orderBy(F.desc("quality"), "doc_id")
            .limit(5)
            .collect()
        ]
        got = [
            r["doc_id"]
            for r in out.filter(F.col("lang") == lang)
            .orderBy(F.desc("quality"), "doc_id")
            .collect()
        ]
        # quality ties make the exact id set order-dependent; compare scores
        top_scores = sorted(
            r["quality"] for r in d.filter(F.col("lang") == lang)
            .orderBy(F.desc("quality")).limit(5).collect()
        )
        got_scores = sorted(
            r["quality"] for r in out.filter(F.col("lang") == lang).collect()
        )
        assert got_scores == top_scores
        assert len(got) == min(5, len(top) if len(top) < 5 else 5)


def test_token_budget_admission(spark, sf_small):
    d = _docs_with_tokens(spark, sf_small)
    budget = 300
    out = sampling.token_budget_sample(
        d, "lang", "n_tokens", budget=budget, order_by=F.desc("quality")
    ).cache()
    try:
        totals = {
            r["lang"]: (r["total"], r["max_tokens"])
            for r in out.groupBy("lang")
            .agg(F.sum("n_tokens").alias("total"), F.max("n_tokens").alias("max_tokens"))
            .collect()
        }
        stratum_totals = {
            r["lang"]: r["total"]
            for r in d.groupBy("lang").agg(F.sum("n_tokens").alias("total")).collect()
        }
        for lang, (total, max_tokens) in totals.items():
            if stratum_totals[lang] <= budget:
                # token-poor stratum taken whole
                assert total == stratum_totals[lang]
            else:
                # budget reached, overshoot bounded by one document
                assert total >= budget
                assert total < budget + max_tokens
    finally:
        out.unpersist()


def test_fraction_sample_is_map_only(spark, sf_small):
    d = _docs_with_tokens(spark, sf_small)
    fracs = {r["lang"]: 0.5 for r in d.select("lang").distinct().collect()}
    out = sampling.stratified_fraction_sample(d, "lang", fracs, seed=3)
    # sampleBy compiles to a rand()-filter (not a Sample node): still map-only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # Bernoulli sampling shuffles nothing
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # and it actually thins the data
    assert 0 < out.count() < d.count()


def test_temperature_allocation(spark, sf_small):
    d = _docs_with_tokens(spark, sf_small).cache()
    try:
        sizes = {
            r["lang"]: r["total"]
            for r in d.groupBy("lang").agg(F.sum("n_tokens").alias("total")).collect()
        }
        corpus_total = sum(sizes.values())

        # budget below every stratum: tau=1 reproduces natural proportions
        b1 = sampling.temperature_allocation(d, "lang", "n_tokens", 1000, 1.0)
        assert sum(b1.values()) <= 1000
        for s, b in b1.items():
            assert abs(b - 1000 * sizes[s] / corpus_total) <= 1
        # tau -> 0 approaches uniform
        b0 = sampling.temperature_allocation(d, "lang", "n_tokens", 1000, 1e-9)
        vals = sorted(b0.values())
        assert vals[-1] - vals[0] <= 1
        # low temperature up-weights the smaller stratum vs natural share
        small = min(sizes, key=sizes.get)
        b_cool = sampling.temperature_allocation(d, "lang", "n_tokens", 1000, 0.3)
        assert b_cool[small] >= b1[small]
        # budgets never exceed what a stratum has; a huge budget caps at corpus
        b_all = sampling.temperature_allocation(
            d, "lang", "n_tokens", corpus_total * 10, 0.5
        )
        for s, b in b_all.items():
            assert b <= sizes[s]
        assert sum(b_all.values()) == corpus_total
    finally:
        d.unpersist()


def test_samplers_single_shuffle_no_python(spark, sf_small):
    d = _docs_with_tokens(spark, sf_small)
    for out in (
        sampling.stratified_exact_sample(d, "lang", k=3),
        sampling.token_budget_sample(d, "lang", "n_tokens", budget=100),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1  # one shuffle, on the stratum key
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------ group-based split


def test_group_split_never_splits_a_group(spark, sf_small):
    from efficient_trees_spark.operators.sampling import group_split

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    grouped = docs.withColumn("grp", F.col("doc_id") % 37)
    out = group_split(grouped, "grp", 0.25, seed=7)
    sides_per_group = (
        out.groupBy("grp").agg(F.count_distinct("split").alias("k")).collect()
    )
    assert all(r.k == 1 for r in sides_per_group)


def test_group_split_fraction_and_determinism(spark, sf_small):
    from efficient_trees_spark.operators.sampling import group_split

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    out = group_split(docs, "doc_id", 0.3, seed=1)
    n_test = out.filter(F.col("split") == "test").count()
    n = docs.count()
    assert 0.15 * n < n_test < 0.45 * n  # converges by group count
    again = group_split(docs.repartition(13), "doc_id", 0.3, seed=1)
    a = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
    b = {r.doc_id: r.split for r in again.select("doc_id", "split").collect()}
    assert a == b
    # a different seed moves the boundary
    other = group_split(docs, "doc_id", 0.3, seed=2)
    c = {r.doc_id: r.split for r in other.select("doc_id", "split").collect()}
    assert a != c


def test_group_split_is_a_pure_projection_and_validates(spark, sf_small):
    import pytest

    from efficient_trees_spark.operators.sampling import group_split

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = (
        group_split(docs, "doc_id", 0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    with pytest.raises(ValueError):
        group_split(docs, "doc_id", 1.5)


def test_mixture_budget_sample_matches_scalar_form_and_drops_absent(
    spark, sf_small
):
    d = _docs_with_tokens(spark, sf_small).cache()
    try:
        strata = [r["lang"] for r in d.select("lang").distinct().collect()]
        # equal budgets -> identical selection to the scalar operator
        budgets = {s: 250 for s in strata}
        mix = sampling.mixture_budget_sample(
            d, "lang", "n_tokens", budgets,
            order_by=[F.desc("quality"), F.asc("doc_id")],
        )
        scalar = sampling.token_budget_sample(
            d, "lang", "n_tokens", budget=250,
            order_by=F.desc("quality"),
        )
        # scalar form's single order_by needs the doc_id tiebreak too for a
        # deterministic comparison set; compare per-stratum token totals,
        # which are tie-insensitive
        got = {
            r["lang"]: r["t"]
            for r in mix.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
        }
        want = {
            r["lang"]: r["t"]
            for r in scalar.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
        }
        assert got == want
        # strata absent from the budget table are dropped entirely
        partial = sampling.mixture_budget_sample(
            d, "lang", "n_tokens", {strata[0]: 100},
            order_by=[F.desc("quality"), F.asc("doc_id")],
        )
        assert partial.select("lang").distinct().collect()[0]["lang"] == strata[0]
    finally:
        d.unpersist()


def test_mixture_budget_respects_per_stratum_budgets(spark, sf_small):
    d = _docs_with_tokens(spark, sf_small).cache()
    try:
        totals = {
            r["lang"]: r["t"]
            for r in d.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
        }
        budgets = sampling.temperature_allocation(
            d, "lang", "n_tokens", sum(totals.values()) // 2, temperature=1.0
        )
        out = sampling.mixture_budget_sample(
            d, "lang", "n_tokens", budgets,
            order_by=[F.desc("quality"), F.asc("doc_id")],
        )
        sel = {
            r["lang"]: (r["t"], r["m"])
            for r in out.groupBy("lang")
            .agg(F.sum("n_tokens").alias("t"), F.max("n_tokens").alias("m"))
            .collect()
        }
        for lang, b in budgets.items():
            if b <= 0:
                assert lang not in sel or sel[lang][0] == 0
                continue
            t, m = sel[lang]
            if totals[lang] <= b:
                assert t == totals[lang]
            else:
                assert b <= t < b + m
    finally:
        d.unpersist()
