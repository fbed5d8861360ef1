"""Row-scaled ladder: drive the most expensive bench queries into the
DATA-DOMINATED regime the sf ladder can't reach.

The sf ladder (tools/scale_ladder.py) tops out at sf0.1, where every alpha
is <= ~0.5 — fixed scheduling overhead still dominates, so it proves "no
super-linear blowup" but not "scales linearly".  This tool row-MULTIPLIES
the input tables (x10 / x30 on top of the base sf) for the top bench
queries, deterministically and without changing workload shape:

* ``lineitem`` replicas perturb ``l_orderkey`` (aggregate groups and join
  keys scale linearly);
* ``documents`` replicas prefix every token with a replica tag, so
  replicas are NOT near-duplicates of each other — the dedup queries keep
  their candidate-pair density instead of exploding quadratically on
  artificial clones (which would measure a different workload);
* the wide fit reuses the AMEX-shaped row-scaled table
  (workloads/wide_fit.py row_mult — fresh hash draws per replica).

Same timing methodology as bench.py: noop sink, one untimed warmup pass
per rung, median of ``SPARK_GRAFT_BENCH_RUNS`` (default 2) interleaved
runs.  alpha is fit on the largest two rungs.  Prints a markdown table +
one JSON line; BENCH/SCALE docs cite the output.

Usage: python tools/row_ladder.py [base_sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from efficient_trees_spark.session import get_spark  # noqa: E402

MULTS = [1, 10, 30]
# x9 is the reference's 5.5M-row AMEX shape; x30 (18M x 190) stresses the
# packed scan's asymptote past the point where caches fit the local heap.
WIDE_MULTS = [1, 9, 30]
SUPERLINEAR = 1.3


def ensure_scaled_dir(spark, base_sf_dir: str, mult: int) -> str:
    """Materialize row-scaled lineitem + documents parquet for one rung."""
    if mult == 1:
        return base_sf_dir
    tag = os.path.basename(os.path.normpath(base_sf_dir)) or "sf"
    out = os.path.join(REPO, ".bench_cache", f"rowscale_{tag}_x{mult}")
    rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("__rep")
    # Write enough files that the scan starts at full parallelism: the
    # point of the ladder is data-proportional work, and a 6-split scan on
    # 32 cores measures starvation, not scaling (a real corpus has far
    # more splits than cores).
    n_out = spark.sparkContext.defaultParallelism

    li_path = os.path.join(out, "lineitem.parquet")
    if not os.path.exists(os.path.join(li_path, "_SUCCESS")):
        li = spark.read.parquet(f"{base_sf_dir}/lineitem.parquet")
        (
            li.select(rep, "*")
            .withColumn(
                "l_orderkey",
                F.col("l_orderkey") + F.col("__rep") * F.lit(10_000_000_000),
            )
            .drop("__rep")
            .repartition(n_out)
            .write.mode("overwrite")
            .parquet(li_path)
        )

    docs_path = os.path.join(out, "documents.parquet")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        docs = spark.read.parquet(f"{base_sf_dir}/documents.parquet")
        scaled = docs.select(rep, "*").select(
            (
                F.col("doc_id")
                + F.col("__rep").cast("long") * F.lit(1_000_000_000)
            ).alias("doc_id"),
            # replica 0 keeps the original text; other replicas prefix every
            # token with a replica tag — distinct token universes, so
            # cross-replica shingles/minhashes never collide and the dedup
            # pair density stays that of the base corpus.
            F.when(F.col("__rep") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda t: F.concat(
                            F.lit("r"), F.col("__rep").cast("string"), F.lit("x"), t
                        ),
                    ),
                )
            )
            .alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        scaled.repartition(n_out).write.mode("overwrite").parquet(docs_path)
    return out


def query_fns():
    from efficient_trees_spark.workloads.dedup_queries import (
        dedup_minhash_lsh,
        dedup_substring_span_stats,
    )
    from efficient_trees_spark.workloads.relational import q1_pricing_summary
    from efficient_trees_spark.workloads.similarity_queries import ann_bm25_topk
    from efficient_trees_spark.workloads.text_pipeline import docs_curation_pipeline
    from efficient_trees_spark.workloads.tree_queries import (
        tree_fit_predict_distribution,
    )

    return {
        "q1_pricing_summary": q1_pricing_summary,
        "ann_bm25_topk": ann_bm25_topk,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "docs_curation_pipeline": docs_curation_pipeline,
        # round-6 additions: the two remaining heavy bench queries
        # (VERDICT r5 task 4) — span dedup's fold and the narrow exact fit.
        "dedup_substring_spans": dedup_substring_span_stats,
        "tree_fit_predict_distribution": tree_fit_predict_distribution,
    }


def wide_fit_fn(row_mult: int):
    from efficient_trees_spark.enums import Criterion
    from efficient_trees_spark.tree import DecisionTreeClassifier
    from efficient_trees_spark.workloads.wide_fit import ensure_wide_table

    def run(spark, sf_dir):
        path = ensure_wide_table(spark, sf_dir, row_mult=row_mult)
        data = spark.read.parquet(path).na.fill(0.0)
        model = DecisionTreeClassifier(
            max_depth=4, criterion=Criterion.ENTROPY, max_bins=32
        )
        model.fit(data, "target")
        return (
            model.transform(data, null_policy="keep")
            .groupBy("prediction")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    return run


def timed(fn, spark, sf_dir, runs: int) -> float:
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warmup
    samples = []
    for _ in range(runs):
        start = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        samples.append(time.perf_counter() - start)
    return round(statistics.median(samples), 3)


def alpha_of(times: dict[int, float]) -> float | None:
    mults = sorted(m for m, t in times.items() if t)
    if len(mults) < 2:
        return None
    lo, hi = mults[-2], mults[-1]
    return round(math.log(times[hi] / times[lo]) / math.log(hi / lo), 2)


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = get_spark(app_name="row-ladder")
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {m: ensure_scaled_dir(spark, base, m) for m in MULTS}
    from efficient_trees_spark.workloads.wide_fit import ensure_wide_table

    for m in WIDE_MULTS:
        ensure_wide_table(spark, base, row_mult=m)

    results: dict[str, dict[int, float]] = {}
    for name, fn in query_fns().items():
        results[name] = {}
        for m in MULTS:
            print(f"# {name} x{m} ...", file=sys.stderr)
            results[name][m] = timed(fn, spark, dirs[m], runs)
            # per-rung progress line so a killed run still leaves its timings
            print(f"# {name} x{m} = {results[name][m]}s", file=sys.stderr)
    results["tree_fit_wide"] = {}
    for m in WIDE_MULTS:
        print(f"# tree_fit_wide x{m} ...", file=sys.stderr)
        results["tree_fit_wide"][m] = timed(wide_fit_fn(m), spark, base, runs)
        print(f"# tree_fit_wide x{m} = {results['tree_fit_wide'][m]}s", file=sys.stderr)

    print("| query | " + " | ".join(f"x{m} (s)" for m in MULTS) + " | alpha | note |")
    print("|---" * (len(MULTS) + 3) + "|")
    payload = {}
    for name, times in results.items():
        a = alpha_of(times)
        note = "**super-linear**" if a is not None and a > SUPERLINEAR else (
            "overhead-bound" if a is not None and a < 0.35 else ""
        )
        cells = " | ".join(
            f"{times.get(m):.2f}" if times.get(m) else "-" for m in MULTS
        )
        print(f"| {name} | {cells} | {a if a is not None else '-'} | {note} |")
        payload[name] = {"times": {str(m): t for m, t in times.items()}, "alpha": a}
    print(json.dumps({"metric": "row_ladder", "base": base, "runs": runs,
                      "queries": payload}))
    spark.stop()


if __name__ == "__main__":
    main()
