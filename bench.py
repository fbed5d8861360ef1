"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.  Each query is fully materialized via the
noop sink (no driver collect bottleneck, no disk write skew).

The bench set is pinned EXPLICITLY (not derived from the correctness
registry) so query names and scopes stay comparable across rounds even as
the registry consolidates singleton workloads into suites: these are the
same 13 queries BENCH_r01/BENCH_r02 timed.

Per-query times are the MEDIAN of $SPARK_GRAFT_BENCH_RUNS (default 3) timed
runs after untimed warmup passes (smallest scale, then the target scale —
steady-state measurement, the regime a long-lived cluster runs in) —
single-run timings in this sandbox show ±20-30% noise, which medians absorb.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from efficient_trees_spark.session import get_spark  # noqa: E402
from efficient_trees_spark.workloads.dedup_queries import (  # noqa: E402
    dedup_exact_bag,
    dedup_minhash_lsh,
    dedup_substring_span_stats,
)
from efficient_trees_spark.workloads.relational import (  # noqa: E402
    q1_pricing_summary,
    q3_top_revenue_orders,
    q5_region_nation_volume,
)
from efficient_trees_spark.workloads.similarity_queries import (  # noqa: E402
    ann_bm25_topk,
    ann_cosine_threshold,
    ann_cosine_topk,
)
from efficient_trees_spark.workloads.text_pipeline import (  # noqa: E402
    docs_curation_pipeline,
    text_token_stats,
)
from efficient_trees_spark.workloads.timeseries import (  # noqa: E402
    events_tumbling_window,
)
from efficient_trees_spark.workloads.tree_queries import (  # noqa: E402
    split_candidate_gains_gini,
    tree_fit_binned_distribution,
    tree_fit_predict_distribution,
)
from efficient_trees_spark.workloads.wide_fit import tree_fit_wide  # noqa: E402

BENCH_QUERIES = {
    # Round-4 additions: BM25 lexical retrieval and span-level substring
    # dedup — the two new corpus operators, timed alongside the originals.
    "ann_bm25_topk": ann_bm25_topk,
    "ann_cosine_threshold": ann_cosine_threshold,
    "ann_cosine_topk": ann_cosine_topk,
    "dedup_exact_bag": dedup_exact_bag,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    # stats leg only — comparable to earlier rounds; the registered
    # workload adds the strip leg for the correctness gate
    "dedup_substring_spans": dedup_substring_span_stats,
    "docs_curation_pipeline": docs_curation_pipeline,
    "events_tumbling_window": events_tumbling_window,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_revenue_orders": q3_top_revenue_orders,
    "q5_region_nation_volume": q5_region_nation_volume,
    "split_candidate_gains_gini": split_candidate_gains_gini,
    "text_token_stats": text_token_stats,
    "tree_fit_binned_distribution": tree_fit_binned_distribution,
    "tree_fit_predict_distribution": tree_fit_predict_distribution,
    # Round-4 addition: the reference's actual benchmark shape (~190 float
    # features, depth-4 entropy fit — examples/memory_profiling.py) rather
    # than the ~7-column testdata width.  Input table is materialized by the
    # prepare hook below, OUTSIDE the timed region.
    "tree_fit_wide": tree_fit_wide,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1)) if match else None

    spark = get_spark(app_name="efficient-trees-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/whole-stage-codegen paths outside the timed region: run
    # every bench plan once at the smallest scale factor, so the timed runs
    # measure steady-state execution (the regime a long-lived cluster is in),
    # not first-call Janino compilation (~5s on the tree-fit plan alone).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    # One-time input materialization (e.g. the wide-fit table) runs before
    # anything is timed; queries expose it as a `prepare` attribute.
    for name, fn in BENCH_QUERIES.items():
        prep = getattr(fn, "prepare", None)
        if prep is None:
            continue
        for d in {warm_dir, sf_dir}:
            try:
                prep(spark, d)
            except Exception as exc:  # prepare must never fail the bench
                print(f"prepare {name} ({d}) failed: {exc}", file=sys.stderr)
    # Two warmup passes: the smallest scale compiles the generic codegen
    # paths cheaply, then ONE untimed pass at the TARGET scale — tree-fit
    # plans embed scale-specific split literals, so their Janino compiles
    # recur at the target shape and would otherwise land in timed run 1.
    for d in dict.fromkeys([warm_dir, sf_dir]):
        for name, fn in BENCH_QUERIES.items():
            try:
                fn(spark, d).write.mode("overwrite").format("noop").save()
            except Exception as exc:  # warmup must never fail the bench
                print(f"warmup {name} ({d}) failed: {exc}", file=sys.stderr)

    # Interleave rounds (run 1 of every query, then run 2, ...) so a
    # transient sandbox slowdown hits one SAMPLE of many queries, not every
    # sample of one query.
    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for _ in range(runs):
        for name, fn in BENCH_QUERIES.items():
            start = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - start)

    timings = {name: round(statistics.median(ts), 3) for name, ts in samples.items()}
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs_per_query": runs,
                "aggregation": "median",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
