"""Measure the ADC serving guard where it FIRES: corpus-as-queries scale.

`ivf_pq_topk` (and the served form) default to `broadcast='auto'`: the
query-batch-shaped relations (ADC distance table, rerank shortlist, exact
query vectors) are priced against `broadcast_budget_bytes` and oversized
sides degrade to shuffled hash joins.  The parity tests prove the degraded
plan returns identical rows; this tool measures that the degraded path is
also a REASONABLE plan at the scale the guard exists for — a bulk
re-scorer feeding a corpus-sized "query" batch — by row-multiplying the
embeddings table as queries and timing:

* auto        — the guard decides per side (degrades past the budget)
* broadcast   — forced broadcast=True (the pre-guard behavior; locally
                survivable at these sizes, an executor OOM at cluster
                fan-out)

Methodology: noop sink, one untimed warmup per (form, rung), median of
SPARK_GRAFT_BENCH_RUNS (default 2) runs, per-form Exchange/Broadcast
counts from the executed plan.

Usage: python tools/adc_budget_ladder.py [base_sf_dir]   (default sf0.1)
Env:   ADC_LADDER_MULTS (default "1,10,30"), SPARK_GRAFT_BENCH_RUNS
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from efficient_trees_spark.operators import similarity  # noqa: E402
from efficient_trees_spark.session import get_spark  # noqa: E402

MULTS = [int(m) for m in os.environ.get("ADC_LADDER_MULTS", "1,10,30").split(",")]
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
K = 5
NPROBE = 2


def scaled_queries(spark, sf_dir: str, mult: int):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if mult == 1:
        return emb
    n = emb.count()
    rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("__rep")
    return (
        emb.select("vec_id", "embedding", rep)
        .select(
            (F.col("vec_id") + F.col("__rep") * F.lit(n)).alias("vec_id"),
            "embedding",
        )
        .repartition(32)
    )


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(df) -> float:
    t0 = time.monotonic()
    noop(df)
    return time.monotonic() - t0


def plan_counts(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "exchanges": plan.count("Exchange hashpartitioning"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="adc-budget-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = emb.filter("vec_id % 31 = 1 AND vec_id < 2000").select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    centroids = similarity.CentroidSet(cents)
    seeds = emb.filter("vec_id % 125 = 1")
    books = similarity.pq_codebooks_from_seeds(seeds, "vec_id", "embedding", m=8)
    m, ksub = len(books), len(books[0])
    out = {
        "sf_dir": sf_dir,
        "m": m,
        "ksub": ksub,
        "nprobe": NPROBE,
        "k": K,
        "rerank": 2 * K,
        "runs": RUNS,
        "rungs": [],
    }
    for mult in MULTS:
        queries = scaled_queries(spark, sf_dir, mult).persist()
        n = queries.count()

        def form(broadcast):
            return similarity.ivf_pq_topk(
                emb, queries, centroids, books, "vec_id", "embedding",
                k=K, nprobe=NPROBE, rerank=2 * K, broadcast=broadcast,
            )

        # what 'auto' decided for this rung, from the same sizing pass
        decided = similarity._serving_broadcast_plan(
            queries, "embedding", "auto", 256 << 20,
            NPROBE * m * ksub, 2 * K,
        )
        noop(form("auto"))  # warmup (includes the eager sizing pass)
        noop(form(True))
        auto_t = statistics.median(timed(form("auto")) for _ in range(RUNS))
        bc_t = statistics.median(timed(form(True)) for _ in range(RUNS))
        rung = {
            "mult": mult,
            "query_rows": n,
            "auto_decision_table_shortlist_queries": list(decided),
            "auto_sec": round(auto_t, 3),
            "forced_broadcast_sec": round(bc_t, 3),
            "auto_plan": plan_counts(form("auto")),
            "forced_plan": plan_counts(form(True)),
        }
        out["rungs"].append(rung)
        print(
            f"x{mult}: rows={n} auto={rung['auto_sec']}s "
            f"(decision {decided}) forced_bc={rung['forced_broadcast_sec']}s "
            f"plans auto={rung['auto_plan']} forced={rung['forced_plan']}",
            flush=True,
        )
        queries.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
