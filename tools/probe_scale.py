"""Measure map-only nprobe assignment vs the join+window fallback at
corpus-as-queries scale.

`nearest_centroids` is the IVF/IVFPQ/SemanticIndex assignment primitive.
Below `_LITERAL_ASSIGN_MAX_K` centroids it now ranks probes INSIDE the row
(`inline_probe_cells`: array_sort over literal centroids, exploded) — zero
exchanges at any nprobe — where the fallback crossJoins broadcast centroids
and ranks with a `partitionBy(id)` window, exchanging the k-per-vector
scored relation.  For a handful of queries the exchange is noise; this tool
measures the regime the change exists for — the ASSIGNMENT relation is
corpus-sized (index refresh, all-pairs matching, corpus-as-queries
compositions) — by row-multiplying the sf embeddings table (deterministic
vec_id retag per replica, same recipe as tools/row_ladder.py) and timing
both forms, reporting each plan's Exchange count alongside.

Methodology: noop sink, one untimed warmup per (form, rung), median of
SPARK_GRAFT_BENCH_RUNS (default 3) interleaved runs.

Usage: python tools/probe_scale.py [base_sf_dir]   (default sf0.1)
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

MULTS = [
    int(m)
    for m in os.environ.get("PROBE_SCALE_MULTS", "1,50,200").split(",")
]
NPROBE = 2
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def scaled_embeddings(spark, sf_dir: str, mult: int):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if mult == 1:
        return emb
    rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("__rep")
    n = emb.count()
    return (
        emb.select("vec_id", "embedding", rep)
        .select(
            (F.col("vec_id") + F.col("__rep") * F.lit(n)).alias("vec_id"),
            "embedding",
        )
        .repartition(32)
    )


# Centroid count knob: vec_id % CENT_MOD = 1 over the 2000 base vectors.
# 31 -> ~65 centroids (the original rungs); 8 -> ~250, one step under
# _LITERAL_ASSIGN_MAX_K = 256 — the k-ceiling premium measurement;
# 4 -> 500 and 2 -> 1000 for the past-the-cap knee sweep (requires
# PROBE_SCALE_INLINE_MAX to keep the inline form inline).
CENT_MOD = int(os.environ.get("PROBE_SCALE_CENT_MOD", "31"))

# Past-the-cap sweep: raise the inline ceiling for the measurement only
# (the shipped _LITERAL_ASSIGN_MAX_K stays 256 unless the sweep says
# otherwise).  Expected failure modes at large k are plan size (k x dim
# float literals) and py4j literal-construction cost, so the rung records
# plan_construction_sec (build + full physical planning) alongside wall.
INLINE_MAX = os.environ.get("PROBE_SCALE_INLINE_MAX")


def centroids_of(emb):
    return emb.filter(f"vec_id % {CENT_MOD} = 1 AND vec_id < 2000").select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(df) -> float:
    t0 = time.monotonic()
    noop(df)
    return time.monotonic() - t0


def exchange_count(df) -> int:
    """The structural fact the wall times explain (the Python status API
    exposes no shuffle byte counters; the plan's Exchange count is the
    engine-level invariant the change targets)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="probe_scale")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": sf_dir, "nprobe": NPROBE, "runs": RUNS, "rungs": []}
    base_cents = centroids_of(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    k = base_cents.count()
    for mult in MULTS:
        emb = scaled_embeddings(spark, sf_dir, mult).persist()
        n = emb.count()  # also materializes the persist

        def inline_df():
            orig = similarity._LITERAL_ASSIGN_MAX_K
            if INLINE_MAX is not None:
                similarity._LITERAL_ASSIGN_MAX_K = int(INLINE_MAX)
            try:
                return similarity.nearest_centroids(
                    emb, base_cents, "vec_id", "embedding", nprobe=NPROBE
                )
            finally:
                similarity._LITERAL_ASSIGN_MAX_K = orig

        def fallback_df():
            orig = similarity._LITERAL_ASSIGN_MAX_K
            similarity._LITERAL_ASSIGN_MAX_K = 0
            try:
                return similarity.nearest_centroids(
                    emb, base_cents, "vec_id", "embedding", nprobe=NPROBE
                )
            finally:
                similarity._LITERAL_ASSIGN_MAX_K = orig

        # plan-construction cost (py4j literal shipping + Catalyst
        # analysis + physical planning), timed cold before any execution:
        # the expected failure axis of large-k literal centroid sets
        def plan_sec(mk) -> float:
            t0 = time.monotonic()
            df = mk()
            df._jdf.queryExecution().executedPlan()
            return round(time.monotonic() - t0, 3)

        inline_plan_sec = plan_sec(inline_df)
        fallback_plan_sec = plan_sec(fallback_df)

        noop(inline_df())  # warmup
        noop(fallback_df())
        inline_t = statistics.median(timed(inline_df()) for _ in range(RUNS))
        fb_t = statistics.median(timed(fallback_df()) for _ in range(RUNS))
        rung = {
            "mult": mult,
            "rows": n,
            "centroids": k,
            "inline_sec": round(inline_t, 3),
            "fallback_sec": round(fb_t, 3),
            "inline_plan_sec": inline_plan_sec,
            "fallback_plan_sec": fallback_plan_sec,
            "speedup": round(fb_t / inline_t, 2) if inline_t else None,
            "inline_exchanges": exchange_count(inline_df()),
            "fallback_exchanges": exchange_count(fallback_df()),
        }
        out["rungs"].append(rung)
        print(
            f"x{mult}: rows={n} inline={rung['inline_sec']}s "
            f"fallback={rung['fallback_sec']}s speedup={rung['speedup']} "
            f"exchanges {rung['inline_exchanges']} vs {rung['fallback_exchanges']}",
            flush=True,
        )
        emb.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
