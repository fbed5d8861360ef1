"""Row-ladder the persisted SemanticIndex match: fixed new batch vs
row-scaled OLD corpora.

`semantic_match_against_index` claims the old vector relation — cells
already materialized in the index parquet — streams through ONE
cell-keyed broadcast join with ZERO old-side exchanges, so matching a
new crawl batch costs the new batch's assignment plus a streamed linear
scan of colliding cells, never an old-corpus shuffle or broadcast.  The
MinHash sibling got this measurement in round 9; this tool is the
embedding-space twin.

Construction (the row_ladder.py recipe, adapted to embedding space):

* The FIXED new batch and the x1 old corpus are the workload's own split
  of the sf embeddings table (vec_id % 3).  The synthetic embeddings
  hold NO cross-split pairs above cos 0.6 (checked with DuckDB), so the
  new batch additionally carries ~14 PLANTED exact duplicates of old
  vectors (identical payload, offset ids): the match set is a nonzero
  pinned target, not a vacuous empty set.
* Replica rows (mult > 1) get offset ids and DETERMINISTIC pseudo-random
  vectors (xxhash64-seeded, elements in [-1, 1)): in 64 dimensions those
  are near-orthogonal to everything, so they add NO matches at the 0.95
  threshold (match output stays pinned to the x1 set — asserted per
  rung) while their cell assignment spreads near-uniformly over the
  centroids.  Unlike MinHash's tag-prefixed shingles, fixed centroids
  CANNOT keep per-new-doc comparisons flat — every replica lands in one
  of the same cells — so the honest expectation is: FLAT wall at x10/x30
  (fixed overhead dominates the streamed scan) and LINEAR-in-old-rows
  wall at the data-dominated rung, with zero old-side exchanges at every
  rung (asserted from the plan).

Each rung builds the index, WRITES it to parquet and reads it back, so
the old side streams from disk exactly as the steady-state pipeline
would; build/write time is untimed (paid once per crawl epoch, not per
match).  Timing: noop sink, one untimed warmup, median of
SPARK_GRAFT_BENCH_RUNS (default 3) runs.

Usage: python tools/semantic_index_ladder.py [base_sf_dir] [out_dir]
       (defaults sf0.1, /tmp/semantic_index_ladder)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from efficient_trees_spark.operators import similarity  # noqa: E402
from efficient_trees_spark.session import get_spark  # noqa: E402

MULTS = [1, 10, 30, 300]
THRESHOLD = float(os.environ.get("SEM_LADDER_THRESHOLD", "0.95"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
DIM = 64


def replicated_old(emb, mult: int):
    """x1 old corpus plus (mult-1) replicas with offset ids and
    hash-seeded random vectors (near-orthogonal in 64-dim: no new
    matches, near-uniform cell spread)."""
    old = emb.filter("vec_id % 3 != 0").select("vec_id", "embedding")
    if mult == 1:
        return old
    n = 2 * 10**6  # id offset stride: disjoint from real vec_ids
    rep = F.explode(F.sequence(F.lit(1), F.lit(mult - 1))).alias("__rep")
    fake_vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            F.pmod(
                F.xxhash64(F.col("vec_id"), F.col("__rep"), j), F.lit(1000)
            ).cast("double")
            / F.lit(500.0)
            - F.lit(1.0)
        ).cast("float"),
    )
    replicas = (
        old.select("vec_id", rep)
        .select(
            (F.col("vec_id") + F.col("__rep") * F.lit(n)).alias("vec_id"),
            fake_vec.alias("embedding"),
        )
    )
    return old.unionByName(replicas).repartition(32)


def centroids_of(emb):
    # the ann workloads' seed-centroid recipe: ~16 corpus vectors
    return emb.filter("vec_id % 31 = 1 AND vec_id < 2000").select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(df) -> float:
    t0 = time.monotonic()
    noop(df)
    return time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/semantic_index_ladder"
    spark = get_spark(app_name="semantic_index_ladder")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # planted exact dups of old vectors (identical payload -> same cell,
    # cos 1.0 at any threshold); id space disjoint from base (<2000),
    # replicas (>=2e6) and the rest of the new split
    planted = emb.filter("vec_id % 3 != 0 AND vec_id % 97 = 1").select(
        (F.col("vec_id") + F.lit(10**6)).alias("vec_id"), "embedding"
    )
    new = (
        emb.filter("vec_id % 3 = 0")
        .select("vec_id", "embedding")
        .unionByName(planted)
        .persist()
    )
    n_new = new.count()
    cents = similarity.CentroidSet(centroids_of(emb))
    out = {
        "metric": "semantic_index_ladder",
        "sf_dir": sf_dir,
        "threshold": THRESHOLD,
        "new_batch_rows": n_new,
        "runs": RUNS,
        "rungs": [],
    }
    for mult in MULTS:
        path = os.path.join(out_dir, f"x{mult}")
        shutil.rmtree(path, ignore_errors=True)
        old = replicated_old(emb, mult)
        similarity.semantic_index(old, cents, "vec_id", "embedding").write(path)
        idx = similarity.read_semantic_index(spark, path)
        n_old = idx.vectors.count()

        def match_df():
            # broadcast=True pins the path under measurement ('auto'
            # resolves to it for this batch size; its eager estimate is
            # a separate fixed cost, not the join shape being laddered)
            return similarity.semantic_match_against_index(
                idx, new, "vec_id", "embedding",
                threshold=THRESHOLD, broadcast=True,
            )

        plan = match_df()._jdf.queryExecution().executedPlan().toString()
        old_exchanges = plan.count("Exchange hashpartitioning")
        n_matches = match_df().count()
        noop(match_df())  # warmup
        t = statistics.median(timed(match_df()) for _ in range(RUNS))
        rung = {
            "mult": mult,
            "old_rows": n_old,
            "matches": n_matches,
            "match_sec": round(t, 3),
            "hash_exchanges": old_exchanges,
        }
        out["rungs"].append(rung)
        print(
            f"x{mult}: old_rows={n_old} matches={n_matches} "
            f"match={rung['match_sec']}s exchanges={old_exchanges}",
            flush=True,
        )
    base_matches = out["rungs"][0]["matches"]
    out["matches_pinned"] = all(
        r["matches"] == base_matches for r in out["rungs"]
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
