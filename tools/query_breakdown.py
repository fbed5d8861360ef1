"""Per-query phase breakdown: where does each bench query's wall go?

Splits one steady-state invocation of every bench query into

* ``build``    — Python-side DataFrame construction (``fn(spark, sf_dir)``):
  py4j chatter + analysis of each intermediate relation.  For the tree
  fits this INCLUDES the entire imperative fit (the returned frame is just
  the final distribution), so the execute column is only the final job.
* ``plan``     — forcing ``queryExecution().executedPlan`` on the returned
  frame (optimizer + physical planning; codegen happens lazily at run).
* ``execute``  — the noop-sink write of the planned frame.

The bench's timed region is build + plan + execute; the ladder says most
queries are overhead-bound at sf0.1, so this tool names which overhead.
Median of ``--runs`` (default 3) steady-state reps after one warmup.

Usage: python tools/query_breakdown.py [sf_dir] [name_filter] [--runs N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficient_trees_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    name_filter = args[1] if len(args) > 1 else ""

    import bench

    spark = get_spark(app_name="query-breakdown")
    spark.sparkContext.setLogLevel("ERROR")

    queries = {
        n: f for n, f in bench.BENCH_QUERIES.items() if name_filter in n
    }
    # prepare hooks + one untimed warmup pass (codegen, file listing)
    for name, fn in queries.items():
        prep = getattr(fn, "prepare", None)
        if prep is not None:
            prep(spark, sf_dir)
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    out = {}
    for name, fn in queries.items():
        phases = {"build": [], "plan": [], "execute": [], "total": []}
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t3 = time.perf_counter()
            phases["build"].append(t1 - t0)
            phases["plan"].append(t2 - t1)
            phases["execute"].append(t3 - t2)
            phases["total"].append(t3 - t0)
        out[name] = {
            k: round(statistics.median(v), 3) for k, v in phases.items()
        }
        print(json.dumps({"query": name, **out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
