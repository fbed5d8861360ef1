"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.  Each query is fully materialized via the
noop sink (no driver collect bottleneck, no disk write skew).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from efficient_trees_spark.session import get_spark  # noqa: E402
from efficient_trees_spark.workloads import REGISTRY  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1)) if match else None

    spark = get_spark(app_name="efficient-trees-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench = {name: wl for name, wl in sorted(REGISTRY.items()) if "bench" in wl.tags}

    # Warm the JVM/whole-stage-codegen paths outside the timed region: run
    # every bench plan once at the smallest scale factor, so the timed runs
    # measure steady-state execution (the regime a long-lived cluster is in),
    # not first-call Janino compilation (~5s on the tree-fit plan alone).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for wl in bench.values():
        try:
            wl.fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        except Exception as exc:  # warmup must never fail the bench
            print(f"warmup {wl.name} failed: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name, wl in bench.items():
        start = time.perf_counter()
        df = wl.fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
