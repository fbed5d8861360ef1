"""Per-stage attribution of tree_fit_wide's intra-run dispersion.

Round-10 finding: isolated idle-host tree_fit_wide runs swing 17.4-42.3 s
WITHIN one five-sample run (GC excluded by -Xlog:gc).  This tool runs the
bench's exact tree_fit_wide shape N times with SPARK_GRAFT_LEVEL_TIMINGS
on, brackets each sample with the bench's fixed-work parallel probe, and
prints per-sample per-level per-stage walls — naming WHICH stage of the
level loop (cube Spark job / driver cube merge / malloc trim /
driver-local gains) inflates on the slow samples, and whether the probe
saw the same window.

Usage: python tools/wide_fit_attribution.py [sf_dir] [runs]
Output: one JSON line (also appended to stdout table) — feed into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIMINGS_PATH = "/tmp/wide_fit_level_timings.jsonl"
os.environ["SPARK_GRAFT_LEVEL_TIMINGS"] = TIMINGS_PATH

from bench import _mt_probe_once, read_self_cpu_sec  # noqa: E402
from efficient_trees_spark.session import get_spark  # noqa: E402
from efficient_trees_spark.workloads.wide_fit import tree_fit_wide  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    if os.path.exists(TIMINGS_PATH):
        os.remove(TIMINGS_PATH)

    spark = get_spark(app_name="wide-fit-attribution")
    spark.sparkContext.setLogLevel("ERROR")
    prep = getattr(tree_fit_wide, "prepare", None)
    if prep is not None:
        prep(spark, sf_dir)
    # one untimed warmup (codegen compile at the target shape)
    tree_fit_wide(spark, sf_dir).write.mode("overwrite").format("noop").save()
    _mt_probe_once(spark)  # probe codegen compile

    samples = []
    # warmup's level lines are already in the file: start past them
    marks = [sum(1 for _ in open(TIMINGS_PATH)) if os.path.exists(TIMINGS_PATH) else 0]
    for i in range(runs):
        t0 = time.perf_counter()
        _mt_probe_once(spark)
        probe = time.perf_counter() - t0

        c0 = read_self_cpu_sec()
        t0 = time.perf_counter()
        tree_fit_wide(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        c1 = read_self_cpu_sec()

        # the emit is best-effort (split_finder swallows OSError), so a
        # missing/truncated timings file must not lose the wall samples
        try:
            lines = open(TIMINGS_PATH).readlines()
        except OSError:
            lines = []
        levels = [json.loads(line) for line in lines[marks[-1]:]]
        marks.append(len(lines))
        samples.append(
            {
                "run": i,
                "wall_sec": round(wall, 2),
                "probe_before_sec": round(probe, 2),
                "self_cpu_sec": (
                    round(c1 - c0, 1) if c0 is not None and c1 is not None else None
                ),
                "levels": levels,
            }
        )
        lv = " ".join(
            f"L{j}:{l['level_total_sec']:.1f}"
            f"(cube {l['stages'].get('cube_job_sec', 0):.1f}"
            f"/gains {l['stages'].get('local_gains_sec', 0):.1f})"
            for j, l in enumerate(levels)
        )
        print(
            f"run {i}: wall {wall:6.2f}s probe {probe:4.2f}s "
            f"cpu {samples[-1]['self_cpu_sec']} | {lv}",
            file=sys.stderr,
        )

    print(json.dumps({"sf_dir": sf_dir, "samples": samples}))
    spark.stop()


if __name__ == "__main__":
    main()
