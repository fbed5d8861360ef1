"""Phase timer for tree_fit_wide OUTSIDE the level loop: prepare, edges
pass, pack+encode (materialized via the level-0 cube job — timed there),
level loop, transform+distribution execute.

Usage: python tools/wide_fit_phases.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from efficient_trees_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from efficient_trees_spark.enums import Criterion
    from efficient_trees_spark.sources.io import source_view
    from efficient_trees_spark.tree import (
        DecisionTreeClassifier,
        _fan_out_small_input,
        _two_scan_binned_edges,
    )
    from efficient_trees_spark.workloads.wide_fit import ensure_wide_table

    spark = get_spark(app_name="wide-fit-phases")
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_wide_table(spark, sf_dir)

    for r in range(runs + 1):  # +1 warmup
        t0 = time.perf_counter()
        data = source_view(spark, path).na.fill(0.0)
        model = DecisionTreeClassifier(
            max_depth=4, criterion=Criterion.ENTROPY, max_bins=32
        )
        prepared, feature_names, uniq = model._prepare(data, "target", True)
        t_prep = time.perf_counter()
        prepared, known = _fan_out_small_input(prepared)
        prepared32 = prepared.selectExpr(
            *[
                f"CAST(`{f}` AS FLOAT) AS `{f}`"
                for f in feature_names
            ],
            "__target_idx",
        )
        n_bins, stats = model._binned_edge_params()
        t_fan = time.perf_counter()
        edges, n_rows = _two_scan_binned_edges(
            prepared32, feature_names, n_bins, stats, "f4", n_parts=known
        )
        t_edges = time.perf_counter()
        model.fit(data, "target")
        t_fit = time.perf_counter()
        out = (
            model.transform(data, null_policy="keep")
            .groupBy("prediction")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        out.write.mode("overwrite").format("noop").save()
        t_exec = time.perf_counter()
        tag = "warm" if r == 0 else f"run{r}"
        print(
            f"{tag}: prepare {t_prep - t0:.2f}s fanout {t_fan - t_prep:.2f}s "
            f"edges(standalone) {t_edges - t_fan:.2f}s full_fit {t_fit - t_edges:.2f}s "
            f"transform+agg {t_exec - t_fit:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
