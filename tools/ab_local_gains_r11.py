"""A/B the r11 local-gains ConvertToLocalRelation exclusion on the two bench
queries whose fits take the packed local-gains path (tree_fit_wide,
tree_fit_binned_distribution; tree_fit_predict_distribution resolves
hist_method='expand' at 7 features and never enters it).

Variant OFF monkeypatches split_finder._no_local_relation_fold to a no-op
context manager — exactly the pre-change behavior (the optimizer folds the
local gains relation and evaluates the staged entropy/gini pipeline
row-at-a-time at plan time).  Methodology matches bench.py: construction +
noop-sink execution in the timed region, variants alternated per round so
host drift hits both sides equally; output row-count + value hash parity is
asserted between variants.
"""

import contextlib
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from efficient_trees_spark.session import get_spark  # noqa: E402
from efficient_trees_spark.operators import split_finder  # noqa: E402
from efficient_trees_spark.workloads.tree_queries import (  # noqa: E402
    tree_fit_binned_distribution,
)
from efficient_trees_spark.workloads.wide_fit import tree_fit_wide  # noqa: E402

QUERIES = {
    "tree_fit_wide": tree_fit_wide,
    "tree_fit_binned_distribution": tree_fit_binned_distribution,
}

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("AB_RUNS", "4"))

_orig = split_finder._no_local_relation_fold


@contextlib.contextmanager
def _noop(spark):
    yield


def set_variant(on: bool) -> None:
    split_finder._no_local_relation_fold = _orig if on else _noop


def main() -> None:
    spark = get_spark(app_name="ab-local-gains-r11")
    spark.sparkContext.setLogLevel("ERROR")
    prep = getattr(tree_fit_wide, "prepare", None)
    if prep is not None:
        prep(spark, SF_DIR)

    # parity first: same rows either way
    for name, fn in QUERIES.items():
        rows = {}
        for on in (False, True):
            set_variant(on)
            rows[on] = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        assert rows[False] == rows[True], f"{name}: variant outputs differ"
        print(f"{name}: outputs identical across variants ({len(rows[True])} rows)")

    walls: dict[tuple[str, bool], list[float]] = {}
    for rnd in range(RUNS):
        for on in ((False, True) if rnd % 2 == 0 else (True, False)):
            set_variant(on)
            for name, fn in QUERIES.items():
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                wall = time.perf_counter() - t0
                walls.setdefault((name, on), []).append(wall)
                print(f"round {rnd} fold_free={on} {name}: {wall:.2f}s", flush=True)
    set_variant(True)
    print()
    for name in QUERIES:
        off = walls[(name, False)]
        on = walls[(name, True)]
        print(
            f"{name}: OFF median {statistics.median(off):.2f} min {min(off):.2f} | "
            f"ON median {statistics.median(on):.2f} min {min(on):.2f} | "
            f"median ratio {statistics.median(off) / statistics.median(on):.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
