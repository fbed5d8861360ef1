"""A/B the r11 fan_out_small_input change on the affected bench queries.

Variant OFF monkeypatches efficient_trees_spark.sources.io.fan_out_small_input
to identity (the pre-change plan: every touched call site does a call-time
`from ... import fan_out_small_input`, so the patch reverts exactly the r11
diff's behavior).  Methodology matches bench.py: construction + noop-sink
execution in the timed region, variants alternated per round so host drift
hits both sides equally.  Also prints outputs' row-count + hash parity and
the steady-state cost of the partition probe itself (df.rdd vs _jdf.rdd()).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from efficient_trees_spark.session import get_spark  # noqa: E402
import efficient_trees_spark.sources.io as io_mod  # noqa: E402
from efficient_trees_spark.workloads.dedup_queries import (  # noqa: E402
    dedup_exact_bag,
    dedup_minhash_lsh,
    dedup_substring_span_stats,
)
from efficient_trees_spark.workloads.similarity_queries import (  # noqa: E402
    ann_cosine_threshold,
    ann_cosine_topk,
)
from efficient_trees_spark.workloads.text_pipeline import (  # noqa: E402
    docs_curation_pipeline,
)

QUERIES = {
    "dedup_exact_bag": dedup_exact_bag,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_substring_spans": dedup_substring_span_stats,
    "ann_cosine_threshold": ann_cosine_threshold,
    "ann_cosine_topk": ann_cosine_topk,
    "docs_curation_pipeline": docs_curation_pipeline,
}

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("AB_RUNS", "5"))

_orig_fan = io_mod.fan_out_small_input


def set_variant(on: bool) -> None:
    io_mod.fan_out_small_input = _orig_fan if on else (lambda df: df)


def main() -> None:
    spark = get_spark(app_name="ab-fanout-r11")
    spark.sparkContext.setLogLevel("ERROR")

    # steady-state partition-probe cost, after one throwaway call
    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    df.rdd.getNumPartitions()
    t0 = time.perf_counter()
    for _ in range(10):
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).rdd.getNumPartitions()
    py_probe = (time.perf_counter() - t0) / 10
    t0 = time.perf_counter()
    for _ in range(10):
        spark.read.parquet(
            os.path.join(SF_DIR, "documents.parquet")
        )._jdf.rdd().getNumPartitions()
    jvm_probe = (time.perf_counter() - t0) / 10
    print(f"partition probe steady-state: df.rdd {py_probe*1000:.0f} ms, "
          f"_jdf.rdd() {jvm_probe*1000:.0f} ms", flush=True)

    # warmups: both variants, both scales
    for d in ["/root/testdata/sf0.001", SF_DIR]:
        for on in (False, True):
            set_variant(on)
            for fn in QUERIES.values():
                fn(spark, d).write.mode("overwrite").format("noop").save()

    # parity check at sf0.1: sorted row hash of both variants
    from pyspark.sql import functions as F

    for name, fn in QUERIES.items():
        sums = []
        for on in (False, True):
            set_variant(on)
            out = fn(spark, SF_DIR)
            h = out.select(
                F.sum(
                    F.xxhash64(*[F.col(c).cast("string") for c in out.columns]).cast(
                        "decimal(38,0)"
                    )
                ).alias("h"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
            sums.append((h["h"], h["n"]))
        tag = "IDENTICAL" if sums[0] == sums[1] else f"DIFFER {sums}"
        print(f"parity {name}: {tag}", flush=True)

    walls = {name: {False: [], True: []} for name in QUERIES}
    for r in range(RUNS):
        for on in (False, True):
            set_variant(on)
            for name, fn in QUERIES.items():
                start = time.perf_counter()
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                walls[name][on].append(time.perf_counter() - start)
    set_variant(True)

    print(f"\n{'query':28s} {'off-med':>8s} {'on-med':>8s} {'off-min':>8s} "
          f"{'on-min':>8s} {'speedup(med)':>12s}")
    for name in QUERIES:
        off, on = walls[name][False], walls[name][True]
        mo, mn = statistics.median(off), statistics.median(on)
        print(f"{name:28s} {mo:8.3f} {mn:8.3f} {min(off):8.3f} {min(on):8.3f} "
              f"{mo/mn:11.2f}x", flush=True)


if __name__ == "__main__":
    main()
