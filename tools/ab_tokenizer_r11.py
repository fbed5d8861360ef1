"""A/B a single-pass tokenizer candidate on the tokenize-heavy bench queries.

Variant OFF is the SHIPPED two-pass ``text.tokens`` (regexp_replace + trim
+ split-on-space + filter); variant ON monkeypatches it to the single-pass
``split(lower(c), separator_regex)`` + filter rewrite.  Every call site
resolves ``text.tokens`` at query-construction time, so the patch applies
cleanly.  Methodology matches bench.py (construction + noop-sink execution
timed, variants alternated per round); prints row-count +
order-insensitive hash parity first.

r11 RESULT (the reason the rewrite was NOT shipped): parity IDENTICAL on
all six queries, but walls a wash — 1.08x/1.03x/0.94x/0.78x/0.90x/1.10x
(med), and a focused 7-9-rep re-run of the two shingle queries plus a
pure tokenize+explode microbench confirmed overlap within noise both
directions.  The regex pass is not where these operators' time goes.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from efficient_trees_spark.session import get_spark  # noqa: E402
from efficient_trees_spark.functions import text as text_mod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _tokens_single_pass(col):
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), text_mod._TOKEN_SPLIT), lambda t: t != "")


_tokens_two_pass = text_mod.tokens  # the shipped form


def set_variant(on: bool) -> None:
    text_mod.tokens = _tokens_single_pass if on else _tokens_two_pass


def main() -> None:
    from efficient_trees_spark.workloads.dedup_queries import (
        dedup_exact_bag,
        dedup_minhash_lsh,
        dedup_substring_span_stats,
    )
    from efficient_trees_spark.workloads.similarity_queries import ann_bm25_topk
    from efficient_trees_spark.workloads.text_pipeline import (
        docs_curation_pipeline,
        text_token_stats,
    )

    queries = {
        "text_token_stats": text_token_stats,
        "docs_curation_pipeline": docs_curation_pipeline,
        "dedup_exact_bag": dedup_exact_bag,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_substring_spans": dedup_substring_span_stats,
        "ann_bm25_topk": ann_bm25_topk,
    }

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("AB_RUNS", "5"))

    spark = get_spark(app_name="ab-tokenizer-r11")
    spark.sparkContext.setLogLevel("ERROR")

    for d in ["/root/testdata/sf0.001", sf_dir]:
        for on in (False, True):
            set_variant(on)
            for fn in queries.values():
                fn(spark, d).write.mode("overwrite").format("noop").save()

    for name, fn in queries.items():
        sums = []
        for on in (False, True):
            set_variant(on)
            out = fn(spark, sf_dir)
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

    walls = {name: {False: [], True: []} for name in queries}
    for _ in range(runs):
        for on in (False, True):
            set_variant(on)
            for name, fn in queries.items():
                start = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                walls[name][on].append(time.perf_counter() - start)
    set_variant(True)

    print(f"\n{'query':28s} {'off-med':>8s} {'on-med':>8s} {'off-min':>8s} "
          f"{'on-min':>8s} {'speedup(med)':>12s}")
    for name in queries:
        off, on = walls[name][False], walls[name][True]
        mo, mn = statistics.median(off), statistics.median(on)
        print(f"{name:28s} {mo:8.3f} {mn:8.3f} {min(off):8.3f} {min(on):8.3f} "
              f"{mo/mn:11.2f}x", flush=True)


if __name__ == "__main__":
    main()
