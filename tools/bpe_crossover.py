"""Measure the BPE encode crossover: compiled-expression vs distinct-word
join, wall seconds by merge count — the evidence behind
``operators/bpe._EXPR_MERGE_MAX`` (the r7 verdict flagged the constant as
a reasoned guess; this pins it to data).

The driver testdata's documents table has only 31 distinct words (training
exhausts in well under 200 merges), so the sweep runs on the deterministic
wide corpus the flat-training test uses — all 3-letter words over a
12-letter alphabet (1728 distinct words, >1700 merges of headroom) —
row-multiplied so the corpus side carries real token volume while the
distinct-word relation stays fixed.  That is exactly the regime the two
forms differ in: expression cost grows with corpus tokens x merges,
join cost with distinct words x merges plus a constant corpus-side
reassembly.

Usage: python tools/bpe_crossover.py [repeat_factor]  (default 40 —
~690k token occurrences, ~35k docs)
Emits one JSON line: {"merges": [...], "expression": {m: sec},
"joined": {m: sec}, ...}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from efficient_trees_spark.operators import bpe  # noqa: E402
from efficient_trees_spark.session import get_spark  # noqa: E402

MERGE_COUNTS = [16, 32, 64, 128, 256, 512]


def wide_corpus(repeat: int):
    letters = "abcdefghijkl"
    rows = []
    i = 0
    for a in letters:
        for b in letters:
            for c in letters:
                i += 1
                # vary length so token volume is not uniform per word
                rows.append((i, " ".join([a + b + c] * (i % 7 + 1))))
    out = []
    for r in range(repeat):
        out.extend((i + 1728 * r, t) for i, t in rows)
    return out


def main() -> None:
    repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    spark = get_spark(app_name="bpe-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    rows = wide_corpus(repeat)
    docs = spark.createDataFrame(rows, "doc_id long, text string").cache()
    n_tokens = docs.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    docs.count()

    merges = bpe.train_bpe(docs.limit(1728), max(MERGE_COUNTS))
    assert len(merges) == max(MERGE_COUNTS), f"corpus exhausted at {len(merges)}"

    out = {
        "n_docs": len(rows),
        "n_tokens": int(n_tokens),
        "distinct_words": 1728,
        "merge_counts": MERGE_COUNTS,
        "expression": {},
        "joined": {},
    }
    for m in MERGE_COUNTS:
        sub = merges[:m]
        for name, fn in (
            ("expression", lambda: bpe.bpe_encode(docs, sub)),
            ("joined", lambda: bpe.bpe_encode_joined(docs, sub)),
        ):
            t0 = time.monotonic()
            try:
                fn().select(F.sum(F.size("bpe_tokens"))).first()
            except Exception as exc:  # noqa: BLE001 — record the cliff
                # the expression form's plan CONSTRUCTION dies
                # (java.lang.StackOverflowError converting the
                # merges-deep nested replace column) past a few hundred
                # merges — that cliff IS the measurement
                out[name][m] = f"FAILED: {type(exc).__name__}: " + (
                    "StackOverflowError (plan construction)"
                    if "StackOverflowError" in str(exc)
                    else str(exc)[:120]
                )
            else:
                out[name][m] = round(time.monotonic() - t0, 2)
        print(
            f"merges={m}: expression {out['expression'][m]}, "
            f"joined {out['joined'][m]}",
            file=sys.stderr,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
