"""Measure the full pretokenized-shard chain at composition scale.

The example (examples/pretraining_shards.py) proves the chain end to end
at sf0.001 in the smoke test; this tool pins its COST SHAPE at sf0.1 for
SCALE.md: per-stage wall clock and shuffle-write volume for

    train (fit_bpe) -> encode_ids -> write_training_shards ->
    manifest audit -> pack_sequences (512-token)

Shuffle volume comes from the executor summaries (cumulative
totalShuffleWrite, differenced per stage) — the same numbers the Spark UI
reports, read through the app status store since the UI is disabled in
this session profile.

Run: python tools/pretraining_scale.py  [SPARK_GRAFT_SF_DIR to scale]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from efficient_trees_spark.operators import bpe
from efficient_trees_spark.session import get_spark
from efficient_trees_spark.sources import shards

N_MERGES = int(os.environ.get("SPARK_GRAFT_BPE_MERGES", "64"))
N_SHARDS = int(os.environ.get("SPARK_GRAFT_N_SHARDS", "32"))
SEQ_LEN = 512


def shuffle_write_bytes(spark) -> int:
    sc = spark.sparkContext._jsc.sc()
    try:  # drain pending listener events so the totals are current
        sc.listenerBus().waitUntilEmpty(2000)
    except Exception:
        time.sleep(0.5)
    it = sc.statusStore().executorList(False).iterator()
    total = 0
    while it.hasNext():
        total += it.next().totalShuffleWrite()
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_root = tempfile.mkdtemp(prefix="pretraining_scale_")
    spark = get_spark(app_name="pretraining-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    stages: dict[str, dict] = {}

    def timed(name: str, fn):
        w0, t0 = shuffle_write_bytes(spark), time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        stages[name] = {
            "wall_sec": round(wall, 2),
            "shuffle_write_mb": round(
                (shuffle_write_bytes(spark) - w0) / 1e6, 2
            ),
        }
        return out

    tok = timed("train", lambda: bpe.fit_bpe(docs, n_merges=N_MERGES))
    encoded = tok.encode_ids(docs).select(
        "doc_id",
        "bpe_ids",
        F.coalesce(F.size("bpe_ids"), F.lit(0)).alias("n_tokens"),
    )
    shard_dir = os.path.join(out_root, "shards")
    manifest = timed(
        "encode+shard",
        lambda: shards.write_training_shards(
            encoded, shard_dir, id_col="doc_id", n_shards=N_SHARDS,
            token_col="n_tokens",
        ),
    )
    rows = manifest.collect()
    total_tokens = sum(r["n_tokens"] for r in rows)
    back = spark.read.parquet(shard_dir)
    packed = timed(
        "pack",
        lambda: shards.pack_sequences(
            back, id_col="doc_id", tokens_col="bpe_ids",
            seq_len=SEQ_LEN, shard_col="shard",
        )
        .agg(
            F.count(F.lit(1)).alias("n_seq"),
            F.sum(F.size("tokens")).alias("packed_toks"),
        )
        .first(),
    )
    assert packed["packed_toks"] == packed["n_seq"] * SEQ_LEN
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": sum(r["n_rows"] for r in rows),
                "n_merges": N_MERGES,
                "vocab": len(tok.vocab()),
                "n_shards": N_SHARDS,
                "total_tokens": int(total_tokens),
                "seq_len": SEQ_LEN,
                "n_sequences": int(packed["n_seq"]),
                "stages": stages,
                "total_wall_sec": round(
                    sum(s["wall_sec"] for s in stages.values()), 2
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
