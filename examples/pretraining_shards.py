"""Pretokenized training-shard export — the tokenizer's real deliverable.

What a pretraining data team ships to the trainer is not symbol strings:
it is SHARDS OF INT TOKEN IDS with a per-shard token-count manifest (the
trainer schedules steps off the manifest without opening a shard).  This
example composes the whole story end to end, Spark-first (extension
surface beyond the reference — see COVERAGE.md):

1. train    — distributed BPE merge-table training (one corpus shuffle,
              vocabulary-sized rounds, operators/bpe.py)
2. artifact — persist/reload the tokenizer as an engine-independent JSON
              artifact (train where the corpus lives, encode anywhere)
3. encode   — int token ids per BpeTokenizer.vocab() order (UNK = -1),
              zero extra shuffle over the symbol encode
4. shard    — deterministic membership + in-shard pseudo-random order
              (sources/shards.py: pure-projection assignment, ONE shuffle)
5. manifest — per-shard rows AND token counts, read back from the written
              parquet (auditing what actually landed on disk)

Run: python examples/pretraining_shards.py  [SPARK_GRAFT_SF_DIR to scale]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from efficient_trees_spark.operators import bpe
from efficient_trees_spark.session import get_spark
from efficient_trees_spark.sources import shards

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
out_root = tempfile.mkdtemp(prefix="pretraining_shards_")

spark = get_spark(app_name="pretraining-shards-example")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

# 1-2. train the tokenizer, round-trip it through the JSON artifact (the
# encode below deliberately uses the RELOADED artifact, proving the
# train-here / encode-anywhere hand-off).
tok = bpe.fit_bpe(docs, n_merges=24)
artifact = os.path.join(out_root, "tokenizer.json")
tok.save(artifact)
tok = bpe.BpeTokenizer.load(artifact)
vocab = tok.vocab()
print(f"tokenizer: {len(tok.merges)} merges, vocab size {len(vocab)} "
      f"(first merged symbols: {vocab[-len(tok.merges):][:4]})")

# 3. int-id encode + per-doc token counts in one pass.  n_tokens rides
# along so the shard writer can manifest token counts without re-encoding.
encoded = tok.encode_ids(docs).select(
    "doc_id",
    "bpe_ids",
    F.coalesce(F.size("bpe_ids"), F.lit(0)).alias("n_tokens"),
)

# 4-5. deterministic shards + manifest read back from the written files.
shard_dir = os.path.join(out_root, "shards")
manifest = shards.write_training_shards(
    encoded, shard_dir, id_col="doc_id", n_shards=8, token_col="n_tokens"
)
rows = manifest.orderBy("shard").collect()
total_rows = sum(r["n_rows"] for r in rows)
total_tokens = sum(r["n_tokens"] for r in rows)
print(f"wrote {len(rows)} shards to {shard_dir}: "
      f"{total_rows} docs, {total_tokens} tokens")
for r in rows:
    print(f"  shard {r['shard']}: {r['n_rows']} docs, {r['n_tokens']} tokens")

# Audit: the trainer's view (shard files) must carry exactly the corpus's
# token volume, and ids must be within the vocab id space (UNK = -1).
back = spark.read.parquet(shard_dir)
check = back.agg(
    F.sum(F.size("bpe_ids")).alias("toks"),
    F.min(F.array_min("bpe_ids")).alias("lo"),
    F.max(F.array_max("bpe_ids")).alias("hi"),
).first()
assert check["toks"] == total_tokens, "manifest/token-volume mismatch"
assert check["lo"] >= -1 and check["hi"] < len(vocab), "id out of vocab space"
print(f"audit ok: id range [{check['lo']}, {check['hi']}], "
      f"vocab space [{-1}, {len(vocab) - 1}]")

# 6. sequence packing: the trainer consumes CONSTANT-shape rows — pack the
# per-shard token-id streams into fixed 512-token sequences (documents
# span boundaries; the per-shard trailing partial is dropped).  Packing
# reads the WRITTEN shards, so the shard column doubles as the packing
# stream key — each shard stays an independent, deterministic stream.
SEQ_LEN = 512
seqs = shards.pack_sequences(
    back, id_col="doc_id", tokens_col="bpe_ids",
    seq_len=SEQ_LEN, shard_col="shard",
)
stats = seqs.agg(
    F.count(F.lit(1)).alias("n_seq"),
    F.sum(F.size("tokens")).alias("packed_toks"),
).first()
assert stats["packed_toks"] == stats["n_seq"] * SEQ_LEN
dropped = total_tokens - stats["packed_toks"]
print(f"packed {stats['n_seq']} sequences x {SEQ_LEN} tokens "
      f"({stats['packed_toks']} of {total_tokens}; "
      f"{dropped} tokens in dropped per-shard partials)")
spark.stop()
