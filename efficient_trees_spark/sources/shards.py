"""Training-shard export: the last mile of a corpus pipeline.

A trainer wants the curated corpus as N roughly-equal shards whose
membership and row order are DETERMINISTIC (re-running the export after a
cluster retry or a code change must byte-reproduce the shards, or data
order silently changes the training run).  Spark-first shape:

* shard assignment is a pure projection — ``pmod(xxhash64(id, seed), N)``;
  no sampling, no driver state, reproducible under task retry by
  construction (never ``rand()``);
* ONE shuffle moves each row to its shard's writer task
  (``repartition(N, shard)``), and rows sort WITHIN each shard by a second
  seeded hash — a deterministic pseudo-random training order, so no global
  sort ever happens;
* the manifest (per-shard rows/tokens) is the same relation re-aggregated —
  map-side combined, vocabulary... shard-sized output.

At 100 TB: N is thousands; xxhash64 spreads uniformly so shard skew is
O(sqrt); the shuffle is the unavoidable data move and the only one paid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SHARD_COL = "shard"


def assign_shards(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Add a deterministic ``shard`` column in [0, n_shards)."""
    return df.withColumn(
        SHARD_COL,
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards)).cast("int"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    token_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Write ``df`` as ``n_shards`` hive-partitioned parquet shards with
    deterministic membership AND in-shard order; returns the manifest
    ``(shard, n_rows[, n_tokens])`` (small — collect or write as the
    caller prefers).

    In-shard order is ``xxhash64(id, seed+1)`` with ``id`` as tie-break — a
    reproducible pseudo-random training order that needs no global sort and
    no row_number window."""
    sharded = assign_shards(df, id_col, n_shards, seed)
    # The sort LEADS with the partition column: the partitionBy writer
    # requires its input ordered by partition columns and would otherwise
    # insert its own sort, destroying the training order.
    (
        sharded.repartition(n_shards, SHARD_COL)
        .sortWithinPartitions(
            SHARD_COL, F.xxhash64(F.col(id_col), F.lit(seed + 1)), F.col(id_col)
        )
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .parquet(path)
    )
    # Manifest from the WRITTEN files, not the unpersisted input relation —
    # re-aggregating `sharded` would execute the whole upstream pipeline a
    # second time; the read-back also audits what actually landed on disk.
    written = df.sparkSession.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    return written.groupBy(F.col(SHARD_COL).cast("int").alias(SHARD_COL)).agg(*aggs)


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int,
    shard_col: str | None = None,
    drop_last: bool = True,
    sep_token=None,
) -> DataFrame:
    """Pack variable-length token documents into FIXED-length training
    sequences — the step between tokenization (``BpeTokenizer.encode_ids``)
    and shard export that every pretraining pipeline runs: trainers consume
    constant-shape rows, so documents are concatenated back-to-back in a
    deterministic order and the stream is cut every ``seq_len`` tokens
    (documents span sequence boundaries; nothing is padded or lost except
    an optional final partial sequence).

    Output: ``([shard_col,] seq_id, tokens)`` where ``tokens`` is a
    ``seq_len``-sized array (the trailing partial sequence is dropped when
    ``drop_last``, kept shorter otherwise) and ``seq_id`` numbers
    sequences 0.. within each shard (globally when ``shard_col`` is None).

    Plan shape at 100 TB:

    * **offsets** — one row per DOCUMENT (not per token) carries its
      cumulative start offset via a prefix-sum window ordered by
      ``id_col``.  With ``shard_col`` the window partitions by shard —
      parallelism = shards, each a bounded slice; with ``None`` the
      prefix sum serializes on one task (fine for a gate corpus, wrong
      for a corpus that doesn't fit one executor — PASS A SHARD COLUMN,
      e.g. from :func:`assign_shards`, and shard boundaries simply become
      independent token streams).
    * **cut** — ``posexplode`` lifts tokens with their global position
      (map-side, no shuffle), each token's (sequence, position) is pure
      arithmetic, and ONE shuffle groups tokens into their sequence — the
      unavoidable data move, same volume as the shard writer's.
    * **determinism** — document order is (``id_col``) total order and
      positions are arithmetic, so output is identical under any input
      partitioning (test-asserted) and re-derivable by an external engine.

    ``sep_token`` (the GPT-style EOS/document separator) appends one
    token of the stream's element type to every non-empty document before
    packing, so document boundaries survive inside the fixed sequences;
    empty/NULL documents still contribute nothing.  Positions stay exact
    to 2^53 stream tokens (~9 petatokens) — the double division below is
    exact far beyond any real corpus.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    part = [F.col(shard_col)] if shard_col else [F.lit(0)]
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = F.col(tokens_col)
    if sep_token is not None:
        toks = F.concat(toks, F.array(F.lit(sep_token)))
    sized = docs.filter(
        F.col(tokens_col).isNotNull() & (F.size(F.col(tokens_col)) > 0)
    ).select(
        *( [F.col(shard_col)] if shard_col else [] ),
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__sz"),
    )
    offs = sized.withColumn("__off", F.coalesce(F.sum("__sz").over(w), F.lit(0)))
    exploded = offs.select(
        *( [F.col(shard_col)] if shard_col else [] ),
        F.col("__off"),
        F.posexplode("__toks").alias("__pos", "__tok"),
    ).select(
        *( [F.col(shard_col)] if shard_col else [] ),
        ((F.col("__off") + F.col("__pos")) / seq_len).cast("long").alias("seq_id"),
        ((F.col("__off") + F.col("__pos")) % seq_len).alias("__sp"),
        F.col("__tok"),
    )
    keys = ([shard_col] if shard_col else []) + ["seq_id"]
    packed = (
        exploded.groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__sp"), F.col("__tok")))
            ).alias("__a")
        )
        .select(
            *keys,
            F.transform("__a", lambda x: x["__tok"]).alias("tokens"),
        )
    )
    if drop_last:
        packed = packed.filter(F.size("tokens") == seq_len)
    return packed
