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

from pyspark.sql import DataFrame
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
