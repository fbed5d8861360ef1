"""Multimodal-column workloads: binary payloads + metadata on documents."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from efficient_trees_spark.operators import multimodal
from efficient_trees_spark.workloads.base import load, workload


def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload ingest: opaque bytes column + JVM-side typed metadata
    (size, content hash) — payload never crosses into Python.  Registered
    via ``mm_payload_suite``."""
    docs = load(spark, sf_dir, "documents")
    binary = multimodal.to_binary_table(docs, "doc_id", "text")
    return binary.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
    )


@workload(
    "mm_fake_image_features",
    # The fake decode is deterministic byte arithmetic and the documents are
    # pure printable ASCII (byte == char code), so the featurizer has an
    # EXACT SQL twin: width/height from the first two bytes via ascii(),
    # histogram bin 2 (bytes 0x20-0x2f: space + punctuation — the only
    # discriminating low bin for printable text) via an RE2 char-class
    # count.  Valid at any sf while the corpus stays ASCII.
    oracle=r"""
        WITH d AS (
            SELECT doc_id,
                   CASE WHEN length(text) = 0 THEN 0
                        ELSE ascii(substr(text, 1, 1)) % 64 + 1 END AS width,
                   CASE WHEN length(text) = 0 THEN 0
                        WHEN length(text) = 1 THEN ascii(substr(text, 1, 1)) % 64 + 1
                        ELSE ascii(substr(text, 2, 1)) % 64 + 1 END AS height,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE round(CAST(len(regexp_extract_all(text, '[\x20-\x2f]')) AS DOUBLE)
                                   / length(text), 9) END AS bin2
            FROM documents
        )
        SELECT width, count(*) AS n,
               round(avg(height), 6) AS avg_height,
               round(avg(bin2), 6) AS avg_punct_bin
        FROM d GROUP BY width
    """,
    description="Arrow-batched featurizer over binary payloads (mapInPandas, "
    "explicit schema; deterministic fake decode — real decoders are stubbed, "
    "see operators/multimodal.py) aggregated per 'image' width: count, mean "
    "height, mean punctuation-range histogram mass.  The ASCII corpus makes "
    "the byte-level decode exactly SQL-expressible (byte == char code), so "
    "the Python featurizer's output values are in the correctness gate",
    tags=("multimodal",),
)
def mm_fake_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    binary = multimodal.to_binary_table(docs, "doc_id", "text")
    feats = multimodal.fake_image_features(binary)
    return feats.groupBy("width").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("height"), 6).alias("avg_height"),
        # element_at is 1-based: index 3 == histogram bin 2 (bytes 32-47)
        F.round(F.avg(F.element_at("histogram", 3)), 6).alias("avg_punct_bin"),
    )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: one binary payload row fans out to <= 8
    fixed-width byte frames (mapInPandas; stride bounds output for outlier
    blobs).  Registered via ``mm_payload_suite``."""
    docs = load(spark, sf_dir, "documents")
    binary = multimodal.to_binary_table(docs, "doc_id", "text")
    return multimodal.frame_sample(binary)


@workload(
    "mm_payload_suite",
    oracle="""
        WITH d AS (
            SELECT doc_id, text,
                   CAST(ceil(length(text) / 64.0) AS BIGINT) AS n_frames
            FROM documents
        ),
        strided AS (
            SELECT doc_id, text, n_frames,
                   greatest(CAST(ceil(n_frames / 8.0) AS BIGINT), 1) AS stride
            FROM d WHERE n_frames > 0
        ),
        idx AS (
            SELECT doc_id, text,
                   unnest(range(0, n_frames, stride)) AS frame_idx
            FROM strided
        ),
        frames AS (
            SELECT doc_id, frame_idx,
                   md5(substr(text, frame_idx * 64 + 1, 64)) AS frame_md5,
                   length(substr(text, frame_idx * 64 + 1, 64)) AS frame_len
            FROM idx
        )
        SELECT f.doc_id, f.frame_idx, f.frame_md5, f.frame_len,
               octet_length(doc.text::BLOB) AS n_bytes,
               md5(doc.text) AS content_md5
        FROM frames f JOIN documents doc USING (doc_id)
    """,
    description="Multimodal payload suite: opaque binary ingest with "
    "JVM-side typed metadata (byte size, content md5 — the payload never "
    "crosses into Python) joined to video-style frame sampling, where each "
    "payload fans out to <= 8 fixed-width byte frames via an Arrow-batched "
    "mapInPandas with stride bounding outlier blobs.  Documents are pure "
    "ASCII so the byte-slice md5 has an exact VARCHAR oracle",
    tags=("multimodal", "suite"),
)
def mm_payload_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Composed from the two leg functions (not re-derived inline) so the
    # suite and the standalone legs can never drift apart.
    meta = mm_binary_metadata(spark, sf_dir)
    # The metadata side is tiny relative to the fan-out side at corpus scale
    # and keyed identically — broadcast keeps the join shuffle-free.
    return mm_frame_sample(spark, sf_dir).join(F.broadcast(meta), "doc_id")
