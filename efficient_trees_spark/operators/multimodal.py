"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct —
the 100 TB-pipeline pattern where payload bytes stay opaque to the planner and
all decode/feature work happens in Arrow-batched Python (``mapInPandas``),
partition-parallel, with an explicit output schema.

The decode step itself is STUBBED in this environment (no image/audio libs in
the container — see the build brief): ``decode_image`` raises
``NotImplementedError`` unless a decoder library is importable, while
``fake_image_features`` provides a deterministic byte-level featurizer so the
Spark-side plumbing (schema, batch iteration, partitioning) is real and
tested end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

N_HISTOGRAM_BINS = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("histogram", ArrayType(DoubleType())),
    ]
)


def to_binary_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Simulate a multimodal ingest: payload = utf-8 bytes of the text column,
    metadata = (n_bytes, content md5) struct computed JVM-side."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        ).alias("meta"),
    )


def fake_image_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic stand-in for an image featurizer, with the REAL pipeline
    shape: Arrow batches in, explicit schema out, one Python worker per
    partition.  'Decodes' dimensions from the first bytes and emits a
    normalized 16-bin byte histogram."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = b"" if payload is None else bytes(payload)
                if not data:
                    rows.append((int(doc_id), 0, 0, [0.0] * N_HISTOGRAM_BINS))
                    continue
                width = data[0] % 64 + 1
                height = data[min(1, len(data) - 1)] % 64 + 1
                hist = [0] * N_HISTOGRAM_BINS
                for b in data:
                    hist[b * N_HISTOGRAM_BINS // 256] += 1
                total = float(len(data))
                rows.append(
                    (int(doc_id), width, height, [round(h / total, 9) for h in hist])
                )
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "histogram"])

    return df.select(id_col, payload_col).mapInPandas(featurize, FEATURE_SCHEMA)


def _resize_schema(id_col: str, payload_col: str) -> StructType:
    """Output schema for :func:`resize_image`, keyed by the caller's id and
    payload columns — non-default names keep their names in the output
    (same contract as :func:`_decode_schema`)."""
    return StructType(
        [
            StructField(id_col, LongType()),
            StructField(payload_col, BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )


RESIZE_SCHEMA = _resize_schema("doc_id", "payload")


def resize_image(
    df: DataFrame,
    target_width: int = 16,
    target_height: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: str = "auto",
) -> DataFrame:
    """Resize step of an image pipeline — payload in, smaller payload out.

    The Spark plumbing is the real thing (Arrow-batched ``mapInPandas``,
    binary-in/binary-out with an explicit schema — the shape a thumbnailing
    or model-input-normalization pass has at scale).  Two decoders, same
    pattern as :func:`decode_image`:

    - ``decoder='auto'`` (default): where Pillow is importable ON THE
      WORKER, each payload is really decoded, resized (nearest-neighbor)
      to ``target_width x target_height``, and re-encoded as PNG bytes;
      payloads that fail to decode (poison blobs, non-image bytes, NULLs)
      degrade per-row to the deterministic byte-level stand-in instead of
      failing the stage.  Without Pillow, every row takes the stand-in.
    - ``decoder='fake'``: always the byte-level stand-in (nearest-neighbor
      index mapping over the flat byte stream) — environment-independent,
      the mode oracle-checked suites should pin.

    Stand-in payloads have exactly ``target_width * target_height`` bytes;
    really-decoded payloads are PNG-encoded (variable length).
    """
    if decoder not in ("auto", "fake"):
        raise ValueError(f"decoder must be 'auto' or 'fake', got {decoder!r}")
    n_out = int(target_width) * int(target_height)

    def _resample(data: bytes) -> bytes:
        if not data:
            return bytes(n_out)
        # nearest-neighbor index mapping over the flat byte stream
        step = len(data) / n_out
        return bytes(data[min(int(i * step), len(data) - 1)] for i in range(n_out))

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = None
        if decoder == "auto":
            try:  # import on the worker — driver importability is irrelevant
                from PIL import Image  # noqa: F811
            except ImportError:
                Image = None

        def one(data: bytes) -> bytes:
            if Image is not None and data:
                import io

                try:
                    img = Image.open(io.BytesIO(data))
                    img.load()
                    out = io.BytesIO()
                    img.resize(
                        (int(target_width), int(target_height)),
                        Image.Resampling.NEAREST,
                    ).save(out, format="PNG")
                    return out.getvalue()
                except Exception:
                    pass  # poison blob -> deterministic stand-in row
            return _resample(data)

        for pdf in batches:
            rows = [
                (
                    int(doc_id),
                    one(b"" if payload is None else bytes(payload)),
                    target_width,
                    target_height,
                )
                for doc_id, payload in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows, columns=[id_col, payload_col, "width", "height"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        resize, _resize_schema(id_col, payload_col)
    )


def _decode_schema(id_col: str) -> StructType:
    """Output schema for :func:`decode_image`, keyed by the caller's id
    column — a non-default ``id_col`` keeps its name in the output (it used
    to be silently renamed to ``doc_id``)."""
    return StructType(
        [
            StructField(id_col, LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mode", StringType()),
            StructField("histogram", ArrayType(DoubleType())),
        ]
    )


DECODE_SCHEMA = _decode_schema("doc_id")


def decode_image(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Real image decode via Pillow, when importable: payload bytes ->
    (width, height, mode, normalized 16-bin grayscale histogram), the same
    Arrow-batched ``mapInPandas`` shape as :func:`fake_image_features` —
    only the inner decode differs.  Undecodable/empty payloads degrade to a
    (0, 0, NULL, zeros) row instead of failing the batch — at corpus scale
    a poison blob must never kill the stage.  Raises ``NotImplementedError``
    when no decoder library ships in the environment (this container), in
    which case ``fake_image_features`` keeps the plumbing testable."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - exercised via tests
        raise NotImplementedError(
            "image decoding requires Pillow (not available in this environment); "
            "use fake_image_features() for pipeline plumbing, or install a decoder"
        ) from exc

    import io

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from PIL import Image  # import on the worker, not just the driver

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = b"" if payload is None else bytes(payload)
                try:
                    img = Image.open(io.BytesIO(data))
                    img.load()
                    gray = img.convert("L")
                    h256 = gray.histogram()
                    total = float(sum(h256)) or 1.0
                    hist = [
                        round(sum(h256[i * 16 : (i + 1) * 16]) / total, 9)
                        for i in range(N_HISTOGRAM_BINS)
                    ]
                    rows.append(
                        (int(doc_id), img.width, img.height, img.mode, hist)
                    )
                except Exception:
                    rows.append(
                        (int(doc_id), 0, 0, None, [0.0] * N_HISTOGRAM_BINS)
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "mode", "histogram"]
            )

    return df.select(id_col, payload_col).mapInPandas(decode, _decode_schema(id_col))


FRAME_BYTES = 64
MAX_FRAMES = 8

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
        StructField("frame_len", IntegerType()),
    ]
)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = FRAME_BYTES,
    max_frames: int = MAX_FRAMES,
) -> DataFrame:
    """Sample fixed-size byte frames from a binary payload — the video
    frame-sampling pipeline shape: one input row fans out to up to
    ``max_frames`` frame rows (``mapInPandas``, Arrow batches, explicit
    schema; the decode itself is the deterministic byte slicing stand-in
    this container permits — a real build swaps the slicer for a video
    decoder without touching the Spark plumbing).

    Frames are ``frame_bytes`` wide; sampling stride = ceil(n_frames /
    max_frames) keeps the output bounded for arbitrarily long payloads —
    the property that makes this safe against 10 GB outlier blobs at scale.
    """
    import hashlib
    import math

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = b"" if payload is None else bytes(payload)
                n_frames = math.ceil(len(data) / frame_bytes)
                if n_frames == 0:
                    continue
                stride = max(1, math.ceil(n_frames / max_frames))
                for idx in range(0, n_frames, stride):
                    frame = data[idx * frame_bytes : (idx + 1) * frame_bytes]
                    rows.append(
                        (int(doc_id), idx, hashlib.md5(frame).hexdigest(), len(frame))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_md5", "frame_len"]
            )

    return df.select(id_col, payload_col).mapInPandas(sample, FRAME_SCHEMA)
