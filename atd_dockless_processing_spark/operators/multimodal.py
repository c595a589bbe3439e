"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched
``mapInPandas`` UDFs.

The container has no image/audio codecs (no PIL/ffmpeg), so the
DECODE step is a clearly-marked stub: ``_decode_image`` tries the
real library and falls back to a deterministic fake that computes
byte-level statistics. Everything Spark-side is real and tested —
schema (binary payload + metadata struct), Arrow batch iteration,
per-row fan-out, output schemas — so swapping in a real decoder
changes one function body, not the plan.

Scale notes: binary payloads ride Parquet BYTE_ARRAY columns and
Arrow buffers end-to-end (no base64, no per-row pickling);
``mapInPandas`` streams batches so executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of corpus
size; frame-sampling fan-out multiplies rows INSIDE the Python worker
before the next shuffle, so the exploded rows never cross the
Python->JVM boundary twice. Both keys are rows-only by contract
(binary decode is not SQL-expressible; __spark_entry__.py:35-36).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


def _decode_image(data: bytes) -> tuple[int, float]:
    """Decode an image payload -> (n_bytes, mean_byte).

    STUB: the real path needs an image codec that is not installed in
    this container; the fallback is a deterministic fake over the raw
    bytes so the full Spark plumbing stays testable.
    """
    try:
        from PIL import Image  # noqa: F401  (not installed here)

        raise NotImplementedError(
            "real image decode path: Image.open(io.BytesIO(data)) — "
            "enable when a codec library is available"
        )
    except ImportError:
        pass
    n = len(data)
    mean = (sum(data) / n) if n else 0.0
    return n, round(mean, 4)


def _fake_payload(d: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload binary, meta struct): the text
    bytes stand in for encoded media; metadata is typed and real."""
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            ((F.col("n_chars") % 64) + 1).cast("int").alias("width"),
            ((F.col("n_chars") % 48) + 1).cast("int").alias("height"),
            F.lit("fake-rgb8").alias("format"),
        ).alias("meta"),
    )


@query("mm_decode_stub")  # rows-only: binary decode is not SQL-expressible
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-decode + feature-extract plumbing over binary columns via
    Arrow-batched mapInPandas (decode itself stubbed; see module doc)."""
    payload = _fake_payload(load(spark, sf_dir, "documents"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_image(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    "n_bytes": [n for n, _ in decoded],
                    "mean_byte": [m for _, m in decoded],
                }
            )

    return payload.mapInPandas(
        decode, schema="doc_id long, width int, height int, n_bytes long, mean_byte double"
    )


_FRAME_STRIDE = 4
_FRAME_BYTES = 16


@query("mm_frame_sample")  # rows-only: frame extraction is not SQL-expressible
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: every ``_FRAME_STRIDE``-th frame
    of a fake video payload fans out to its own row inside the Python
    worker (1 input row -> N output rows per Arrow batch), the shape
    of frame extraction / audio chunking in a multimodal pipeline."""
    payload = _fake_payload(load(spark, sf_dir, "documents")).withColumn(
        "n_frames", ((F.col("doc_id") % 24) + 8).cast("int")
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, data, n_frames in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                for i in range(0, int(n_frames), _FRAME_STRIDE):
                    start = (i * _FRAME_BYTES) % max(len(data) - _FRAME_BYTES, 1)
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(data[start : start + _FRAME_BYTES]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames})

    return payload.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame_bytes binary"
    )
