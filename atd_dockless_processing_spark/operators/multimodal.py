"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed by Arrow-batched
``mapInPandas`` UDFs.

The decode step is REAL for BMP: payloads are genuine BMP files
(14-byte file header + 40-byte BITMAPINFOHEADER + 24-bit pixel array
with 4-byte row stride), built with ``struct.pack`` in an encode
stage and parsed back with ``struct.unpack`` in the decode stage —
width/height/bpp come from the actual header bytes and the mean pixel
value from the actual (stride-trimmed) pixel array. No codec library
is involved because none is needed for BMP; formats that DO need one
(JPEG/PNG/audio/video) raise a clearly-marked NotImplementedError in
``_decode_image`` — that single dispatch point is where PIL/ffmpeg
would plug in.

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

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


def _encode_bmp(text: bytes, width: int, height: int) -> bytes:
    """Build a valid 24-bit BMP whose pixel bytes cycle the document's
    text bytes (deterministic content, real format)."""
    stride = (3 * width + 3) & ~3  # BMP rows pad to 4-byte alignment
    img_size = stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    src = text if text else b"\x00"
    reps = -(-img_size // len(src))  # ceil division
    return header + (src * reps)[:img_size]


def _decode_image(data: bytes) -> tuple[int, int, int, int, float]:
    """Decode an image payload -> (width, height, bpp, n_bytes,
    mean_px) by parsing the ACTUAL bytes.

    BMP is parsed for real (struct.unpack of the two headers, numpy
    view of the pixel array with stride padding trimmed). Any other
    magic raises NotImplementedError: those formats need a codec
    library (PIL/ffmpeg) that is intentionally not a dependency —
    this function is the one seam where it would plug in.
    """
    if data[:2] != b"BM":
        raise NotImplementedError(
            "only BMP decodes without a codec library; plug PIL/ffmpeg "
            "in here for JPEG/PNG/audio/video payloads"
        )
    offset = struct.unpack_from("<I", data, 10)[0]
    _hdr_size, width, height, _planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    stride = ((bpp // 8) * width + 3) & ~3
    px = np.frombuffer(data, dtype=np.uint8, count=stride * abs(height), offset=offset)
    rows = px.reshape(abs(height), stride)[:, : (bpp // 8) * width]  # trim pad
    return width, abs(height), bpp, len(data), round(float(rows.mean()), 4)


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


def _bmp_payload(d: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload binary): payload is a REAL BMP
    file built inside the Python worker (encode stage)."""
    src = _fake_payload(d)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        _encode_bmp(bytes(t), m["width"], m["height"])
                        for t, m in zip(pdf["payload"], pdf["meta"])
                    ],
                }
            )

    return src.mapInPandas(encode, schema="doc_id long, payload binary")


@query("mm_decode_stub")  # rows-only: binary decode is not SQL-expressible
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + feature extraction over binary columns via
    Arrow-batched mapInPandas. The BMP path is a REAL decode: width/
    height/bpp are unpacked from each payload's actual header bytes
    and mean_px from its actual pixel array (the key keeps its
    historical name; only non-BMP formats remain stubbed — see
    module docstring)."""
    payload = _bmp_payload(load(spark, sf_dir, "documents"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_image(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "bpp": [d[2] for d in decoded],
                    "n_bytes": [d[3] for d in decoded],
                    "mean_px": [d[4] for d in decoded],
                }
            )

    return payload.mapInPandas(
        decode,
        schema="doc_id long, width int, height int, bpp int, n_bytes long, mean_px double",
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
