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
Python->JVM boundary twice. All three decode keys are HASH-CHECKED
as of round 5: ``mm_frame_sample``'s staged raw-video container and
``mm_decode_stub``'s BMP pixel buffer are both built from closed
forms the DuckDB oracle recomputes (the ``mm_decode_wav`` pattern —
for BMP, cyclic byte sums over the document's ASCII bytes).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, stage_scratch


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


def _decode_image(data: bytes) -> tuple[int, int, int, int, int]:
    """Decode an image payload -> (width, height, bpp, n_bytes,
    px_sum) by parsing the ACTUAL bytes.

    BMP is parsed for real (struct.unpack of the two headers, numpy
    view of the pixel array with stride padding trimmed; px_sum is
    the int64-exact sum of the trimmed pixel bytes — integer so the
    cross-engine check has zero FP hazard). Any other magic raises
    NotImplementedError: those formats need a codec library
    (PIL/ffmpeg) that is intentionally not a dependency — this
    function is the one seam where it would plug in.
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
    return width, abs(height), bpp, len(data), int(rows.astype(np.int64).sum())


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


@query(
    "mm_decode_stub",
    oracle="""
    WITH g AS (
      SELECT doc_id, text, n_chars AS L,
             (n_chars % 64) + 1 AS w,
             (n_chars % 48) + 1 AS h,
             ((3 * ((n_chars % 64) + 1) + 3) // 4) * 4 AS stride
      FROM documents
    ), chars AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS p,
             ascii(substr(text, CAST(i AS INTEGER), 1)) AS b
      FROM (SELECT doc_id, text,
                   UNNEST(generate_series(1, L)) AS i
            FROM g)
    ), tot AS (
      SELECT doc_id, SUM(b) AS tb FROM chars GROUP BY doc_id
    ), pre AS (
      SELECT g.doc_id, COALESCE(SUM(c.b), 0) AS pre_rem
      FROM g LEFT JOIN chars c
        ON c.doc_id = g.doc_id AND c.p < (g.stride * g.h) % g.L
      GROUP BY g.doc_id
    ), pad AS (
      SELECT pp.doc_id, SUM(ch.b) AS pad_sum
      FROM (
        SELECT doc_id, (r * stride + c) % L AS p
        FROM (
          SELECT doc_id, L, stride,
                 UNNEST(generate_series(3 * w, stride - 1)) AS c, r
          FROM (SELECT doc_id, L, stride, w,
                       UNNEST(generate_series(0, h - 1)) AS r
                FROM g)
        )
      ) pp JOIN chars ch ON ch.doc_id = pp.doc_id AND ch.p = pp.p
      GROUP BY pp.doc_id
    )
    SELECT g.doc_id,
           CAST(g.w AS INTEGER) AS width,
           CAST(g.h AS INTEGER) AS height,
           CAST(24 AS INTEGER) AS bpp,
           CAST(54 + g.stride * g.h AS BIGINT) AS n_bytes,
           CAST((g.stride * g.h // g.L) * t.tb + p.pre_rem
                - COALESCE(pd.pad_sum, 0) AS BIGINT) AS px_sum
    FROM g
    JOIN tot t ON t.doc_id = g.doc_id
    JOIN pre p ON p.doc_id = g.doc_id
    LEFT JOIN pad pd ON pd.doc_id = g.doc_id
    """,
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + feature extraction over binary columns via
    Arrow-batched mapInPandas. The BMP path is a REAL decode: width/
    height/bpp are unpacked from each payload's actual header bytes,
    n_bytes from the file length, and px_sum from the stride-trimmed
    pixel array (the key keeps its historical name; only non-BMP
    formats remain stubbed — see module docstring).

    HASH-CHECKED as of round 5 (previously rows-only): the BMP pixel
    buffer is the document's ASCII bytes cycled to stride*height,
    so the oracle re-derives every figure in closed form — byte at
    0-based index i is ascii(text[i % L]); full-buffer sum =
    (img_size // L)*total + prefix(img_size % L); the trimmed px_sum
    subtracts the <=3*height pad-column bytes (lateral
    generate_series join, <=144 positions/doc). A wrong header
    offset, stride formula, trim bound, or row order flips px_sum.
    Integer-exact on both engines — no FP hazard anywhere."""
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
                    "px_sum": [d[4] for d in decoded],
                }
            )

    return payload.mapInPandas(
        decode,
        schema="doc_id long, width int, height int, bpp int, n_bytes long, px_sum long",
    )


_FRAME_STRIDE = 4
_FRAME_MAGIC = b"RVID"


def _video_dims(doc_id: int) -> tuple[int, int, int]:
    """Deterministic per-video (n_frames, width, height) — closed form
    shared with the oracle SQL."""
    return 8 + doc_id % 24, 8 + (doc_id % 3) * 4, 8


def _stage_videos(spark: SparkSession, sf_dir: str) -> str:
    """Stage one REAL raw-video container per selected document
    (doc_id % 5): 16-byte header (magic + ``<III`` n_frames/width/
    height via struct.pack) + n_frames contiguous gray8 frames whose
    pixel bytes follow the closed form px(f, i) = (doc_id*31 + f*7 +
    i*13) % 256. The encode runs DISTRIBUTED through mapInPandas and
    the staged parquet carries (doc_id, video BINARY) ONLY — every
    downstream value must come out of the byte-level decode."""

    def build(indir: str) -> None:
        def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for did in pdf["doc_id"]:
                    did = int(did)
                    n_frames, w, h = _video_dims(did)
                    idx = np.arange(w * h, dtype=np.int64)
                    frames = [
                        ((did * 31 + f * 7 + idx * 13) % 256).astype(np.uint8).tobytes()
                        for f in range(n_frames)
                    ]
                    hdr = _FRAME_MAGIC + struct.pack("<III", n_frames, w, h)
                    out.append((did, hdr + b"".join(frames)))
                yield pd.DataFrame(out, columns=["doc_id", "video"])

        vids = (
            load(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 5 == 0)
            .select("doc_id")
        )
        (
            vids.mapInPandas(encode, "doc_id long, video binary")
            .write.mode("overwrite")
            .parquet(indir)
        )

    return stage_scratch("mm_video", sf_dir, "documents", build)


@query(
    "mm_frame_sample",
    oracle="""
    WITH vids AS (
      SELECT doc_id FROM documents WHERE doc_id % 5 = 0
    ), dims AS (
      SELECT doc_id,
             8 + doc_id % 24 AS n_frames,
             8 + (doc_id % 3) * 4 AS w,
             8 AS h
      FROM vids
    ), frames AS (
      SELECT d.doc_id, d.n_frames, d.w, d.h, f.k AS frame_idx
      FROM dims d CROSS JOIN range(32) f(k)
      WHERE f.k < d.n_frames AND f.k % 4 = 0
    ), px AS (
      SELECT fr.doc_id, fr.frame_idx, fr.n_frames, fr.w, fr.h,
             SUM((fr.doc_id * 31 + fr.frame_idx * 7 + p.i * 13) % 256)
               AS sum_px
      FROM frames fr CROSS JOIN range(128) p(i)
      WHERE p.i < fr.w * fr.h
      GROUP BY fr.doc_id, fr.frame_idx, fr.n_frames, fr.w, fr.h
    )
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(n_frames AS INT) AS n_frames,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(sum_px AS BIGINT) AS sum_px,
           CAST(sum_px AS DOUBLE) / (w * h) AS mean_px
    FROM px
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling, HASH-CHECKED (upgraded from rows-only in
    round 5 — frame extraction from a raw container needs no codec):
    the staged table carries only (doc_id, video BINARY); this query
    validates the RVID magic, struct.unpacks n_frames/width/height
    from the actual header bytes, slices every ``_FRAME_STRIDE``-th
    frame out of the contiguous gray8 frame data (1 input row -> N
    output rows inside the Arrow batch), and emits each sampled
    frame's exact pixel sum and mean luminance. The oracle recomputes
    the same figures from the pre-encode closed form, so a wrong
    header offset, stride slip, or off-by-one frame slice flips the
    hash.

    Exactness: sum_px accumulates in int64 (exact, <= 128*255) and
    mean_px = sum_px / (w*h) is the same correctly-rounded IEEE
    division on both engines — no ROUND needed.

    Scale shape: stateless mapInPandas, zero shuffle — the fan-out
    (one row per sampled frame) happens INSIDE the Python worker, so
    per-frame rows never cross the Python->JVM boundary twice, and
    executor memory is bounded by the Arrow batch size regardless of
    corpus size. This is the real-ffmpeg template: swap the body for
    a container demuxer and the plumbing (schema, batching, binary
    transport, per-frame fan-out) is unchanged."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, buf in zip(pdf["doc_id"], pdf["video"]):
                buf = bytes(buf)
                if buf[:4] != _FRAME_MAGIC:
                    raise ValueError(f"doc {did}: not an RVID container")
                n_frames, w, h = struct.unpack_from("<III", buf, 4)
                fsize = w * h
                for f in range(0, n_frames, _FRAME_STRIDE):
                    frame = np.frombuffer(
                        buf, dtype=np.uint8, count=fsize, offset=16 + f * fsize
                    )
                    sum_px = int(frame.astype(np.int64).sum())
                    rows.append(
                        (
                            int(did),
                            f,
                            int(n_frames),
                            int(w),
                            int(h),
                            sum_px,
                            sum_px / fsize,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "frame_idx",
                    "n_frames",
                    "width",
                    "height",
                    "sum_px",
                    "mean_px",
                ],
            )

    vids = spark.read.parquet(_stage_videos(spark, sf_dir))
    return vids.mapInPandas(
        sample,
        "doc_id long, frame_idx int, n_frames int, width int, height int, "
        "sum_px long, mean_px double",
    )
