"""Multimodal (image/audio/video) column plumbing.

Design: media lives in opaque ``binary`` columns with typed metadata
structs alongside. Decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages — one Python invocation per batch, not
per row, with the binary payloads staying columnar end-to-end.

Decode kernels: two REAL dependency-free header parsers are bundled —
``decode_bmp`` (BMP/BITMAPINFOHEADER) and ``decode_wav_header`` (RIFF/WAVE
PCM), both trivial public formats — so the decode path runs ungated end to
end. Rich codecs (JPEG/PNG via PIL, video via ffmpeg) are not in this
container; inject one through the ``decoder`` argument in deployment —
the plan shape does not change.

Scale notes: binary payloads dominate I/O, so the scan must prune metadata
queries to metadata columns (parquet column pruning gives this for free);
``spark.sql.files.maxPartitionBytes`` should be sized so one partition of
payloads fits executor memory; feature extraction is map-only (no shuffle).
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata contract for a decoded image payload
IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata adapter: treat each document's utf-8 bytes as an opaque
    media payload (binary column + minimal typed metadata)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.octet_length(payload).alias("n_bytes"),
        F.lit("application/octet-stream").alias("content_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: derives (width, height,
    channels) from payload bytes. Useful for plumbing tests whose payloads
    are not real images."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, 3)


def encode_bmp(width: int, height: int) -> bytes:
    """Minimal 24-bit bottom-up BMP (public format): 14-byte file header +
    40-byte BITMAPINFOHEADER + zeroed 4-byte-aligned pixel rows. Synthesis
    side of ``decode_bmp`` for demos/tests (and a legitimate thumbnail
    sink shape)."""
    row = (width * 3 + 3) // 4 * 4
    image_size = row * height
    file_size = 54 + image_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    return header + info + bytes(image_size)


def decode_bmp(payload: bytes) -> tuple[int, int, int]:
    """REAL image metadata decode for the BMP container (public spec —
    BITMAPINFOHEADER at offset 14: i32 width, i32 height, u16 bpp at 28).
    Returns (width, height, channels); raises ``ValueError`` on non-BMP
    payloads. Negative height (top-down BMP) is normalized."""
    if len(payload) < 30 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    return (abs(width), abs(height), max(1, bpp // 8))


def extract_image_meta(
    df: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, int]] | None = None,
    payload_col: str = "payload",
) -> DataFrame:
    """Decode payloads → metadata rows via Arrow-batched ``mapInPandas``.

    ``decoder`` maps payload bytes → (width, height, channels); the
    default is the bundled real BMP parser (``decode_bmp``). Inject a
    PIL/libvips-backed callable for JPEG/PNG in deployment — the plan
    shape is identical.
    """
    import hashlib

    if decoder is None:
        decoder = decode_bmp

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf[payload_col].map(lambda b: decoder(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf[payload_col].map(len).astype("int32"),
                    "content_md5": pdf[payload_col].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "n_channels": dims.map(lambda d: d[2]).astype("int32"),
                }
            )

    return df.mapInPandas(_batches, schema=IMAGE_META_SCHEMA)


#: metadata contract for a decoded audio payload
AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate_hz", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)


def encode_wav(n_channels: int, sample_rate: int, bits: int, n_frames: int) -> bytes:
    """Minimal PCM WAV (public RIFF/WAVE spec): fmt chunk + zeroed data
    chunk. Synthesis side of ``decode_wav_header``."""
    block_align = n_channels * bits // 8
    data_size = n_frames * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", data_size) + bytes(data_size)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_header(payload: bytes) -> tuple[int, int, int, int]:
    """REAL audio metadata decode for PCM WAV (public RIFF spec): walks the
    chunk list for ``fmt `` and ``data``. Returns (n_channels,
    sample_rate_hz, bits_per_sample, n_frames)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    channels = rate = bits = None
    data_size = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack_from("<I", payload, i + 4)
        if cid == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", payload, i + 8)
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or data_size is None:
        raise ValueError("missing fmt/data chunk")
    n_frames = data_size // (channels * bits // 8)
    return (channels, rate, bits, n_frames)


def extract_audio_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """WAV payloads → typed audio metadata via Arrow-batched
    ``mapInPandas`` (map-only: decode parallelism is the scan's
    partitioning). ``duration_s = n_frames / sample_rate`` exactly."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = pdf[payload_col].map(lambda b: decode_wav_header(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_channels": metas.map(lambda m: m[0]).astype("int32"),
                    "sample_rate_hz": metas.map(lambda m: m[1]).astype("int32"),
                    "bits_per_sample": metas.map(lambda m: m[2]).astype("int32"),
                    "n_frames": metas.map(lambda m: m[3]).astype("int64"),
                    "duration_s": metas.map(lambda m: m[3] / m[1]),
                }
            )

    return df.mapInPandas(_batches, schema=AUDIO_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing demo: deterministic byte-offset sampling of
    the payload (stands in for video frame extraction — same shape: one
    input row fans out to N sampled chunks). Pure column expressions."""
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.octet_length("payload") - 1, F.lit(0)),
        F.lit(every_n_bytes),
    )
    return df.select(
        "doc_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )


def encode_bmp_gradient(width: int, height: int) -> bytes:
    """24-bit BMP whose pixel at stored (x, y) has all three channels equal
    to ``(7*x + 13*y) % 256``. The gradient makes downstream pixel
    arithmetic SQL-predictable: a nearest-neighbor downscale by ``s``
    samples stored coordinates (s*x, s*y), so the resized image's pixel
    values — and therefore its channel sum — are a closed-form function of
    the output dimensions alone (see ``q_multimodal_resize``'s oracle)."""
    row = (width * 3 + 3) // 4 * 4
    image_size = row * height
    header = struct.pack("<2sIHHI", b"BM", 54 + image_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    pixels = bytearray(image_size)
    for y in range(height):
        base = y * row
        for x in range(width):
            v = (7 * x + 13 * y) % 256
            o = base + x * 3
            pixels[o] = pixels[o + 1] = pixels[o + 2] = v
    return header + info + bytes(pixels)


def resize_bmp_nearest(payload: bytes, scale: int) -> bytes:
    """REAL nearest-neighbor downscale for 24-bit BMP payloads: decodes the
    header, samples every ``scale``-th stored row/column (output dims are
    ceil(dim/scale)), and re-encodes a valid 4-byte-row-aligned BMP.
    Pure-Python over the public format — a production deployment swaps in
    a vips/PIL kernel through ``resize_images``'s ``kernel`` argument; the
    Spark plan shape is identical."""
    width, height, _ = decode_bmp(payload)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if bpp != 24:
        raise ValueError(f"resize_bmp_nearest supports 24bpp only, got {bpp}")
    row = (width * 3 + 3) // 4 * 4
    nw, nh = (width + scale - 1) // scale, (height + scale - 1) // scale
    nrow = (nw * 3 + 3) // 4 * 4
    out = bytearray(nrow * nh)
    for sy in range(nh):
        src = 54 + (sy * scale) * row
        dst = sy * nrow
        for sx in range(nw):
            o = src + (sx * scale) * 3
            out[dst + sx * 3 : dst + sx * 3 + 3] = payload[o : o + 3]
    header = struct.pack("<2sIHHI", b"BM", 54 + len(out), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, nw, nh, 1, 24, 0, len(out), 2835, 2835, 0, 0
    )
    return header + info + bytes(out)


#: output contract for a resize stage: the resized payload plus its
#: decoded dimensions and the channel-value sum over its pixel bytes
RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    scale: int = 2,
    kernel: Callable[[bytes, int], bytes] | None = None,
    payload_col: str = "payload",
) -> DataFrame:
    """Resize payloads via Arrow-batched ``mapInPandas`` (map-only — no
    shuffle; payload I/O dominates, so size ``maxPartitionBytes`` to the
    payload column). ``kernel`` maps (payload, scale) → resized payload;
    the default is the bundled real BMP nearest-neighbor kernel.
    ``pixel_sum`` totals the resized pixel bytes (row padding is zero) so
    callers can verify the kernel produced exactly the expected pixels,
    not just plausible dimensions."""
    if kernel is None:
        kernel = resize_bmp_nearest

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf[payload_col].map(lambda b: kernel(bytes(b), scale))
            dims = resized.map(decode_bmp)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "n_bytes": resized.map(len).astype("int32"),
                    "pixel_sum": resized.map(lambda b: sum(b[54:])).astype("int64"),
                }
            )

    return df.mapInPandas(_batches, schema=RESIZED_IMAGE_SCHEMA)


def bmp_pixel_features(payload: bytes, bins: int = 8) -> dict:
    """Feature extraction over a 24bpp BMP payload: per-channel-sample
    count, exact ppm mean, min/max, and a ``bins``-bin intensity
    histogram (bin = v div (256/bins)). Row padding bytes are excluded
    (the classic off-by-stride bug this function exists to encapsulate).
    numpy-vectorized — the per-batch cost is the byte scan, not Python
    loops; a production deployment swaps richer extractors (embeddings,
    EXIF) behind the same mapInPandas seam."""
    import numpy as np

    width, height, _ = decode_bmp(payload)
    row = (width * 3 + 3) // 4 * 4
    arr = np.frombuffer(payload, dtype=np.uint8, offset=54)
    pixels = arr[: row * height].reshape(height, row)[:, : width * 3]
    flat = pixels.reshape(-1).astype(np.int64)
    hist = np.bincount(flat >> int(np.log2(256 // bins)), minlength=bins)
    n = int(flat.size)
    total = int(flat.sum())
    return {
        "n_samples": n,
        "mean_ppm": (total * 1_000_000) // n,
        "min_v": int(flat.min()),
        "max_v": int(flat.max()),
        "hist": [int(c) for c in hist],
    }
