"""Multimodal (image/audio/video) column plumbing.

Design: media lives in opaque ``binary`` columns with typed metadata
structs alongside. Decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages — one Python invocation per batch, not
per row, with the binary payloads staying columnar end-to-end.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT present in this
environment, so the decode kernels are stubbed: ``decode_image_stub``
raises ``NotImplementedError`` unless given the deterministic fake decoder
used by the tests. Everything around the kernel — schema contracts,
partition sizing, batch shape, null passthrough — is real and tested; a
deployment swaps ``_fake_decode`` for the real codec without touching the
plan.

Scale notes: binary payloads dominate I/O, so the scan must prune metadata
queries to metadata columns (parquet column pruning gives this for free);
``spark.sql.files.maxPartitionBytes`` should be sized so one partition of
payloads fits executor memory; feature extraction is map-only (no shuffle).
"""

from __future__ import annotations

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
    channels) from payload bytes. Replace with PIL/libvips in deployment."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, 3)


def extract_image_meta(
    df: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, int]] | None = None,
    payload_col: str = "payload",
) -> DataFrame:
    """Decode payloads → metadata rows via Arrow-batched ``mapInPandas``.

    ``decoder`` maps payload bytes → (width, height, channels). Without an
    injected decoder this raises ``NotImplementedError`` at execution time
    (the real codec libraries are not bundled here); tests inject
    ``_fake_decode``.
    """
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder is None:
                raise NotImplementedError(
                    "no image decoder available in this environment; "
                    "inject one (e.g. PIL-based) via the decoder argument"
                )
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
