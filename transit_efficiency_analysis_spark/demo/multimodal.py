"""Multimodal plumbing demo: binary payload column → Arrow-batched
``mapInPandas`` metadata extraction, verified against a SQL oracle.

The decode kernel is the deterministic fake (the real codecs aren't in the
container — ``operators/multimodal.py``); what this demo proves end-to-end
is the *plumbing*: binary columns survive the scan, the Pandas UDF batch
contract produces the declared schema, and the Python path is numerically
identical to the SQL oracle (md5 / byte-length agree with DuckDB).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.demo._tmpcache import process_dir_cache
from transit_efficiency_analysis_spark.operators.multimodal import (
    _fake_decode,
    attach_payload,
    encode_bmp,
    encode_wav,
    encode_bmp_gradient,
    extract_audio_meta,
    extract_image_meta,
    frame_sample_plan,
    resize_images,
)
from transit_efficiency_analysis_spark.sources.registry import load_table

#: per-process binaryFile feed dirs, keyed by sf_dir; rmtree'd at exit
_BINFILES_CACHE = process_dir_cache()


@demo(
    "q_multimodal_meta",
    sql="""
    SELECT doc_id,
           CAST(n AS INTEGER) AS n_bytes,
           md5(text) AS content_md5,
           CAST(n % 640 + 1 AS INTEGER) AS width,
           CAST(n % 480 + 1 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS n_channels
    FROM (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents)
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal decode plumbing: documents' utf-8 bytes as opaque payloads
    → mapInPandas metadata extraction (deterministic fake decoder)."""
    d = load_table(spark, sf_dir, "documents")
    return extract_image_meta(attach_payload(d), decoder=_fake_decode)


@demo(
    "q_multimodal_frames",
    sql="""
    SELECT doc_id,
           CAST(unnest(generate_series(0, (octet_length(encode(text)) - 1) // 64))
                AS INTEGER) AS frame_idx,
           CAST(unnest(generate_series(0, (octet_length(encode(text)) - 1) // 64)) * 64
                AS INTEGER) AS byte_offset
    FROM documents
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frame-sampling plumbing: one payload row fans out to N sampled
    offsets (the video-frame-extraction shape) as pure column expressions."""
    d = load_table(spark, sf_dir, "documents")
    return frame_sample_plan(attach_payload(d), every_n_bytes=64)


def _bmp_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize real BMP payloads with SQL-predictable dimensions
    (width from text length, height from doc_id) in a mapInPandas encode
    stage — the decode side then runs the bundled REAL parser."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.octet_length(F.encode("text", "utf-8")) % 64 + 1).alias("w"),
        (F.col("doc_id") % 48 + 1).alias("h"),
    )

    def _encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_bmp(int(w), int(h)) for w, h in zip(pdf["w"], pdf["h"])
                    ],
                }
            )

    return d.mapInPandas(_encode, schema="doc_id long, payload binary")


@demo(
    "q_multimodal_bmp",
    sql="""
    SELECT doc_id,
           CAST(54 + ((w * 3 + 3) // 4 * 4) * h AS INTEGER) AS n_bytes,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS n_channels
    FROM (SELECT doc_id, octet_length(encode(text)) % 64 + 1 AS w,
                 doc_id % 48 + 1 AS h
          FROM documents)
    """,
)
def q_multimodal_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode path: synthesized BMP payloads → bundled
    BITMAPINFOHEADER parser via mapInPandas → typed metadata. The oracle
    predicts every field (incl. the 4-byte-aligned file size) from the
    public format's arithmetic."""
    bmps = _bmp_corpus(spark, sf_dir)
    return extract_image_meta(bmps).select(
        "doc_id", "n_bytes", "width", "height", "n_channels"
    )


@demo(
    "q_multimodal_wav",
    sql="""
    SELECT doc_id,
           CAST(doc_id % 2 + 1 AS INTEGER) AS n_channels,
           CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate_hz,
           CAST(16 AS INTEGER) AS bits_per_sample,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_frames,
           CAST(octet_length(encode(text)) AS DOUBLE)
               / (8000 + (doc_id % 3) * 4000) AS duration_s
    FROM documents
    """,
)
def q_multimodal_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode path: synthesized PCM WAV payloads → bundled
    RIFF chunk-walker via mapInPandas → channels/rate/bits/frames/duration."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 2 + 1).alias("ch"),
        (F.lit(8000) + (F.col("doc_id") % 3) * 4000).alias("rate"),
        F.octet_length(F.encode("text", "utf-8")).alias("nf"),
    )

    def _encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_wav(int(c), int(r), 16, int(n))
                        for c, r, n in zip(pdf["ch"], pdf["rate"], pdf["nf"])
                    ],
                }
            )

    wavs = d.mapInPandas(_encode, schema="doc_id long, payload binary")
    return extract_audio_meta(wavs)


@demo(
    "q_multimodal_resize",
    sql="""
    WITH rd AS (
        SELECT doc_id,
               (octet_length(encode(text)) % 64 + 1 + 1) // 2 AS nw,
               (doc_id % 48 + 1 + 1) // 2 AS nh
        FROM documents
    )
    SELECT r.doc_id,
           CAST(r.nw AS INTEGER) AS width,
           CAST(r.nh AS INTEGER) AS height,
           CAST(54 + ((r.nw * 3 + 3) // 4 * 4) * r.nh AS INTEGER) AS n_bytes,
           CAST(sum(3 * ((14 * gx.sx + 26 * gy.sy) % 256)) AS BIGINT) AS pixel_sum
    FROM rd r,
         LATERAL unnest(generate_series(0, r.nw - 1)) AS gx(sx),
         LATERAL unnest(generate_series(0, r.nh - 1)) AS gy(sy)
    GROUP BY r.doc_id, r.nw, r.nh
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize path: gradient BMPs (pixel (x,y) = (7x+13y)%256)
    → bundled nearest-neighbor downscale-by-2 kernel via map-only
    ``mapInPandas`` → dimensions, aligned file size, AND the pixel-byte
    sum of the resized payload. Because nearest-neighbor sampling turns
    the gradient into (14*sx + 26*sy)%256 over the OUTPUT grid, the
    oracle recomputes the exact pixel sum arithmetically (double
    generate_series) — the driver hash therefore verifies the kernel
    emitted exactly the right pixels, not just plausible metadata."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.octet_length(F.encode("text", "utf-8")) % 64 + 1).alias("w"),
        (F.col("doc_id") % 48 + 1).alias("h"),
    )

    def _encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_bmp_gradient(int(w), int(h))
                        for w, h in zip(pdf["w"], pdf["h"])
                    ],
                }
            )

    bmps = d.mapInPandas(_encode, schema="doc_id long, payload binary")
    return resize_images(bmps, scale=2).select(
        "doc_id", "width", "height", "n_bytes", "pixel_sum"
    )


@demo(
    "q_src_binary_files",
    sql="""
    SELECT doc_id,
           CAST(54 + ((w * 3 + 3) // 4 * 4) * h AS INTEGER) AS n_bytes,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS n_channels
    FROM (SELECT doc_id, octet_length(encode(text)) % 64 + 1 AS w,
                 doc_id % 48 + 1 AS h
          FROM documents)
    WHERE doc_id < 24
    """,
)
def q_src_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source — the missing first link of the multimodal
    chain: raw media FILES on disk/object store → (path, length,
    content) rows → the binary-column world every other multimodal demo
    operates in. A bounded BMP subset (doc_id < 24; the bounded
    driver-side materialization convention of ``demo/ingest.py``) is
    written one file per image, read back distributed via
    ``spark.read.format("binaryFile")`` with a ``*.bmp`` glob, the
    doc id recovered from the filename (``regexp_extract`` on the
    source's path column — the standard partition-by-filename idiom),
    and the REAL BITMAPINFOHEADER parser decodes the content column.
    The demo cross-checks the source's ``length`` against the decoded
    byte count in-plan; the oracle predicts every field from the public
    format's arithmetic. At 100 TB this source is how petabytes of
    images/audio enter: file listing parallelizes across executors,
    content is read at the task, nothing funnels through the driver."""
    import os

    corpus = _bmp_corpus(spark, sf_dir).where(F.col("doc_id") < 24)
    # Per-process private dir (the _MAT_CACHE pattern, demo/analytics.py):
    # a fixed shared path would race two concurrent runs — one process
    # deleting/rewriting files mid-listing of the other's binaryFile scan.
    # The feed is deterministic per sf_dir, so write once per process.
    out = _BINFILES_CACHE.get(sf_dir)
    if out is None:
        import tempfile

        out = tempfile.mkdtemp(prefix="teas_binfiles_")
        for r in corpus.collect():  # bounded: 24 rows
            with open(os.path.join(out, f"img_{r['doc_id']}.bmp"), "wb") as f:
                f.write(bytes(r["payload"]))
        _BINFILES_CACHE[sf_dir] = out
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(out)
        .select(
            F.regexp_extract(F.col("path"), r"img_(\d+)\.bmp$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("length").alias("src_length"),
            F.col("content").alias("payload"),
        )
    )
    meta = extract_image_meta(files.select("doc_id", "payload"))
    return (
        meta.join(files.select("doc_id", "src_length"), "doc_id")
        .where(F.col("n_bytes") == F.col("src_length"))  # source-length check
        .select("doc_id", "n_bytes", "width", "height", "n_channels")
    )


@demo(
    "q_multimodal_features",
    sql="""
    WITH d AS (
        SELECT doc_id, octet_length(encode(text)) % 64 + 1 AS w,
               doc_id % 48 + 1 AS h
        FROM documents
    ),
    px AS (
        SELECT d.doc_id, d.w, d.h, (7 * gx.x + 13 * gy.y) % 256 AS v
        FROM d,
             LATERAL unnest(generate_series(0, d.w - 1)) AS gx(x),
             LATERAL unnest(generate_series(0, d.h - 1)) AS gy(y)
    )
    SELECT doc_id,
           CAST(w * h * 3 AS BIGINT) AS n_samples,
           CAST((sum(v) * 3 * 1000000) // (w * h * 3) AS BIGINT) AS mean_ppm,
           CAST(min(v) AS BIGINT) AS min_v,
           CAST(max(v) AS BIGINT) AS max_v,
           CAST(sum(CASE WHEN v // 32 = 0 THEN 3 ELSE 0 END) AS BIGINT) AS bin_0,
           CAST(sum(CASE WHEN v // 32 = 1 THEN 3 ELSE 0 END) AS BIGINT) AS bin_1,
           CAST(sum(CASE WHEN v // 32 = 2 THEN 3 ELSE 0 END) AS BIGINT) AS bin_2,
           CAST(sum(CASE WHEN v // 32 = 3 THEN 3 ELSE 0 END) AS BIGINT) AS bin_3,
           CAST(sum(CASE WHEN v // 32 = 4 THEN 3 ELSE 0 END) AS BIGINT) AS bin_4,
           CAST(sum(CASE WHEN v // 32 = 5 THEN 3 ELSE 0 END) AS BIGINT) AS bin_5,
           CAST(sum(CASE WHEN v // 32 = 6 THEN 3 ELSE 0 END) AS BIGINT) AS bin_6,
           CAST(sum(CASE WHEN v // 32 = 7 THEN 3 ELSE 0 END) AS BIGINT) AS bin_7
    FROM px
    GROUP BY doc_id, w, h
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal FEATURE EXTRACTION — the binary → numeric-vector step
    of an image pipeline (the brief's decode / feature-extract / resize /
    frame-sample quartet): gradient BMPs decoded by the bundled real
    parser into per-image features (sample count, exact ppm mean
    intensity, min/max, 8-bin histogram), numpy-vectorized inside a
    map-only ``mapInPandas`` with BMP row padding correctly excluded
    (the off-by-stride class of bug the oracle would catch). Because the
    gradient pixel at (x, y) is (7x+13y)%256, the oracle recomputes
    every feature — including all 8 histogram bins — arithmetically
    over the coordinate grid, so the driver hash verifies the exact
    extracted vector, not plausible-looking statistics."""
    from transit_efficiency_analysis_spark.operators.multimodal import (
        bmp_pixel_features,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.octet_length(F.encode("text", "utf-8")) % 64 + 1).alias("w"),
        (F.col("doc_id") % 48 + 1).alias("h"),
    )

    def _extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"]):
                f = bmp_pixel_features(encode_bmp_gradient(int(w), int(h)))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": f["n_samples"],
                        "mean_ppm": f["mean_ppm"],
                        "min_v": f["min_v"],
                        "max_v": f["max_v"],
                        **{f"bin_{i}": f["hist"][i] for i in range(8)},
                    }
                )
            yield pd.DataFrame(rows)

    schema = (
        "doc_id long, n_samples long, mean_ppm long, min_v long, max_v long, "
        + ", ".join(f"bin_{i} long" for i in range(8))
    )
    return d.mapInPandas(_extract, schema=schema)
