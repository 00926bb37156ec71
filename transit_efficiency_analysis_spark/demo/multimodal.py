"""Multimodal plumbing demo: binary payload column → Arrow-batched
``mapInPandas`` metadata extraction, verified against a SQL oracle.

The decode kernel is the deterministic fake (the real codecs aren't in the
container — ``operators/multimodal.py``); what this demo proves end-to-end
is the *plumbing*: binary columns survive the scan, the Pandas UDF batch
contract produces the declared schema, and the Python path is numerically
identical to the SQL oracle (md5 / byte-length agree with DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.operators.multimodal import (
    _fake_decode,
    attach_payload,
    extract_image_meta,
    frame_sample_plan,
)
from transit_efficiency_analysis_spark.sources.registry import load_table


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
