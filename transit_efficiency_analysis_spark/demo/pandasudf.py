"""Pandas-UDF surface demos: Arrow-batched scalar UDF and applyInPandas
group-map, both verified against SQL oracles.

These prove the engine's slow-path contract: when Python is genuinely
needed, it runs vectorized over Arrow batches — and the demos pin the
Python results to engine-portable SQL semantics (order-insensitive math
only: min/max ranges, sort-based medians — no float accumulation whose
order could differ between pandas and SQL).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transit_efficiency_analysis_spark.demo import demo
from transit_efficiency_analysis_spark.sources.registry import load_table


@F.pandas_udf(T.StringType())
def _normalize_text(s: pd.Series) -> pd.Series:
    """Vectorized text normalization (lower + squeeze whitespace + strip)."""
    return s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()


@demo(
    "q_pandas_udf_scalar",
    sql="""
    SELECT doc_id,
           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text
    FROM documents
    """,
)
def q_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar Pandas UDF (10-100x over row-at-a-time Python);
    results must equal the pure-SQL normalization."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", _normalize_text("text").alias("norm_text"))


_RANGE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("range_pos", T.DoubleType(), True),
        T.StructField("group_median", T.DoubleType(), True),
    ]
)


def _range_normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group min-max position + exact median — order-insensitive math
    only (min/max/sorted-middle), so any row arrival order gives identical
    doubles."""
    lo, hi = pdf["value"].min(), pdf["value"].max()
    span = hi - lo
    vals = sorted(pdf["value"])
    n = len(vals)
    # linear interpolation written exactly like quantile_cont: lo + (hi-lo)*f
    # ((a+b)/2 is NOT the same floating-point expression)
    med = vals[n // 2] if n % 2 else vals[n // 2 - 1] + (vals[n // 2] - vals[n // 2 - 1]) * 0.5
    out = pdf[["user_id", "event_id", "value"]].copy()
    out["range_pos"] = 0.5 if span == 0 else (pdf["value"] - lo) / span
    out["group_median"] = med
    return out


_RANGE_NORMALIZE_SQL = """
    SELECT user_id, event_id, value,
           CASE WHEN hi = lo THEN 0.5 ELSE (value - lo) / (hi - lo) END AS range_pos,
           med AS group_median
    FROM (
        SELECT user_id, event_id, value,
               min(value) OVER (PARTITION BY user_id) AS lo,
               max(value) OVER (PARTITION BY user_id) AS hi,
               quantile_cont(value, 0.5) OVER (PARTITION BY user_id) AS med
        FROM events
    )
    """


@demo("q_range_normalize", sql=_RANGE_NORMALIZE_SQL)
def q_range_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user min-max normalization + exact median as NATIVE window
    functions — the 100 TB scale path for the same semantics as
    ``q_apply_in_pandas`` (no Python workers, no per-group pandas frame, so
    a skewed hot user can't blow a worker's memory; stays inside
    whole-stage codegen except the percentile window)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    w = Window.partitionBy("user_id")
    lo = F.min("value").over(w)
    hi = F.max("value").over(w)
    med = F.percentile("value", F.lit(0.5)).over(w)
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.when(hi == lo, F.lit(0.5)).otherwise((F.col("value") - lo) / (hi - lo)).alias(
            "range_pos"
        ),
        med.alias("group_median"),
    )


@demo("q_apply_in_pandas", sql=_RANGE_NORMALIZE_SQL)
def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas group-map: per-user min-max normalization + exact
    median, one pandas frame per group (the custom-operator escape hatch
    when built-ins can't express the semantics). ``q_range_normalize`` is
    the native-window scale path with identical semantics — that one is
    the bench headline; this one proves the Python surface."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return e.groupBy("user_id").applyInPandas(_range_normalize, schema=_RANGE_SCHEMA)

@demo(
    "q_map_in_arrow",
    sql="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           list_inner_product(CAST(embedding AS DOUBLE[]),
                              CAST(embedding AS DOUBLE[])) AS sq_norm
    FROM embeddings
    """,
)
def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the lowest-overhead Python batch surface: the
    UDF receives raw ``pyarrow.RecordBatch``es (no pandas conversion at
    all) and yields batches back. Per-vector squared norm over the
    embeddings table; the fold runs LEFT-TO-RIGHT in float64, matching
    the sequential fold both `F.aggregate` (the JVM path the similarity
    operators use) and DuckDB's ``list_inner_product`` evaluate — float
    addition is order-sensitive, so parity comes from pinning the
    order, not from tolerance. Map-only: zero shuffles, payload column
    pruned nothing (the vector IS the input)."""
    import pyarrow as pa

    def batches(it):
        for batch in it:
            tbl = batch.to_pydict()
            ids, dims, norms = [], [], []
            for vid, vec in zip(tbl["vec_id"], tbl["embedding"]):
                acc = 0.0
                for x in vec:
                    acc += float(x) * float(x)
                ids.append(vid)
                dims.append(len(vec))
                norms.append(acc)
            yield pa.RecordBatch.from_pydict(
                {"vec_id": pa.array(ids, pa.int64()),
                 "dim": pa.array(dims, pa.int32()),
                 "sq_norm": pa.array(norms, pa.float64())}
            )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInArrow(batches, "vec_id BIGINT, dim INT, sq_norm DOUBLE")


@demo(
    "q_arrow_udf_scalar",
    sql="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def q_arrow_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``arrow_udf`` (Spark 4.1's typed Arrow scalar UDF — the third
    Python batch surface beside pandas_udf and mapInArrow): the UDF
    receives/returns ``pyarrow.Array`` and computes entirely in Arrow
    compute kernels (C++-vectorized, no pandas object conversion).
    Unicode char count + UTF-8 byte count per document — both exact
    integers, so the oracle (``length`` / ``octet_length``) pins the
    kernel semantics including multi-byte code points. Map-side only."""
    import pyarrow as pa
    import pyarrow.compute as pc

    # NOTE: no type annotations on the UDF bodies — this module uses
    # `from __future__ import annotations`, which stringifies them, and
    # arrow_udf's signature inspection rejects string annotations
    # (UNSUPPORTED_SIGNATURE).
    @F.arrow_udf(T.LongType())
    def _nchars(s):
        return pc.cast(pc.utf8_length(s), pa.int64())

    @F.arrow_udf(T.LongType())
    def _nbytes(s):
        return pc.cast(pc.binary_length(pc.cast(s, pa.binary())), pa.int64())

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        _nchars("text").alias("n_chars"),
        _nbytes("text").alias("n_bytes"),
    )
