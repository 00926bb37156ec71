"""Scan-parallelism floor for small inputs (round 18).

The driver's testdata tables are single-row-group parquet files, so a
scan is ONE task no matter the split config — and any per-row-expensive
work that Catalyst keeps in the scan stage (interpreted higher-order
shingling, quantize/plane folds feeding a broadcast join, decimal CASE
trees) runs on one core of a 32-core box. ``ensure_min_parallelism``
round-robins such an input up to the session's default parallelism; on
any real deployment (splits ≥ cores) it is a NO-OP by construction, so
it is scale-neutral — it never tunes for local mode, it only refuses to
serialize on degenerate inputs. Measured wins are recorded per call
site (docs/OPTIMIZATION_r18.md).

This generalizes the round-15 guard that lived private in
``operators/similarity.py`` (q_sim_ivf_topk 8.1 s → ~2 s there); the
similarity module now re-exports it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` up to the session's default parallelism when
    its plan inherits fewer partitions than half of it.

    Streaming DataFrames are returned unchanged (``df.rdd`` is illegal
    on them, and a micro-batch's partitioning is the trigger's concern).
    The second clause of the guard keeps single-core sessions
    (target = 1) from a pure-overhead ``repartition(1)`` round trip.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    parts = df.rdd.getNumPartitions()
    if parts < max(target // 2, 2) and parts < target:
        return df.repartition(target)
    return df
