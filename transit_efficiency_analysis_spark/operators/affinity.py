"""Hashed n-gram domain-affinity scoring for data selection.

The data-selection shape behind DSIR ("Data Selection for Language
Models via Importance Resampling", Xie et al. 2023) and the
fastText-classifier filters of CCNet/LLaMA-style pipelines: score every
raw document by how much its hashed n-gram profile looks like a TARGET
domain, then keep the best-scoring slice. This implementation uses a
linear per-bucket frequency ratio in exact ppm integers instead of
log-probability sums — the repo-wide determinism convention (same trick
as the collocations PMI lift: integer ppm is engine-bit-equal, float
``ln`` is not guaranteed to round identically across engines; the
per-bucket ratio is monotone in the log-ratio, the document score is the
count-weighted linear-ratio mean).

Plan shape (100 TB): one bigram explode over the corpus (~corpus
tokens) feeding two bounded aggregations — the per-(bucket, domain)
totals table is AT MOST ``n_buckets`` rows regardless of corpus size,
so the ratio table broadcasts; scoring is the explode re-aggregated per
document (doc-keyed shuffle). Nothing data-proportional crosses the
wire except the (doc_id, bucket) feature rows. The feature hash is md5
(engine-identical, the functions/text.py convention).

Not present in the reference repo (BASELINE.json north star): part of
the LLM-training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIGRAMS = "transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))"


def domain_affinity_scores(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """(id, n_feats, affinity_ppm) — hashed-bigram target-domain affinity.

    ``is_target`` marks the documents that define the target domain
    (they are scored too — a sanity check is that they score high).
    Per bucket b: ratio_ppm(b) = (t_b * R * 10^6) div (r_b * T) with
    add-one smoothing on both counts; a document's score is the mean
    ratio over its bigram occurrences (integer div). All arithmetic is
    integral (DECIMAL(38,0) intermediates), so results are bit-equal
    across engines and partitionings. Documents with < 2 tokens have no
    bigrams and are excluded.
    """
    w = F.split(F.col(text_col), " ")
    # min-parallelism guard (guide §2.6 / §6): the bigram explode +
    # per-bigram md5 hashing is the expensive per-row work here and it
    # is computed by BOTH branches (bucket totals and scoring), so a
    # single-split input serializes it twice on one core (measured at
    # sf0.1: two ~0.8 s one-task stages). No-op whenever the scan has
    # splits ≥ cores — the 100 TB case.
    from transit_efficiency_analysis_spark.operators.parallel import (
        ensure_min_parallelism,
    )

    base = ensure_min_parallelism(
        docs.select(
            F.col(id_col), is_target.alias("tgt"), w.alias("w")
        ).where(F.size("w") >= 2)
    )
    feats = base.select(
        id_col, "tgt", F.explode(F.expr(_BIGRAMS)).alias("f")
    ).select(
        id_col,
        "tgt",
        (F.conv(F.substring(F.md5("f"), 1, 8), 16, 10).cast("long")
         % n_buckets).alias("b"),
    )
    buckets = feats.groupBy("b").agg(
        (F.sum(F.when(F.col("tgt"), 1).otherwise(0)) + 1).alias("t_b"),
        (F.sum(F.when(~F.col("tgt"), 1).otherwise(0)) + 1).alias("r_b"),
    )
    tot = buckets.agg(F.sum("t_b").alias("tt"), F.sum("r_b").alias("rr"))
    ratios = buckets.join(F.broadcast(tot)).select(
        "b",
        F.expr(
            "CAST(CAST(t_b AS DECIMAL(38,0)) * rr * 1000000"
            " DIV (CAST(r_b AS DECIMAL(38,0)) * tt) AS BIGINT)"
        ).alias("ppm"),
    )
    scores = feats.join(F.broadcast(ratios), "b").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_feats"),
        F.sum("ppm").alias("s"),
    )
    return scores.select(
        id_col,
        "n_feats",
        F.expr("CAST(s DIV n_feats AS BIGINT)").alias("affinity_ppm"),
    )
