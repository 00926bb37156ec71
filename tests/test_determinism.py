"""Determinism under re-partitioning (docs/SCALE.md contract).

Results must not depend on how Spark splits the data — fundamental for
resumable 100 TB jobs and for the oracle gate. This re-runs the most
partitioning-sensitive demos (decimal-sum aggregates, decimal-fold LSH
buckets, md5-min minhash + count-join Jaccard, integer-ppm BM25) with a
radically different shuffle-partition count and scan split size and
requires BIT-IDENTICAL output. Caches are cleared so persisted relations
can't short-circuit the recompute.
"""

from __future__ import annotations

import pytest

from transit_efficiency_analysis_spark.demo import load_registry

_SENSITIVE = [
    "q_agg_dashboard",      # decimal sums + exact-decimal averages
    "q_sim_lsh_buckets",    # decimal-fold hyperplane signs
    "q_dedup_minhash_lsh",  # md5 band minima + count-join Jaccard
    "q_retrieval_bm25",     # integer ppm scores + top-k tie-break
    "q_graph_pagerank",     # iterative integer rank updates over a loop
    "q_approx_topk_cms",    # md5 counter grid + count-desc/token-asc tie-break
    "q_stats_regression",   # decimal-exact OLS sums, one closing division
    "q_sim_centroid_outliers",  # milli-integer sums + (d2, vec_id) tie-break
    "q_events_retention",   # epoch-week integers + ppm division
    "q_graph_triangles",    # degree-ordered orientation + top-k tie-break
    "q_layout_zorder",      # global rank -> chunk boundaries
    "q_events_attribution", # ignore-nulls running last over (ts, event_id)
    "q_clean_mad_outliers", # two exact rank selections + 3xMAD threshold
    "q_sample_temperature", # IEEE sqrt fractions + md5 membership
    "q_sim_int8_quantize",  # decimal->nano-integer codes and error sums
    "q_stats_drift_tvd",    # ppm-share histogram L1 gap
]


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow
def test_partitioning_invariance(spark, sf_dir):
    reg = load_registry()
    spark.catalog.clearCache()
    base = {n: _canon(reg[n].fn(spark, sf_dir)) for n in _SENSITIVE}
    old = {
        k: spark.conf.get(k)
        for k in ("spark.sql.shuffle.partitions", "spark.sql.files.maxPartitionBytes")
    }
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        spark.catalog.clearCache()  # no cache reuse across the two regimes
        for n in _SENSITIVE:
            assert _canon(reg[n].fn(spark, sf_dir)) == base[n], (
                f"{n} output depends on partitioning"
            )
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
        spark.catalog.clearCache()
