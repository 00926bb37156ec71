"""Headline benchmark: runs the engine's flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed with a count-style action (df.count() after the full
plan) so results are materialized without driver-side collection overhead
dominating the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.session import get_spark

#: headline set — the flagship pipeline + the heaviest operator families.
#: FROZEN as of round 3: this list must not change between rounds so BENCH
#: files stay comparable query-for-query. If coverage ever must change,
#: keep this list intact and report the additional queries separately.
HEADLINE = [
    "q_rebuild_full",
    "q_join_star",
    "q_sql_tpch_q1",
    "q_agg_dashboard",
    "q_upsert_cond",
    "q_window_session",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash_pairs",
    "q_sim_bruteforce_topk",
    "q_sim_lsh_topk",
    "q_text_quality",
    # native-window form of the group-map normalization (the scale path);
    # q_apply_in_pandas stays as the Python-surface demo outside the headline
    "q_range_normalize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    registry = load_registry()

    # warm the JVM/session and the Python worker pool so boot cost isn't in
    # query times (Arrow workers cold-start ~1-2s per executor thread)
    spark.range(1).count()
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(1000).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm("id")
    ).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in registry:
            continue
        t0 = time.time()
        df = registry[name].fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
