"""Per-query measurement harness for the optimization rounds (guide §1).

For each named query: dumps ``explain("formatted")`` to
``plans/<tag>/<name>_<suffix>.txt`` and times the query with BOTH the
bench's count() action (comparability with BENCH_r*.json) and the noop
sink (computes every column — guide §1.4), reporting the median of N runs.

Usage:
    python tools/bench_explain.py <sf_dir> <tag> <suffix> [query ...]

With no query names: the 13 headline + 6 extras. Writes a JSON summary to
stdout; per-run detail to stderr. Jobs are labelled (setJobDescription)
so UI/eventlog analysis can attribute stages.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.session import get_spark

DEFAULT_QUERIES = [
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
    "q_sim_lsh_topk_derived",
    "q_text_quality",
    "q_range_normalize",
    "q_text_dup_spans",
    "q_corpus_domain_affinity",
    "q_sim_lsh_topk",
    "q_sim_ivf_topk",
    "q_sim_ivf_pq_topk",
]


def median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def main() -> None:
    sf_dir = sys.argv[1]
    tag = sys.argv[2]
    suffix = sys.argv[3]
    names = sys.argv[4:] or DEFAULT_QUERIES
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(plans_dir, exist_ok=True)

    evt_dir = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR")
    extra = {}
    if evt_dir:
        os.makedirs(evt_dir, exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evt_dir,
        }
    spark = get_spark("bench_explain", extra_conf=extra)
    registry = load_registry()
    # same warm-up as bench.py: JVM + Arrow python worker pool
    spark.range(1).count()
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(1000).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm("id")
    ).count()

    fns = {}
    for n in names:
        if n == "q_agg_dashboard_materialized_read":
            from transit_efficiency_analysis_spark.demo.analytics import (
                dashboard_read_materialized,
            )

            fns[n] = dashboard_read_materialized
        else:
            fns[n] = registry[n].fn

    # untimed warm-up pass (cache fills land outside the timed region,
    # mirroring bench.py)
    for n, fn in fns.items():
        spark.sparkContext.setJobDescription(f"warmup:{n}")
        fn(spark, sf_dir).count()

    out: dict[str, dict] = {}
    samples_count: dict[str, list[float]] = {n: [] for n in fns}
    samples_noop: dict[str, list[float]] = {n: [] for n in fns}
    for r in range(runs):
        for n, fn in fns.items():
            spark.sparkContext.setJobDescription(f"{n}:count:run{r}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            samples_count[n].append(dt)
            spark.sparkContext.setJobDescription(f"{n}:noop:run{r}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dtn = time.time() - t0
            samples_noop[n].append(dtn)
            print(f"# {n} run{r}: count {dt:.3f}s noop {dtn:.3f}s", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)

    for n, fn in fns.items():
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(plan)
        out[n] = {
            "count_s": round(median(samples_count[n]), 3),
            "noop_s": round(median(samples_noop[n]), 3),
            "count_spread": round(max(samples_count[n]) - min(samples_count[n]), 3),
            "exchanges": plan.count("Exchange"),
            "plan_file": f"plans/{tag}/{n}_{suffix}.txt",
        }
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "queries": out}, indent=1))


if __name__ == "__main__":
    main()
