"""Error-bound tests for the sketch operators.

The demos now emit the oracle-exact side plus a boolean within-bounds
verdict (hash-checkable by the driver); these tests assert the verdicts
actually hold AND independently re-derive the bounds so a demo that
hard-coded ``True`` would still fail here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.sources.registry import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = load_registry()["q_approx_distinct"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r["within_3rsd"] for r in rows)
    # independent re-derivation: the sketch really is near the exact count
    e = load_table(spark, sf_dir, "events")
    check = {
        r["event_type"]: (r["approx_users"], r["exact_users"])
        for r in e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .collect()
    }
    for r in rows:
        approx, exact = check[r["event_type"]]
        assert exact == r["exact_users"]
        # rsd=0.02 → generous 10% acceptance band (rsd is a std-dev, not a max)
        assert abs(approx - exact) <= max(0.1 * exact, 2)


def test_approx_quantiles_bracket_exact(spark, sf_dir):
    rows = load_registry()["q_approx_quantiles"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r["within_5pct"] for r in rows)
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], {})[r["quantile"]] = r
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["q"]
        for r in li.groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice", F.lit(0.5)).alias("q"))
        .collect()
    }
    for flag, qs in by_flag.items():
        assert set(qs) == {"0.25", "0.50", "0.90", "0.99"}
        # discrete exact element at ceil(n/2) brackets the interpolated median
        assert abs(qs["0.50"]["exact_price"] - exact[flag]) / exact[flag] < 0.05


def test_cms_topk_overestimates_within_collision_bound(spark, sf_dir):
    """CMS invariants re-derived independently: est >= exact always (min
    of counters that each include the token's own count), and the
    overestimate is bounded by the total collision mass N·d/w with slack.
    A hard-coded est = exact would also pass here, so additionally check
    the sketch against a pure-Python mirror of one counter row."""
    import hashlib

    rows = load_registry()["q_approx_topk_cms"].fn(spark, sf_dir).collect()
    assert len(rows) == 8
    tokens = [
        r["t"]
        for r in load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") != "")
        .collect()
    ]
    n_total = len(tokens)
    from collections import Counter

    exact = Counter(tokens)
    row0 = Counter(
        int(hashlib.md5(f"cms0|{t}".encode()).hexdigest()[:8], 16) % 512
        for t in tokens
    )
    for r in rows:
        assert r["exact_n"] == exact[r["token"]]
        assert r["cms_est"] >= r["exact_n"]
        assert r["cms_est"] - r["exact_n"] <= 4 * n_total // 512
        pos0 = int(hashlib.md5(f"cms0|{r['token']}".encode()).hexdigest()[:8], 16) % 512
        assert r["cms_est"] <= row0[pos0]  # est is min over rows ≤ row-0 counter
