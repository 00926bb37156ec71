"""Semantic contracts of the time-series/analytics demos added in round 5:
gap-fill + forward-fill, incremental aggregate maintenance, and the
strict-order funnel. The oracle gate already proves DuckDB parity; these
pin the SEMANTICS (fill carries the right value, the incremental merge is
lossless vs a one-pass aggregate, funnel counts shrink monotonically) so
a future refactor can't keep parity while changing meaning on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.demo.analytics import (
    q_agg_incremental_maintenance,
    q_events_funnel,
)
from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.demo.windowed import q_ts_gapfill_ffill
from transit_efficiency_analysis_spark.sources.registry import load_table


def test_gapfill_spine_is_dense_and_fill_carries_last_value(spark, sf_dir):
    out = q_ts_gapfill_ffill(spark, sf_dir).orderBy("user_id", "day").collect()

    by_user: dict = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)

    e = load_table(spark, sf_dir, "events")
    spans = {
        r.user_id: (r.d0, r.d1)
        for r in e.groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1"))
        .collect()
    }

    for uid, rows in by_user.items():
        d0, d1 = spans[uid]
        # dense daily spine covering exactly [first obs day, last obs day]
        assert rows[0].day == d0 and rows[-1].day == d1
        assert len(rows) == (d1 - d0).days + 1
        assert all(
            (b.day - a.day).days == 1 for a, b in zip(rows, rows[1:])
        ), f"gap in spine for user {uid}"
        # first row is an observation (spine starts at first obs day)
        assert not rows[0].is_filled
        last_observed = None
        for r in rows:
            assert r.is_filled == (r.n_obs == 0)
            if r.is_filled:
                assert r.filled_value == last_observed
            else:
                last_observed = r.filled_value


def test_incremental_maintenance_matches_one_pass_aggregate(spark, sf_dir):
    inc = q_agg_incremental_maintenance(spark, sf_dir)
    e = load_table(spark, sf_dir, "events")
    sum_dec = F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(18,6)")
    direct = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        sum_dec.cast("double").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (sum_dec.cast("double") / F.count(F.lit(1))).alias("avg_value"),
    )
    canon = lambda df: sorted(tuple(r) for r in df.collect())
    assert canon(inc) == canon(direct)


def test_funnel_counts_shrink_and_step1_is_distinct_users(spark, sf_dir):
    rows = {r.step: r for r in q_events_funnel(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    assert [rows[i].event_type for i in (1, 2, 3)] == ["signup", "click", "purchase"]
    assert rows[1].n_users >= rows[2].n_users >= rows[3].n_users

    e = load_table(spark, sf_dir, "events")
    n_signup_users = (
        e.filter(F.col("event_type") == "signup").select("user_id").distinct().count()
    )
    assert rows[1].n_users == n_signup_users


def test_retention_invariants(spark, sf_dir):
    """Week-0 retention is exactly 1e6 ppm; no cell exceeds its cohort
    size; weeks_since is non-negative."""
    rows = load_registry()["q_events_retention"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.weeks_since >= 0
        assert 0 < r.n_active <= r.cohort_size
        if r.weeks_since == 0:
            assert r.n_active == r.cohort_size
            assert r.retention_ppm == 1_000_000
        else:
            assert r.retention_ppm <= 1_000_000


def test_incremental_join_maintenance_equals_full(spark):
    """Delta-join algebra on constructed data: maintained view ==
    full recompute, including keys that exist only in a delta."""
    from pyspark.sql import functions as F

    a = spark.createDataFrame(
        [(k, f"a{k}") for k in range(20)], "k long, av string"
    )
    da = spark.createDataFrame(
        [(k, f"da{k}") for k in range(15, 25)], "k long, av string"
    )
    b = spark.createDataFrame([(k, k * 10) for k in range(0, 22, 2)], "k long, bv long")
    db = spark.createDataFrame([(k, k * 100) for k in range(1, 23, 4)], "k long, bv long")
    full = a.unionByName(da).join(b.unionByName(db), "k")
    maintained = (
        a.join(b, "k")
        .unionByName(da.join(b, "k"))
        .unionByName(a.join(db, "k"))
        .unionByName(da.join(db, "k"))
    )
    assert maintained.exceptAll(full).count() == 0
    assert full.exceptAll(maintained).count() == 0
