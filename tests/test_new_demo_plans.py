"""Plan-shape budgets for the round-5 late additions: the scale claims in
docs/SCALE.md must be visible in the physical plan (SURVEY.md §4)."""

from __future__ import annotations

from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.plans import (
    assert_no_python_row_udf,
    count_shuffles,
    physical_plan,
)


def test_regression_is_single_shuffle(spark, sf_dir):
    df = load_registry()["q_stats_regression"].fn(spark, sf_dir)
    assert count_shuffles(df) == 1, "OLS must be one partial-aggregated pass"
    plan = physical_plan(df)
    assert "HashAggregate" in plan
    assert_no_python_row_udf(df)


def test_ohlc_is_single_shuffle_no_sort(spark, sf_dir):
    df = load_registry()["q_window_ohlc"].fn(spark, sf_dir)
    assert count_shuffles(df) == 1, "OHLC must be one aggregation pass"
    assert "Window" not in physical_plan(df), "OHLC must not use a window sort"


def test_collocations_topk_is_take_ordered(spark, sf_dir):
    df = load_registry()["q_text_collocations"].fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in physical_plan(df), (
        "top-20 must compile to per-partition heaps, not a global sort"
    )


def test_cms_counter_shuffle_is_bounded(spark, sf_dir):
    """The sketch's counter aggregation groups on (r, pos) — at most
    d·w = 1536 groups; verify the aggregate output really is bounded."""
    from pyspark.sql import functions as F

    from transit_efficiency_analysis_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("t")).where(
        F.col("t") != ""
    )
    counters = tokens.select(
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("cms0|"), F.col("t"))), 1, 8), 16, 10)
            .cast("long")
            % 512
        ).alias("pos")
    ).groupBy("pos").count()
    assert counters.count() <= 512


def test_split_assignment_is_map_only(spark, sf_dir):
    """Split membership must be computable without any exchange — the
    only shuffles are the summary agg's own two phases (count(distinct
    lang) expands to a (split, lang) pre-agg), both grouped on ≤ 3×#langs
    keys. Nothing exchanges before the split column exists."""
    df = load_registry()["q_sample_split"].fn(spark, sf_dir)
    assert count_shuffles(df) <= 2
    plan = physical_plan(df)
    # the split CASE expression must be computed in the scan's project,
    # i.e. before the first Exchange (map-side assignment)
    first_exchange = plan.index("Exchange")
    assert "CASE WHEN" in plan[first_exchange:], "split assigned pre-shuffle"


def test_attribution_single_event_shuffle(spark, sf_dir):
    """One scan + one user_id shuffle (the window), then the bounded
    channel aggregate — no self-join per touchpoint."""
    df = load_registry()["q_events_attribution"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Scan parquet") == 1, "attribution must scan events once"
    # window exchange (user_id) + final channel agg exchange, nothing else
    assert count_shuffles(df) <= 2
    assert_no_python_row_udf(df)


def test_triangles_joins_are_equi_joins(spark, sf_dir):
    """Wedge generation and closure must be hash equi-joins — a
    nested-loop (cartesian) anywhere breaks the O(m^{3/2}) bound."""
    df = load_registry()["q_graph_triangles"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # nested-loop joins are allowed ONLY for the one-row order-count
    # scalar broadcast that parameterizes the support floor (map-only,
    # the bloom-prefilter pattern — its condition references n_ord); the
    # graph joins themselves must all be hash equi-joins. The plan text
    # repeats cached subtrees per reference, so count lines, not joins.
    for line in physical_plan(df).splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "n_ord" in line, f"non-scalar nested-loop join: {line}"
    assert "TakeOrderedAndProject" in plan, "top-10 must be a bounded take"


def test_int8_encode_is_broadcast_mapside(spark, sf_dir):
    """The per-dimension range table must broadcast back to the flat
    relation: the vectors themselves are never shuffled for encoding
    (the only exchanges belong to the two per-dimension aggregates)."""
    df = load_registry()["q_sim_int8_quantize"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, "range table must broadcast"
    assert "SortMergeJoin" not in plan, "vectors must not shuffle for encoding"


def test_temperature_membership_is_broadcast_mapside(spark, sf_dir):
    """Per-language fractions broadcast; membership is a row predicate."""
    df = load_registry()["q_sample_temperature"].fn(spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert_no_python_row_udf(df)


def test_salted_distinct_equals_direct_aggregate(spark, sf_dir):
    """The salt is pure plumbing: the two-stage result must equal the
    direct countDistinct/count per type, and every salt partial must be
    bounded (16 per type at most)."""
    from pyspark.sql import functions as F

    from transit_efficiency_analysis_spark.sources.registry import load_table

    got = {
        r["event_type"]: (r["n_users"], r["n_events"], r["n_salt_parts"])
        for r in load_registry()["q_agg_salted_distinct"]
        .fn(spark, sf_dir)
        .collect()
    }
    e = load_table(spark, sf_dir, "events")
    want = {
        r["event_type"]: (r["n_users"], r["n_events"])
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for t, (nu, ne, parts) in got.items():
        assert (nu, ne) == want[t]
        assert 1 <= parts <= 16
