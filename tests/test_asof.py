"""Golden tests for the as-of join and the delay sort flag."""

from __future__ import annotations

from datetime import datetime

from transit_efficiency_analysis_spark.demo import load_registry
from transit_efficiency_analysis_spark.operators.asof import asof_join


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 10, 0), "e1"),
            (1, datetime(2026, 1, 1, 12, 0), "e2"),
            (2, datetime(2026, 1, 1, 9, 0), "e3"),  # before any right row
            (3, datetime(2026, 1, 1, 9, 0), "e4"),  # key with no right rows
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 9, 30), 100.0),
            (1, datetime(2026, 1, 1, 11, 0), 200.0),
            (2, datetime(2026, 1, 1, 10, 0), 300.0),
        ],
        "k long, rts timestamp, payload double",
    )
    out = {
        r["tag"]: r["payload"]
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts", payload_cols=["payload"]
        ).collect()
    }
    assert out == {"e1": 100.0, "e2": 200.0, "e3": None, "e4": None}


def test_asof_inclusive_tie(spark):
    left = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 10, 0), "e")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 10, 0), 5.0)], "k long, rts timestamp, payload double"
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts", payload_cols=["payload"]
    ).collect()
    assert out[0]["payload"] == 5.0  # right.ts == left.ts is a match (>= semantics)


def test_delay_sort_flag_same_content(spark, sf_dir):
    from transit_efficiency_analysis_spark.operators.delay import compute_delays
    from transit_efficiency_analysis_spark.operators.testdata_adapter import (
        gtfs_data_view,
        trip_updates_view,
    )
    from transit_efficiency_analysis_spark.sources.registry import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    gd, tu = gtfs_data_view(o, li), trip_updates_view(o, li)
    a = compute_delays(tu, gd, sort=True)
    b = compute_delays(tu, gd, sort=False)
    assert a.columns == b.columns
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_asof_null_payload_from_latest_right_row(spark):
    """A right row whose payload is NULL must WIN over an older non-NULL
    one (latest matching right ROW semantics), and multiple payload
    columns must all come from that same row — the struct-carry contract."""
    left = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 12, 0), "q")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 10, 0), 5.0, "old"),
            (1, datetime(2026, 1, 1, 11, 0), None, "new"),  # latest: NULL payload
        ],
        "k long, rts timestamp, payload double, label string",
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts",
        payload_cols=["payload", "label"],
    ).collect()
    assert len(out) == 1
    # both columns come from the 11:00 row: NULL payload, label 'new' —
    # NOT stitched (5.0, 'new') or stale (5.0, 'old')
    assert out[0]["payload"] is None
    assert out[0]["label"] == "new"


def test_asof_tolerance_nulls_stale_matches(spark):
    """A right row older than tolerance_seconds behaves as no-match:
    payloads NULL, left row preserved."""
    from transit_efficiency_analysis_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "k", "2026-01-10 00:00:00"), (2, "k", "2026-01-01 00:30:00")],
        "id long, key string, ts string",
    ).selectExpr("id", "key", "CAST(ts AS TIMESTAMP) AS ts")
    right = spark.createDataFrame(
        [("k", "2026-01-01 00:00:00", 99)], "key string, rts string, payload long"
    ).selectExpr("key", "CAST(rts AS TIMESTAMP) AS rts", "payload")
    out = {r["id"]: r["payload"] for r in asof_join(
        left, right, key="key", left_ts="ts", right_ts="rts",
        payload_cols=["payload"], tolerance_seconds=3600,
    ).collect()}
    assert out == {1: None, 2: 99}  # 9 days stale -> NULL; 30 min -> kept
