"""Property tests for the upsert kernel (SURVEY.md §5.3).

Invariant: replaying any interleaving / batching of updates through
``merge_batch`` produces exactly "latest observation per key", with
``upsert_ignore`` the mirror (earliest per key) — the set-based equivalent
of the reference's per-row ``ON CONFLICT`` upserts
(``realtime_extractor.py:205-230``).

Hypothesis drives the row generator; the Spark invocation itself runs on a
few deterministic draws per property (Spark jobs are too slow for hundreds
of examples), with the RNG seeded per-example by hypothesis.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from transit_efficiency_analysis_spark.operators.upsert import (
    merge_batch,
    upsert_ignore,
    upsert_keep_newest,
)

BASE = datetime(2026, 1, 1)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=500),  # ts offset minutes
        st.integers(min_value=0, max_value=5),  # value
    ),
    min_size=1,
    max_size=25,
)


def _mk_rows(raw):
    # seq is the unique tiebreaker (arrival order)
    return [
        (k, BASE + timedelta(minutes=ts), float(v), seq)
        for seq, (k, ts, v) in enumerate(raw)
    ]


def _expected_latest(rows):
    best = {}
    for k, ts, v, seq in rows:
        if k not in best or (ts, seq) > (best[k][1], best[k][3]):
            best[k] = (k, ts, v, seq)
    return {k: (r[1], r[2], r[3]) for k, r in best.items()}


def _expected_earliest(rows):
    best = {}
    for k, ts, v, seq in rows:
        if k not in best or (ts, seq) < (best[k][1], best[k][3]):
            best[k] = (k, ts, v, seq)
    return {k: (r[1], r[2], r[3]) for k, r in best.items()}


SCHEMA = "key long, ts timestamp, value double, seq long"


@settings(max_examples=12, deadline=None)
@given(raw=rows_strategy, split=st.integers(min_value=0, max_value=25))
def test_merge_batch_equals_latest_per_key(spark, raw, split):
    rows = _mk_rows(raw)
    split = min(split, len(rows))
    existing = spark.createDataFrame(rows[:split] or [], SCHEMA)
    incoming = spark.createDataFrame(rows[split:] or [], SCHEMA)
    out = merge_batch(existing, incoming, keys=["key"], order_by=["ts", "seq"]).collect()
    got = {r["key"]: (r["ts"], r["value"], r["seq"]) for r in out}
    assert got == _expected_latest(rows)


@settings(max_examples=12, deadline=None)
@given(raw=rows_strategy)
def test_upsert_ignore_equals_earliest_per_key(spark, raw):
    rows = _mk_rows(raw)
    df = spark.createDataFrame(rows, SCHEMA)
    out = upsert_ignore(df, keys=["key"], order_by=["ts", "seq"]).collect()
    got = {r["key"]: (r["ts"], r["value"], r["seq"]) for r in out}
    assert got == _expected_earliest(rows)


def test_updated_at_set_only_when_tracked_changed(spark):
    rows = [
        # key 1: value changes between last two versions → updated_at set
        (1, BASE, 1.0, 0),
        (1, BASE + timedelta(minutes=1), 2.0, 1),
        # key 2: same value re-delivered → updated_at NULL
        (2, BASE, 5.0, 2),
        (2, BASE + timedelta(minutes=1), 5.0, 3),
        # key 3: single version → no previous → updated_at NULL
        (3, BASE, 7.0, 4),
    ]
    df = spark.createDataFrame(rows, SCHEMA).withColumn(
        "now_ts", F.to_timestamp(F.lit("2026-02-01 00:00:00"))
    )
    out = upsert_keep_newest(
        df, keys=["key"], order_by=["ts", "seq"], tracked=["value"], now_col="now_ts"
    ).collect()
    by_key = {r["key"]: r for r in out}
    assert by_key[1]["updated_at"] == datetime(2026, 2, 1)
    assert by_key[2]["updated_at"] is None
    assert by_key[3]["updated_at"] is None
    assert by_key[1]["value"] == 2.0 and by_key[2]["value"] == 5.0


def test_updated_at_set_when_previous_value_null(spark):
    rows = [
        # previous version has NULL value; newest has a value → changed
        (1, BASE, None, 0),
        (1, BASE + timedelta(minutes=1), 3.0, 1),
        # previous has a value; newest is NULL → also changed
        (2, BASE, 5.0, 2),
        (2, BASE + timedelta(minutes=1), None, 3),
    ]
    df = spark.createDataFrame(rows, SCHEMA).withColumn(
        "now_ts", F.to_timestamp(F.lit("2026-02-01 00:00:00"))
    )
    out = upsert_keep_newest(
        df, keys=["key"], order_by=["ts", "seq"], tracked=["value"], now_col="now_ts"
    ).collect()
    by_key = {r["key"]: r for r in out}
    assert by_key[1]["updated_at"] == datetime(2026, 2, 1)
    assert by_key[2]["updated_at"] == datetime(2026, 2, 1)
