"""Round-12 regression tests (VERDICT r11 asks #2/#6, ADVICE r11 items).

Covers:
- merge_into_partitioned — the batch-proportional pure-Parquet MERGE:
  parity with merge_batch (the spec) across batch splits and bucket
  counts, byte-identical untouched partitions, bucket-count pinning.
- merge_newer_condition's null-aware order keys: merge_into_sql /
  merge_sql_plan now agree with merge_batch when a stored row carries a
  NULL order-by component (ADVICE r11: a real-timestamp source must
  replace a NULL-timestamp stored row, as row_number desc NULLS LAST
  does).
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from transit_efficiency_analysis_spark.operators.upsert import (
    merge_batch,
    merge_into_partitioned,
    merge_sql_plan,
)

BASE = datetime(2026, 1, 1)
SCHEMA = "key long, ts timestamp, value double, seq long"


def _mk_rows(raw):
    return [
        (k, BASE + timedelta(minutes=ts), float(v), seq)
        for seq, (k, ts, v) in enumerate(raw)
    ]


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=500),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=1,
    max_size=25,
)


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------- partitioned MERGE


@settings(max_examples=6, deadline=None)
@given(
    raw=rows_strategy,
    split=st.integers(min_value=0, max_value=25),
    buckets=st.sampled_from([1, 4, 16]),
)
def test_merge_partitioned_batch_split_parity(
    spark, tmp_path_factory, raw, split, buckets
):
    """ANY two-way batch split through the partitioned runtime equals
    merge_batch folded in memory (merge_batch IS the spec), for 1, 4
    and 16 buckets — 1 bucket degenerates to merge_into_sql's shape."""
    rows = _mk_rows(raw)
    target = str(tmp_path_factory.mktemp("pmerge") / "tbl")
    state_mem = spark.createDataFrame([], SCHEMA)
    for b in (rows[:split], rows[split:]):
        if not b:
            continue
        inc = spark.createDataFrame(b, SCHEMA)
        stored = merge_into_partitioned(
            target, inc, keys=["key"], order_by=["ts", "seq"],
            num_buckets=buckets,
        )
        state_mem = merge_batch(state_mem, inc, keys=["key"], order_by=["ts", "seq"])
    assert _collect(stored) == _collect(state_mem)


def _partition_digests(table_dir: str) -> dict[str, str]:
    """content digest per p_bucket partition (resolved through the
    symlink), plus the resolved symlink target path."""
    out = {}
    for name in sorted(os.listdir(table_dir)):
        if not name.startswith("p_bucket="):
            continue
        part = os.path.join(table_dir, name)
        h = hashlib.sha256()
        h.update(os.path.realpath(part).encode())
        for f in sorted(os.listdir(part)):
            if f.startswith(("_", ".")):
                continue
            with open(os.path.join(part, f), "rb") as fh:
                h.update(f.encode())
                h.update(fh.read())
        out[name] = h.hexdigest()
    return out


def test_merge_partitioned_untouched_partitions_byte_identical(spark, tmp_path):
    """A merge whose batch hashes into a strict subset of buckets must
    leave every other partition's files (and its symlinked version dir)
    untouched — the batch-proportional claim, pinned at the byte level."""
    target = str(tmp_path / "tbl")
    seed = _mk_rows([(k, 10, 1) for k in range(40)])  # spreads over buckets
    merge_into_partitioned(
        target, spark.createDataFrame(seed, SCHEMA),
        keys=["key"], order_by=["ts", "seq"], num_buckets=8,
    )
    before = _partition_digests(target)
    assert len(before) >= 4, "seed should populate several buckets"

    # one single-key batch -> exactly one touched bucket
    batch = [(3, BASE + timedelta(minutes=99), 9.0, 1000)]
    merge_into_partitioned(
        target, spark.createDataFrame(batch, SCHEMA),
        keys=["key"], order_by=["ts", "seq"], num_buckets=8,
    )
    after = _partition_digests(target)
    assert set(after) == set(before)
    changed = [p for p in before if before[p] != after[p]]
    assert len(changed) == 1, (
        f"exactly one partition should change, got {changed}"
    )
    # and the table still answers correctly
    got = {r.key: r.value for r in spark.read.parquet(target).collect()}
    assert got[3] == 9.0 and got[5] == 1.0


def test_merge_partitioned_rejects_bucket_count_change(spark, tmp_path):
    import pytest

    target = str(tmp_path / "tbl")
    inc = spark.createDataFrame(_mk_rows([(0, 1, 1)]), SCHEMA)
    merge_into_partitioned(target, inc, keys=["key"], order_by=["ts", "seq"],
                           num_buckets=4)
    with pytest.raises(ValueError, match="num_buckets"):
        merge_into_partitioned(target, inc, keys=["key"],
                               order_by=["ts", "seq"], num_buckets=8)


def test_merge_partitioned_null_key_component(spark, tmp_path):
    """NULL merge keys hash to a stable bucket and match null-safely —
    one stored row per NULL key, updated in place across batches."""
    target = str(tmp_path / "tbl")
    b1 = [(None, BASE + timedelta(minutes=1), 1.0, 0),
          (7, BASE + timedelta(minutes=1), 1.0, 1)]
    b2 = [(None, BASE + timedelta(minutes=2), 2.0, 2)]
    merge_into_partitioned(target, spark.createDataFrame(b1, SCHEMA),
                           keys=["key"], order_by=["ts", "seq"], num_buckets=4)
    out = merge_into_partitioned(target, spark.createDataFrame(b2, SCHEMA),
                                 keys=["key"], order_by=["ts", "seq"],
                                 num_buckets=4)
    rows = out.collect()
    assert len(rows) == 2
    null_rows = [r for r in rows if r.key is None]
    assert len(null_rows) == 1 and null_rows[0].value == 2.0


def test_merge_partitioned_scan_prunes_untouched_partitions(spark, tmp_path):
    """The stored-side read must partition-prune to the touched buckets:
    the pruned scan's input files all live under touched p_bucket dirs."""
    target = str(tmp_path / "tbl")
    seed = _mk_rows([(k, 10, 1) for k in range(40)])
    merge_into_partitioned(
        target, spark.createDataFrame(seed, SCHEMA),
        keys=["key"], order_by=["ts", "seq"], num_buckets=8,
    )
    from pyspark.sql import functions as F

    from transit_efficiency_analysis_spark.operators.upsert import _bucket_expr

    touched = [
        r[0]
        for r in spark.range(1)
        .select(_bucket_expr(["id"], 8).alias("b"))
        .collect()
    ]  # bucket of key=0
    pruned = spark.read.parquet(target).where(F.col("p_bucket").isin(touched))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the bucket predicate must land in PartitionFilters (pruned at file
    # listing), not PushedFilters/post-scan Filter
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "p_bucket" in pf[0], plan
    # and the executed scan reads exactly the touched bucket's rows
    assert pruned.count() == sum(
        1
        for r in spark.read.parquet(target).collect()
        if r.p_bucket == touched[0]
    )


# ------------------------------------------------- null-aware newer


def test_merge_sql_plan_null_order_key_parity_with_merge_batch(spark):
    """ADVICE r11: stored row with NULL ts must be replaced by a real-ts
    source (and a NULL-ts source must never displace a real-ts stored
    row) — merge_sql_plan now agrees with merge_batch on both."""
    stored = spark.createDataFrame(
        [(0, None, 1.0, 0), (1, BASE, 1.0, 1)], SCHEMA
    )
    batch = spark.createDataFrame(
        [(0, BASE, 2.0, 10), (1, None, 2.0, 11)], SCHEMA
    )
    plan = _collect(
        merge_sql_plan(stored, batch, keys=["key"], order_by=["ts", "seq"])
    )
    spec = _collect(
        merge_batch(stored, batch, keys=["key"], order_by=["ts", "seq"])
    )
    assert plan == spec
    got = {r[0]: (r[1], r[2]) for r in plan}
    assert got[0] == (BASE, 2.0), "real ts must replace stored NULL ts"
    assert got[1] == (BASE, 1.0), "NULL ts must not displace stored real ts"


@settings(max_examples=6, deadline=None)
@given(
    raw=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.one_of(st.none(), st.integers(min_value=0, max_value=500)),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=1,
        max_size=20,
    ),
    split=st.integers(min_value=0, max_value=20),
)
def test_merge_sql_plan_parity_with_nullable_order_keys(spark, raw, split):
    """Property form: batch-split parity between the executed MERGE
    algebra and merge_batch holds with NULLs in the ts order column
    (seq stays the unique total-order tiebreaker)."""
    rows = [
        (k, None if ts is None else BASE + timedelta(minutes=ts), float(v), seq)
        for seq, (k, ts, v) in enumerate(raw)
    ]
    state_plan = spark.createDataFrame([], SCHEMA)
    state_spec = spark.createDataFrame([], SCHEMA)
    for b in (rows[:split], rows[split:]):
        if not b:
            continue
        inc = spark.createDataFrame(b, SCHEMA)
        from transit_efficiency_analysis_spark.operators.upsert import (
            upsert_keep_newest,
        )

        collapsed = upsert_keep_newest(inc, ["key"], ["ts", "seq"])
        state_plan = merge_sql_plan(
            state_plan, collapsed, keys=["key"], order_by=["ts", "seq"]
        )
        state_spec = merge_batch(state_spec, inc, keys=["key"], order_by=["ts", "seq"])
    assert _collect(state_plan) == _collect(state_spec)


# ------------------------------------------------- hier SemDeDup


def test_semantic_dedup_hier_keeps_zero_norm_vectors(spark):
    """ADVICE r11: the map-only fold dropped vectors whose every
    candidate similarity was NULL (zero-norm vector -> divide-by-zero).
    With the r12 pre-normalized raw-dot fold a zero-norm vector scores
    0.0 everywhere, ties to the smallest scanned cell, and must appear
    in the output with kept=true (the flat semantic_dedup behavior) —
    no silent row loss, even when zero vectors also seed zero-norm
    centroids."""
    from transit_efficiency_analysis_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_hier,
    )

    rows = [(i, [float(i + d) for d in range(4)]) for i in range(12)]
    rows += [(100, [0.0, 0.0, 0.0, 0.0]), (101, [0.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup_hier(
        df, n_centroids=4, coarse_cells=2, threshold=0.9
    ).collect()
    assert len(out) == len(rows), "every input vector must appear"
    zero = {r.vec_id: r for r in out if r.vec_id >= 100}
    assert set(zero) == {100, 101}
    assert all(r.kept and r.cell >= 0 for r in zero.values())
    # flat form agrees on the no-row-loss contract
    flat = semantic_dedup_hier(df, n_centroids=4, coarse_cells=1)
    assert flat.count() == len(rows)
    assert semantic_dedup(df, n_centroids=4).count() == len(rows)


# ------------------------------------------------- partitioned compaction


def test_filter_partitioned_expires_and_preserves_layout(spark, tmp_path):
    """filter_partitioned: rows failing the predicate are physically
    gone, the bucket layout + meta survive, an entirely-expired bucket's
    partition disappears, and merges continue working afterwards."""
    import json

    from pyspark.sql import functions as F

    from transit_efficiency_analysis_spark.operators.upsert import (
        filter_partitioned,
        merge_into_partitioned,
    )

    target = str(tmp_path / "tbl")
    rows = _mk_rows([(k, k, 1) for k in range(30)])  # ts = k minutes
    merge_into_partitioned(
        target, spark.createDataFrame(rows, SCHEMA),
        keys=["key"], order_by=["ts", "seq"], num_buckets=8,
    )
    cutoff = BASE + timedelta(minutes=20)
    out = filter_partitioned(spark, target, F.col("ts") >= F.lit(cutoff))
    assert sorted(r.key for r in out.collect()) == list(range(20, 30))
    # physical: a fresh read agrees (expired rows not merely filtered)
    again = spark.read.parquet(target)
    assert again.count() == 10
    # layout: meta intact, only non-empty buckets remain
    meta = json.load(open(os.path.join(target, ".merge_meta.json")))
    assert meta["num_buckets"] == 8
    links = [n for n in os.listdir(target) if n.startswith("p_bucket=")]
    assert 0 < len(links) <= 8
    # merges still work after compaction (incl. a key whose bucket was
    # emptied: its partition is recreated)
    late = _mk_rows([(0, 99, 7), (25, 99, 8)])
    merged = merge_into_partitioned(
        target, spark.createDataFrame(late, SCHEMA),
        keys=["key"], order_by=["ts", "seq"], num_buckets=8,
    )
    got = {r.key for r in merged.collect()}
    assert got == set(range(20, 30)) | {0}


def test_filter_partitioned_rejects_non_partitioned_target(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from transit_efficiency_analysis_spark.operators.upsert import (
        filter_partitioned,
    )

    plain = str(tmp_path / "plain")
    spark.createDataFrame(_mk_rows([(0, 1, 1)]), SCHEMA).write.parquet(plain)
    with pytest.raises(FileNotFoundError):
        filter_partitioned(spark, plain, F.lit(True))


@settings(max_examples=5, deadline=None)
@given(
    raw=rows_strategy,
    splits=st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=13, max_value=25),
    ),
    cutoff_min=st.integers(min_value=0, max_value=500),
)
def test_merge_compact_interleaving_equals_spec_fold(
    spark, tmp_path_factory, raw, splits, cutoff_min
):
    """Property: merge / compact / merge through real partitioned
    storage equals the in-memory spec fold with the same filter applied
    at the same point — compaction is semantically JUST a filter, never
    a merge-state mutation (keys re-arriving after being compacted away
    re-insert cleanly)."""
    from pyspark.sql import functions as F

    from transit_efficiency_analysis_spark.operators.upsert import (
        filter_partitioned,
        merge_into_partitioned,
    )

    rows = _mk_rows(raw)
    a, b = splits
    batches = [rows[:a], rows[a:b], rows[b:]]
    cutoff = BASE + timedelta(minutes=cutoff_min)
    pred = F.col("ts") >= F.lit(cutoff)

    target = str(tmp_path_factory.mktemp("mcprop") / "tbl")
    spec = spark.createDataFrame([], SCHEMA)
    stored = None
    for i, batch in enumerate(batches):
        if batch:
            inc = spark.createDataFrame(batch, SCHEMA)
            stored = merge_into_partitioned(
                target, inc, keys=["key"], order_by=["ts", "seq"],
                num_buckets=4,
            )
            spec = merge_batch(spec, inc, keys=["key"], order_by=["ts", "seq"])
        if i == 1 and stored is not None:
            stored = filter_partitioned(spark, target, pred)
            spec = spec.where(pred)
    if stored is None:
        return
    assert _collect(stored) == _collect(spec)


def test_merge_partitioned_rejects_reserved_column(spark, tmp_path):
    import pytest

    from transit_efficiency_analysis_spark.operators.upsert import (
        merge_into_partitioned,
    )

    df = spark.createDataFrame(
        [(0, 1, 2)], "key long, p_bucket long, seq long"
    )
    with pytest.raises(ValueError, match="p_bucket"):
        merge_into_partitioned(str(tmp_path / "t"), df, keys=["key"],
                               order_by=["seq"])
