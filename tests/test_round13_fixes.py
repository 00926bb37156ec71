"""Round-13 regression tests (VERDICT r12 asks + ADVICE items).

- The FLAT ``semantic_dedup`` assignment (and the Lloyd-round assignment
  inside ``ivf_centroids``) adopted the broadcast-array fold — the last
  n × K data-proportional assignment exchanges in the tree (ask #1).
  Plan-pinned map-only here; output parity with the pre-rewrite form is
  carried by the unchanged oracle values and the flat==hier(coarse=1)
  bit-equality test in tests/test_spans_budget.py.
- Zero-norm vectors survive the FLAT form with kept=true (the r12 hier
  regression test, extended to the flat form per ask #1's done criteria).
"""

from __future__ import annotations

import pytest


def test_semantic_dedup_flat_assignment_is_map_only(spark, sf_dir):
    """Round-13 rewrite (VERDICT r12 ask #1): the flat nearest-cell
    assignment must be a broadcast-array fold, never an n × K row
    fan-out collapsed by a per-vec_id rank window. With lloyd_rounds=0
    the ONLY data-proportional exchanges allowed in the whole plan
    belong to _keep_first_in_cells' pairing stage (the dup groupBy +
    join-back — 2); no Window may be partitioned by the vector id."""
    from transit_efficiency_analysis_spark.operators.similarity import (
        semantic_dedup,
    )
    from transit_efficiency_analysis_spark.plans import (
        count_shuffles,
        physical_plan,
    )
    from transit_efficiency_analysis_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = semantic_dedup(e, n_centroids=8, lloyd_rounds=0, threshold=0.3)
    plan = physical_plan(out)
    assert "windowspecdefinition(vec_id" not in plan, (
        "flat assignment regressed to a per-vec_id rank window"
    )
    assert count_shuffles(out) <= 2


def test_semantic_dedup_lloyd_round_assignment_is_fold(spark, sf_dir):
    """The Lloyd-round assignment inside ivf_centroids uses the same
    fold: with lloyd_rounds=1 the plan gains centroid-mean aggregations
    (keyed by cell/pos — K-proportional, fine) but still NO per-vec_id
    rank window anywhere (the pre-r13 form exchanged n × K rows per
    Lloyd round)."""
    from transit_efficiency_analysis_spark.operators.similarity import (
        semantic_dedup,
    )
    from transit_efficiency_analysis_spark.plans import physical_plan
    from transit_efficiency_analysis_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = semantic_dedup(e, n_centroids=8, lloyd_rounds=1, threshold=0.3)
    assert "windowspecdefinition(vec_id" not in physical_plan(out), (
        "Lloyd-round assignment regressed to a per-vec_id rank window"
    )


def test_semantic_dedup_flat_keeps_zero_norm_vectors(spark):
    """A zero-norm vector scores 0.0 against every (normalized)
    centroid in the fold, ties to the smallest cell, and appears in the
    output with kept=true (its pairing cosines are NULL via try_divide,
    which never satisfies >= threshold) — the r12 hier regression
    extended to the flat form. Zero vectors also seed zero-norm
    CENTROIDS here (they sort first in the md5 draw at these sizes
    sometimes; either way the fold's NULL-skip handles them)."""
    from transit_efficiency_analysis_spark.operators.similarity import (
        semantic_dedup,
    )

    rows = [(i, [0.0, 0.0, 0.0, 0.0]) for i in range(3)] + [
        (i, [float(i), 1.0, 0.0, 0.5]) for i in range(3, 8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for lr in (0, 1):
        out = {
            r.vec_id: r
            for r in semantic_dedup(
                df, n_centroids=4, lloyd_rounds=lr, threshold=0.95
            ).collect()
        }
        assert len(out) == len(rows), "zero-norm rows were dropped"
        for i in range(3):
            assert out[i].kept and out[i].dup_of is None
