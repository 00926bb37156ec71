"""Round-15 staging gate: the IVF ``assign="fold"`` oracle mirrors.

Round 14's correctness window is fully forced, so the three IVF demos
keep their window-form defaults and oracles (docs/ROUND13.md). These
tests pre-verify the ROUND-15 flip: each staged fold oracle
(demo/staged_r15.py) runs against the ``assign="fold"`` Spark output at
sf0.01 — the driver's gate scale — through the SAME compare + dtype
gate tools/verify_local.py applies (VERDICT r13 ask #2's done
criterion), so round 15 is purely: flip three defaults, swap three SQL
strings, take three re-verification slots.
"""

from __future__ import annotations

import os

import pytest

from tools.verify_local import compare, duck_connect, type_report
from transit_efficiency_analysis_spark.demo.staged_r15 import STAGED_FLIPS
from transit_efficiency_analysis_spark.operators.similarity import (
    ivf_pq_topk,
    ivf_topk,
)
from transit_efficiency_analysis_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.01"


def _fold_queries(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return {
        "q_sim_ivf_topk": lambda: ivf_topk(
            e, "vec_id", "embedding", n_centroids=8, n_probe=2, k=3,
            assign="fold",
        ),
        "q_sim_ivf_lloyd_topk": lambda: ivf_topk(
            e, "vec_id", "embedding", n_centroids=8, n_probe=2, k=3,
            lloyd_rounds=1, assign="fold",
        ),
        "q_sim_ivf_pq_topk": lambda: ivf_pq_topk(
            e, "vec_id", "embedding", n_centroids=8, m=4, ks=16,
            n_probe=2, k=3, assign="fold",
        ),
    }


@pytest.mark.parametrize("name", sorted(STAGED_FLIPS))
def test_staged_fold_oracle_matches_fold_output(spark, name):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} absent")
    df = _fold_queries(spark, SF_DIR)[name]()
    spark_rows = df.collect()
    assert spark_rows, f"{name}: fold output empty at sf0.01"

    con = duck_connect(SF_DIR)
    rel = con.sql(STAGED_FLIPS[name])
    duck_cols = list(rel.columns)
    duck_types = list(rel.types)
    duck_rows = rel.fetchall()

    mismatched_types = type_report(df, duck_cols, duck_types)
    assert not mismatched_types, f"{name}: dtype mismatch {mismatched_types}"
    ok, msg = compare(spark_rows, df.columns, duck_rows, duck_cols)
    assert ok, f"{name}: {msg}"


def test_staged_flip_table_is_complete():
    """The flip table names exactly the three demos ROUND13.md schedules
    for round 15 — a drifted key here would silently stage the wrong
    flip."""
    assert sorted(STAGED_FLIPS) == [
        "q_sim_ivf_lloyd_topk",
        "q_sim_ivf_pq_topk",
        "q_sim_ivf_topk",
    ]
    for name, sql in STAGED_FLIPS.items():
        # every staged oracle mirrors the fold score, zero-norm guarded
        assert "CASE WHEN c.cn = 0 THEN NULL" in sql, name
        assert "list_transform(c.cv, x -> x / c.cn)" in sql, name


def test_staged_zero_norm_guards_are_output_neutral():
    """r15 slots 4-5 (ADVICE r13 #1): the guarded SemDeDup oracles are
    valid DuckDB and produce rows identical to the live unguarded
    strings on the gate corpus (no zero-norm centroid exists there, so
    the guard must be a no-op); the asserted substitutions inside
    staged_oracle_guards() fail loudly if the live strings drift."""
    import duckdb  # noqa: F401 (duck_connect provides the connection)

    from transit_efficiency_analysis_spark.demo import load_registry
    from transit_efficiency_analysis_spark.demo.staged_r15 import (
        staged_oracle_guards,
    )

    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} absent")
    registry = load_registry()
    con = duck_connect(SF_DIR)
    for name, guarded_sql in staged_oracle_guards().items():
        live = con.sql(registry[name].sql)
        live_rows, live_cols = live.fetchall(), list(live.columns)
        g = con.sql(guarded_sql)
        g_rows, g_cols = g.fetchall(), list(g.columns)
        assert g_cols == live_cols, name
        ok, msg = compare(live_rows, live_cols, g_rows, g_cols)
        assert ok, f"{name}: {msg}"
