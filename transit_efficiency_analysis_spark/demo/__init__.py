"""Driver-verifiable demo queries (the ``queries()`` / ``oracle_sql()`` surface).

Each operator from SURVEY.md §2 (plus the LLM-data-pipeline extensions) gets
a named demo: a PySpark callable ``(spark, sf_dir) -> DataFrame`` over the
driver's testdata tables, and — when SQL-expressible — an exact ANSI-SQL twin
that DuckDB runs on the same parquet for the correctness gate.

Register with the ``@demo`` decorator; ``__spark_entry__.py`` re-exports the
registry. Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Demo:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → driver does rows-only check


REGISTRY: dict[str, Demo] = {}

_DEMO_MODULES = [
    "recursion",
    "pysource",
    "approx",
    "layout",
    "streamingdemo",
    "retrieval",
    "graphextras",
    "tpchx",
    "corpusops",
    "ingest",
    "sinks",
    "sqlsurface",
    "tpch",
    "dedup",
    "similarity",
    "subqueries",
    "multimodal",
    "pandasudf",
    "windowed",
    "asof",
    "sampling",
    "textprep",
    "semistructured",
    "jdbc",
    "core",
    "timefns",
    "joins",
    "upsert",
    "delay",
    "analytics",
    "windows",
    "setops",
    "textops",
]

# The driver oracle-checks the FIRST 50 registry entries each round, so
# registry order IS the correctness window. Until round 4 the window was
# steered by module order alone, which is fragile: demo modules import
# each other, and a transitively-imported module registers its entries
# first regardless of its position in _DEMO_MODULES. The window pins the
# front 50 by name instead: _WINDOW_FRONT carries this round's fixes, new
# demos, and anything whose implementation changed since its last green
# row; _WINDOW_FILLER re-verifies prior-green rows, chosen
# least-recently-verified first so coverage stays fresh.
# tests/test_window.py asserts every filler name really has a prior green
# CORRECTNESS row (guards the round-4 mislabel: q_text_pack was filed as
# "r3-green filler" while actually new-and-red in r4).
# Standing freshness SLO (adopted round 8, recalibrated round 11): no
# registry entry's latest driver row may be older than one full rotation
# cycle — ceil(len(REGISTRY) / 50) rounds (check_window computes it
# live from the registry size; no literal count here, it drifted) —
# and no entry may stay registered-but-never-driver-checked past the
# round after it lands. (The original 4-round figure was set when the
# registry was ~200 entries; past ~200 a 4-round cycle would need a
# 60-slot window the driver doesn't have, so 4 was unachievable by
# arithmetic, not negligence. The cycle-length form is the tightest
# bound strict oldest-first rotation can actually deliver.)
# Each round's window takes (1) never-checked entries first, (2) the
# oldest driver rows next, (3) anything whose implementation or oracle
# changed since its last green row. tools/check_window.py enforces all
# of this mechanically (wired into pytest via tests/test_window.py) so a
# skipped rotation can never ship silently again — the round-10 miss
# shipped exactly because the rotation lived only in a comment.
# The round this window targets (the round whose driver run will
# execute it). tools/check_window.py uses it to tell "this window's
# results were just recorded" (grace: newest artifact == window and
# 50/50 green) from "rotation skipped" (artifacts newer than the
# window's target round) — the ADVICE r11 medium item.
_WINDOW_ROUND = 17

# Round-17 window (docs/ROUND16.md precomputed the arithmetic; VERDICT
# r16 confirmed it against the artifacts: 42 forced r12-era rows + 8
# free slots). The 8 free slots:
# - 4 pre-committed (ROUND16.md §3 / VERDICT r16 #1): the IVF/SemDeDup
#   demos whose executed Python gained the parquet_rows n_rows
#   threading in round 16 (plans pinned fold-identical; the driver row
#   is confirmation, not discovery).
# - 3 for the sign-LSH auto-knee flip (VERDICT r16 #3): bucket_assign
#   defaults to "auto" this round and the five LSH demos thread
#   n_rows; the three demos with the STALEST rows (r14/r15 tiers) take
#   slots now. The two r16-fresh LSH demos whose executed Python also
#   changed (q_sim_lsh_topk_derived, q_sim_lsh_recall) are re-verified
#   locally this round (tools/verify_local.py 6/6) with plan pins
#   (test_registered_lsh_demos_plan_pure_jvm_at_gate_scale) and are
#   PRE-COMMITTED to 2 of round 18's 3 free slots (docs/ROUND17.md).
# - 1 for q_dedup_semantic_hier (VERDICT r16 #4): its demo call site
#   now passes n_rows=parquet_rows(...); hier auto resolves to the
#   fold at gate scale (4k envelope dots vs the 1.4M knee), so the
#   plan is pinned unchanged.
#
# Dark-ship exemption (standing policy, ADVICE r13): an engine-side
# branch shipped behind a non-default parameter whose default takes the
# pre-change code path VERBATIM does NOT take a window slot the round
# it lands; it takes one the round its DEFAULT flips (the oracle is
# mirrored then too). Each exemption must be (a) named in ROUNDn.md,
# (b) re-verified locally via tools/verify_local.py the round it lands,
# and (c) scheduled for a real slot at its flip. Round 16's sign-LSH
# int64-matmul twin takes its slots THIS round (the flip round); the
# MinHash signature twin's flip was measured and REJECTED (ROUND16.md
# §5), so no slot is ever owed for it.
_WINDOW_FRONT = [
    "q_sim_ivf_topk",
    "q_sim_ivf_lloyd_topk",
    "q_sim_ivf_pq_topk",
    "q_dedup_semantic",
    "q_sim_lsh_buckets",
    "q_sim_lsh_topk",
    "q_sim_lsh_multiprobe_topk",
    "q_dedup_semantic_hier",
]

# Prior-green re-verification filler, least-recently-verified first:
# the 42 r12-era rows (latest green driver row CORRECTNESS_r12 —
# exactly one rotation cycle old at round 17; check_window R3 lists
# exactly this set, and docs/ROUND16.md precomputed it: the 46-row
# r12 tier minus the 4 rows the round-16 window already refreshed).
_WINDOW_FILLER: list[str] = [
    "q_agg_dashboard",
    "q_agg_salted_distinct",
    "q_case_avg",
    "q_case_bucket",
    "q_case_diff",
    "q_case_null",
    "q_dedup_clusters_twophase",
    "q_dedup_simhash_pairs_h3",
    "q_dedup_window_latest",
    "q_expr_cast",
    "q_expr_math",
    "q_filter_entity",
    "q_filter_sentinel",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_join_anti",
    "q_join_diff",
    "q_join_outer",
    "q_join_semi",
    "q_join_star",
    "q_limit_topk",
    "q_proj_concat",
    "q_proj_rename",
    "q_proj_select",
    "q_rebuild_full",
    "q_sample_temperature",
    "q_set_except",
    "q_set_intersect",
    "q_set_union",
    "q_stats_drift_tvd",
    "q_stream_dup_screen",
    "q_text_dup_spans_incremental",
    "q_ts_date_parse",
    "q_ts_dow_name",
    "q_ts_gtfs_parse",
    "q_ts_hour_local",
    "q_ts_tz_localize",
    "q_ts_unix",
    "q_window_lag",
    "q_window_ntile_approx",
    "q_window_rank",
    "q_window_running",
]

_WINDOW = _WINDOW_FRONT + _WINDOW_FILLER


def demo(name: str, sql: str | None = None):
    """Register a demo query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Demo(name, fn, sql)
        return fn

    return deco


def load_registry() -> dict[str, Demo]:
    """Import all demo modules (idempotent) and return the registry,
    ordered so the first 50 entries are exactly ``_WINDOW`` (the driver's
    correctness window); the rest follow in module order."""
    for mod in _DEMO_MODULES:
        importlib.import_module(f"transit_efficiency_analysis_spark.demo.{mod}")
    missing = [n for n in _WINDOW if n not in REGISTRY]
    assert len(_WINDOW) == 50 and not missing, (
        f"_WINDOW must name 50 registered demos (len={len(_WINDOW)}, "
        f"unknown={missing})"
    )
    ordered = {n: REGISTRY[n] for n in _WINDOW}
    ordered.update((n, d) for n, d in REGISTRY.items() if n not in ordered)
    return ordered
