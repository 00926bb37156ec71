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
_WINDOW_ROUND = 15

# Round-15 window. Front = the 6 demos whose executed implementation or
# oracle changed this round (docs/ROUND14.md scheduled 3 IVF flips +
# 2 oracle guards + 1 spare; the spare goes to q_join_bucketed, whose
# r14 driver row went RED on a stale-warehouse LOCATION_ALREADY_EXISTS
# crash — fixed this round, see docs/ROUND15.md — so its re-verification
# is mandatory, not optional). Filler = the 44 r10-era rows that hit the
# rotation-cycle boundary at round 15 (ROUND14.md precomputed the list;
# check_window R3 confirms it mechanically).
#
# Dark-ship exemption (standing policy, ADVICE r13): an engine-side
# branch shipped behind a non-default parameter whose default takes the
# pre-change code path VERBATIM does NOT take a window slot the round
# it lands; it takes one the round its DEFAULT flips (the oracle is
# mirrored then too). Each exemption must be (a) named in ROUNDn.md,
# (b) re-verified locally via tools/verify_local.py the round it lands,
# and (c) scheduled for a real slot at its flip. Round 15 RETIRES the
# last outstanding exemptions: the three IVF demos flip here
# (assign="fold" is now the operator default, oracles mirrored to the
# fold arithmetic), and the zero-norm oracle guards land on both
# SemDeDup demos.
_WINDOW_FRONT = [
    # Implementation changed this round (stale-warehouse idempotency
    # fix; RED in CORRECTNESS_r14 — the re-verification slot is forced):
    "q_join_bucketed",
    # Executed default + oracle changed this round (the r13 fold paths'
    # scheduled flip: assign="fold" default, oracles mirrored to the
    # fold arithmetic incl. the zero-norm guard + all-NULL fallback):
    "q_sim_ivf_topk",
    "q_sim_ivf_lloyd_topk",
    "q_sim_ivf_pq_topk",
    # Oracle changed this round (zero-norm centroid guards, ADVICE r13
    # #1 — output-neutral on the gate corpus, pinned in
    # tests/test_ivf_fold_oracles.py):
    "q_dedup_semantic",
    "q_dedup_semantic_hier",
]

# Prior-green re-verification filler, least-recently-verified first:
# the 44 r10-era rows (latest driver row CORRECTNESS_r10 — exactly one
# rotation cycle old at round 15; check_window R3 lists exactly this
# set).
_WINDOW_FILLER: list[str] = [
    "q_array_agg",
    "q_array_explode",
    "q_corpus_domain_affinity",
    "q_corpus_token_budget",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash_pairs",
    "q_grouping_sets",
    "q_join_asof_tolerance",
    "q_sample_rebalance",
    "q_sample_weighted",
    "q_sim_lsh_buckets",
    "q_sim_lsh_multiprobe_topk",
    "q_sink_orc",
    "q_sink_partitioned",
    "q_sink_roundtrip",
    "q_sql_group_by_all",
    "q_sql_recursive_chain",
    "q_sql_session_variables",
    "q_sql_star_except_lateral",
    "q_sql_tpch_q1",
    "q_stream_daily_agg",
    "q_stream_daily_agg_append",
    "q_stream_join_append",
    "q_stream_join_left_append",
    "q_stream_upsert_foreachbatch",
    "q_text_contamination_capped",
    "q_text_ngram_stats",
    "q_tpch_q2",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_tpch_q22",
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
