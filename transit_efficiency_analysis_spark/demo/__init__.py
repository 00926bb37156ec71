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
_WINDOW_ROUND = 16

# Round-16 window (docs/ROUND15.md precomputed the arithmetic; VERDICT
# r15 confirmed it against the artifacts: 46 forced r11-era rows + 4
# genuinely free slots). Nothing in this window changed implementation
# this round — round 16's code work (the parquet_rows n_rows threading,
# the manifest commit-backend interface, the MinHash signature arrow
# twin, the three ADVICE r15 fixes) is either plan-pinned-identical on
# the demo path (test_assign_auto's fold pins are the gate the VERDICT
# names for the threading), scoped to manifest-protocol functions the
# symlink-protocol demo never executes, or dark behind a non-default
# parameter (standing dark-ship exemption, ADVICE r13). The demos whose
# executed Python changed by the n_rows threading (the 3 IVF + 2
# SemDeDup call sites) are re-verified locally via tools/verify_local.py
# this round and take 5 of round 17's 8 free slots (precomputed in
# docs/ROUND16.md) — their plans are pinned unchanged, so the driver
# re-check is confirmation, not discovery.
#
# Dark-ship exemption (standing policy, ADVICE r13): an engine-side
# branch shipped behind a non-default parameter whose default takes the
# pre-change code path VERBATIM does NOT take a window slot the round
# it lands; it takes one the round its DEFAULT flips (the oracle is
# mirrored then too). Each exemption must be (a) named in ROUNDn.md,
# (b) re-verified locally via tools/verify_local.py the round it lands,
# and (c) scheduled for a real slot at its flip. Round 16's exemption:
# the MinHash signature mapInArrow twin (assign-style opt-in on
# minhash_signatures; default keeps the expression form verbatim).
_WINDOW_FRONT = [
    # The 4 free slots: r12-tier early start (taking 4 now leaves round
    # 17 at 42 forced + 8 free — incident slack where the r15 red row
    # showed it's needed). Selection rule: the r12-era rows most
    # adjacent to files this round touches (similarity.py: ADVICE r15
    # fixes; dedup.py: the MinHash arrow twin; operators/upsert.py: the
    # manifest commit-backend interface) so the re-verification also
    # exercises the changed files' untouched paths.
    "q_sim_int8_quantize",
    "q_dedup_minhash_banded",
    "q_upsert_cond",
    "q_upsert_ignore",
]

# Prior-green re-verification filler, least-recently-verified first:
# the 46 r11-era rows (latest driver row CORRECTNESS_r11 — exactly one
# rotation cycle old at round 16; check_window R3 lists exactly this
# set, and docs/ROUND15.md precomputed it).
_WINDOW_FILLER: list[str] = [
    "q_agg_dashboard_materialized",
    "q_agg_incremental_maintenance",
    "q_agg_mode",
    "q_agg_share",
    "q_approx_distinct",
    "q_approx_quantiles",
    "q_approx_topk_cms",
    "q_clean_mad_outliers",
    "q_clean_winsorize",
    "q_corpus_prep_pipeline",
    "q_events_attribution",
    "q_events_funnel",
    "q_events_retention",
    "q_join_bloom_prefilter",
    "q_join_incremental_maintenance",
    "q_join_nullsafe",
    "q_layout_zorder",
    "q_multimodal_resize",
    "q_retrieval_bm25",
    "q_retrieval_hybrid_rrf",
    "q_retrieval_tfidf",
    "q_sample_split",
    "q_sim_centroid_outliers",
    "q_sim_lsh_recall",
    "q_sim_lsh_topk_derived",
    "q_sink_codec_zstd",
    "q_sink_dynamic_overwrite",
    "q_sink_jsonl",
    "q_sink_schema_evolution",
    "q_stats_regression",
    "q_text_bpe_encode",
    "q_text_bpe_merges",
    "q_text_collocations",
    "q_text_dup_span_removal",
    "q_text_dup_spans",
    "q_text_novelty",
    "q_text_pack",
    "q_text_pack_concat",
    "q_text_vocab_coverage",
    "q_topk_per_group",
    "q_ts_gapfill_ffill",
    "q_ts_now_audit",
    "q_upsert_scd2_history",
    "q_validate_expectations",
    "q_window_ntile",
    "q_window_ohlc",
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
