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
# cycle — ceil(len(REGISTRY) / 50) rounds, currently ceil(237/50) = 5 —
# and no entry may stay registered-but-never-driver-checked past the
# round after it lands. (The original 4-round figure was set when the
# registry was ~200 entries; at 237 a 4-round cycle would need a
# 60-slot window the driver doesn't have, so 4 was unachievable by
# arithmetic, not negligence. The cycle-length form is the tightest
# bound strict oldest-first rotation can actually deliver.)
# Each round's window takes (1) never-checked entries first, (2) the
# oldest driver rows next, (3) anything whose implementation or oracle
# changed since its last green row. tools/check_window.py enforces all
# of this mechanically (wired into pytest via tests/test_window.py) so a
# skipped rotation can never ship silently again — the round-10 miss
# shipped exactly because the rotation lived only in a comment.
# Round-11 window. Never-driver-checked entries take slots first (SLO
# deadline: the round after they land, which for both is THIS round —
# they were registered in round 10 and round 10's window was never
# rotated, the miss VERDICT r10 flagged).
_WINDOW_FRONT = [
    # Round-10 additions, never driver-checked:
    "q_dedup_semantic_hier",
    "q_sim_lsh_topk_derived",
    # New in round 11 (the pure-Parquet transactional MERGE runtime —
    # VERDICT r10 gap #3): new entries take slots the round they land.
    "q_upsert_merge_parquet",
    # Implementation changed this round (policy: re-verify the round the
    # code changes): the dup-screen's standing-table maintenance moved
    # to the MERGE-unique append set (operators/spans.py
    # new_kgrams_for_append) — screening proven policy-invariant, but
    # the driver row should postdate the change.
    "q_stream_dup_screen",
    # Also implementation-changed: the in-corpus span family's dup test
    # moved from groupBy+join-back to the single-exchange kgram window
    # (operators/spans.py _flag_occurrences, measured ~2x at sf0.1);
    # outputs proven identical, but same rule — driver rows postdate
    # the change. These three took the slots of the r6 re-verification
    # picks (q_rebuild_full, q_agg_dashboard, q_join_star — unchanged
    # code, green r6 rows; round 12's window takes them with the other
    # r6 rows, which hit the cycle boundary then anyway).
    "q_text_dup_spans",
    "q_text_dup_span_removal",
    "q_text_novelty",
]

# Prior-green re-verification filler, least-recently-verified first:
# ALL 43 r5-era rows (their latest driver row is CORRECTNESS_r05 — six
# rounds stale, the freshness backlog VERDICT r10 item #2 called out).
# No r6 picks survived: the front's seven new/changed entries outrank
# re-verification of unchanged code, so all 46 r6 rows are exactly one
# rotation cycle old after this round — round 12's window MUST take
# them (tools/check_window.py R3 enforces it) plus the oldest r7 rows.
_WINDOW_FILLER: list[str] = [
    # r5-era (driver rows from CORRECTNESS_r05) — all 43
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
    "q_sim_ivf_topk",
    "q_sim_lsh_recall",
    "q_sink_codec_zstd",
    "q_sink_dynamic_overwrite",
    "q_sink_jsonl",
    "q_sink_schema_evolution",
    "q_stats_regression",
    "q_text_bpe_encode",
    "q_text_bpe_merges",
    "q_text_collocations",
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
