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
_WINDOW_FRONT = [
    # (a) new in round 6: the scale-safe equi-depth split (closes the
    # r5 q_window_ntile `weak`), the append-mode watermark demo
    # (closes "streaming eviction semantics under the driver hash"),
    # and the salted-distinct skew pattern (exercises the same distinct
    # machinery as q_distinct_agg, which yields its slot this round)
    "q_window_ntile_approx",
    "q_stream_daily_agg_append",
    "q_agg_salted_distinct",
    # late r6 additions: native session_window (batch) and streaming
    # sessionization with watermark eviction (append protocol); they take
    # the q_ts_sub_min / q_ts_epoch filler slots (the ts family keeps 6
    # of its 8 representatives this round — the two defer to round 7)
    "q_window_session_native",
    "q_stream_sessionize_append",
    # (b) registered in r5 after the sweep — never driver-checked
    "q_sample_temperature",
    # (c) implementation changed since last green row (r6 advice fixes):
    # int8 degenerate-range guard, drift-bucket lower clamp, graph
    # persist lifecycle (pagerank + triangles), streaming sink naming
    "q_sim_int8_quantize",
    "q_stats_drift_tvd",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_stream_daily_agg",
    # (d) the five consumers of the r5 persist(DISK_ONLY) rewrite whose
    # last driver rows predate it (displaced from the r5 window)
    "q_dedup_minhash_banded",
    "q_dedup_simhash_pairs_h3",
    "q_sim_ivf_lloyd_topk",
    "q_sim_ivf_pq_topk",
    "q_dedup_clusters_twophase",
]

# Prior-green re-verification filler, least-recently-verified first: the
# r1/r2-era driver rows (49 of them after round 5), §2 core prioritized —
# the flagship rebuild, star/diff/semi/anti/outer joins, the ts-* and
# case-* families, upserts, window family, set-ops. The 13 still left
# out (agg cube/rollup/pivot/stats/weather variants, the four text-ops,
# q_null_surface, q_upsert_replay, q_window_pctrank, q_ts_epoch,
# q_ts_sub_min, and q_distinct_agg — the last three yielded their slots
# to the late-r6 demos q_agg_salted_distinct / q_window_session_native /
# q_stream_sessionize_append) rotate in round 7, as do the five demos
# registered after the r6 window froze (q_sink_compaction,
# q_semi_xml_parse, q_sink_xml_roundtrip, q_src_binary_files,
# q_multimodal_features, and q_approx_sketch_union — each verified
# locally at sf0.001 + sf0.01 when added; the sketch union also at
# sf0.1).
# Post-freeze note: q_agg_dashboard_materialized (green r5) had a
# result-identical extract-method refactor after this window was set
# (the agg body moved to _dashboard_agg, shared with the bench-only BI
# read shape); oracle re-verified locally at sf0.001 — not re-slotted.
_WINDOW_FILLER: list[str] = [
    "q_rebuild_full",
    "q_join_star",
    "q_join_diff",
    "q_join_semi",
    "q_join_anti",
    "q_join_outer",
    "q_agg_dashboard",
    "q_upsert_ignore",
    "q_upsert_cond",
    "q_dedup_window_latest",
    "q_ts_gtfs_parse",
    "q_ts_unix",
    "q_ts_date_parse",
    "q_ts_dow_name",
    "q_ts_hour_local",
    "q_ts_tz_localize",
    "q_proj_select",
    "q_proj_rename",
    "q_proj_concat",
    "q_filter_entity",
    "q_filter_sentinel",
    "q_case_null",
    "q_case_diff",
    "q_case_avg",
    "q_case_bucket",
    "q_expr_math",
    "q_expr_cast",
    "q_window_running",
    "q_window_rank",
    "q_window_lag",
    "q_set_union",
    "q_set_intersect",
    "q_set_except",
    "q_limit_topk",
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
