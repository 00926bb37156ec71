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
_WINDOW_FRONT = [
    # (a) new in round 7 — the Spark 4 SQL-surface demos (recursive
    # CTEs, VARIANT, LATERAL, listagg, pipe syntax, SQL UDF, UNPIVOT,
    # parameterized SQL), the streaming additions
    # (dropDuplicatesWithinWatermark, foreachBatch upsert), the Python
    # DataSource connector, and the mapInArrow / Observation surfaces
    "q_sql_recursive_chain",
    "q_sql_recursive_bfs",
    "q_semi_variant",
    "q_agg_listagg",
    "q_join_lateral_topk",
    "q_stream_dedup_append",
    "q_stream_upsert_foreachbatch",
    "q_src_python_datasource",
    "q_sql_pipe_q1",
    "q_sql_udf",
    "q_approx_top_k",
    "q_sql_unpivot",
    "q_sql_parameterized",
    "q_map_in_arrow",
    "q_observe_metrics",
    "q_retrieval_rerank",
    "q_sql_table_udf",
    "q_text_lm_score",
    "q_arrow_udf_scalar",
    "q_stream_join_append",
    "q_stream_join_left_append",
    # (b) registered in r6 after the window froze — never driver-checked
    "q_sink_compaction",
    "q_semi_xml_parse",
    "q_sink_xml_roundtrip",
    "q_src_binary_files",
    "q_multimodal_features",
    "q_approx_sketch_union",
    # (c) oracle changed since their r6 green rows (advice fix: event_id
    # tie-break added to the session oracles' running-sum ORDER BY)
    "q_window_session_native",
    "q_stream_sessionize_append",
]

# Prior-green re-verification filler, least-recently-verified first.
# After round 6 the stale set is: 15 r2-era rows (the agg cube/rollup/
# pivot/stats/weather variants, four text-ops, q_null_surface,
# q_upsert_replay, q_window_pctrank, q_ts_epoch, q_ts_sub_min,
# q_distinct_agg) and 34 r3-era rows. All 15 r2 rows take slots this
# round; 6 of the r3 rows follow (dedup/similarity/multimodal families
# and the asof join first — the operator families with the most
# implementation surface). The 20 r3 rows left for round 8:
# q_agg_histogram, the three subquery demos, q_text_chunk/redact/
# repetition, q_tpch_q3/q5/q10/q12, q_window_range/session/tumbling,
# q_apply_in_pandas, q_range_normalize, q_sample_hash,
# q_sample_stratified, q_multimodal_wav, q_pandas_udf_scalar,
# q_multimodal_bmp, q_multimodal_frames, q_multimodal_meta,
# q_json_parse (its JSON surface is front-covered by q_semi_variant
# this round), q_dedup_editdistance (the smallest dedup variant — the
# family holds four other slots this round), and q_text_contamination
# (whose newer r4-green _capped twin formulation stands), and
# q_dedup_simhash (base variant; the family's pairs/_h3 formulations
# hold r5/r6-green rows), and q_dedup_embedding (its blocked-LSH twin
# q_dedup_embedding_lsh holds an r4-green row). These fourteen yielded
# their slots to the late round-7 demos (q_src_python_datasource,
# q_sql_pipe_q1, q_sql_udf, q_approx_top_k, q_sql_unpivot,
# q_sql_parameterized, q_map_in_arrow, q_observe_metrics,
# q_retrieval_rerank, q_sql_table_udf, q_text_lm_score,
# q_arrow_udf_scalar, q_stream_join_append,
# q_stream_join_left_append).
_WINDOW_FILLER: list[str] = [
    # r2-era (driver rows from CORRECTNESS_r02)
    "q_agg_cube",
    "q_agg_rollup",
    "q_agg_pivot",
    "q_agg_stats",
    "q_agg_dashboard_weather",
    "q_distinct_agg",
    "q_null_surface",
    "q_text_fingerprint",
    "q_text_langid",
    "q_text_quality",
    "q_text_tokens",
    "q_ts_epoch",
    "q_ts_sub_min",
    "q_upsert_replay",
    "q_window_pctrank",
    # r3-era (driver rows from CORRECTNESS_r03)
    "q_dedup_exact",
    "q_dedup_clusters",
    "q_dedup_ngram_jaccard",
    "q_sim_bruteforce_topk",
    "q_jdbc_roundtrip",
    "q_join_asof",
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
