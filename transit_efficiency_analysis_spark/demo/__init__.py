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
# Standing freshness SLO (adopted round 8): no registry entry's latest
# driver row may be older than 4 rounds, and no entry may stay
# registered-but-never-driver-checked past the round after it lands.
# Each round's window therefore takes (1) never-checked entries first,
# (2) the oldest driver rows next, (3) anything whose implementation or
# oracle changed since its last green row. With 224 entries and a
# 50-slot window, a full refresh cycle is ~5 rounds — the SLO holds as
# long as new-demo growth stays under ~30/round.
_WINDOW_FRONT = [
    # Registered in round 7 after the window froze — never
    # driver-checked (all 11 judge-verified green at sf0.01 in the r7
    # VERDICT, but the hard record should say so): the incremental
    # (batch-vs-corpus) near-dup pair and the nine function-surface
    # demos.
    "q_dedup_minhash_incremental",
    "q_dedup_simhash_incremental",
    "q_text_regex_extract",
    "q_sql_collation",
    "q_semi_map_ops",
    "q_expr_try_arith",
    "q_ts_calendar",
    "q_agg_grouping_id",
    "q_agg_bitwise",
    "q_window_cume_nth",
    "q_array_setops",
]

# Prior-green re-verification filler, least-recently-verified first.
# After round 7 the stale tail is 28 r3-era rows and 42 r4-era rows
# (everything r5+ is within the SLO). All 28 r3 rows take slots this
# round; 11 of the r4 rows fill the rest, picked §2-core-first: the two
# ingest demos (src-zip-csv / src-protobuf), null-clean and
# sink-truncate (§2 core), upsert_merge, the incremental exact-dedup
# and blocked-embedding near-dup, the LSH top-k, and the three
# specialty joins (bucketed, skew-salted, range-interval). The 31 r4
# rows left for round 9 (TPC-H q2..q22 battery, sink_orc/partitioned/
# roundtrip, array_agg/explode, grouping_sets, sample_rebalance/
# weighted, sim_lsh_buckets/multiprobe, asof_tolerance, ngram_stats,
# contamination_capped, sql_tpch_q1) all have r4-green rows and stay
# inside the 4-round SLO through round 8; round 9's window must take
# them.
_WINDOW_FILLER: list[str] = [
    # r3-era (driver rows from CORRECTNESS_r03) — all 28
    "q_agg_histogram",
    "q_apply_in_pandas",
    "q_dedup_editdistance",
    "q_dedup_embedding",
    "q_dedup_simhash",
    "q_json_parse",
    "q_multimodal_bmp",
    "q_multimodal_frames",
    "q_multimodal_meta",
    "q_multimodal_wav",
    "q_pandas_udf_scalar",
    "q_range_normalize",
    "q_sample_hash",
    "q_sample_stratified",
    "q_subquery_correlated_avg",
    "q_subquery_exists",
    "q_subquery_scalar",
    "q_text_chunk",
    "q_text_contamination",
    "q_text_redact",
    "q_text_repetition",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q10",
    "q_tpch_q12",
    "q_window_range",
    "q_window_session",
    "q_window_tumbling",
    # r4-era (driver rows from CORRECTNESS_r04) — §2-core-first picks
    "q_ingest_gtfs_static",
    "q_ingest_gtfs_rt",
    "q_null_clean",
    "q_sink_truncate",
    "q_upsert_merge",
    "q_dedup_incremental",
    "q_dedup_embedding_lsh",
    "q_sim_lsh_topk",
    "q_join_bucketed",
    "q_join_skew_salted",
    "q_join_range_interval",
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
