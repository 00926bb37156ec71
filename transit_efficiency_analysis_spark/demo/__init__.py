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
    # (a) round-4 red rows, now fixed: q_text_pack (oracle HUGEINT→BIGINT
    # cast), the approx sketches (scalar rows + exact-side bounds
    # oracles), q_ts_now_audit (injected fixed clock per SURVEY §2.3)
    "q_text_pack",
    "q_approx_distinct",
    "q_approx_quantiles",
    "q_ts_now_audit",
    # (b) new in round 5: BM25/TF-IDF retrieval (built+pytested in r4,
    # never driver-checked), materialized-dashboard BI shape
    "q_retrieval_bm25",
    "q_retrieval_tfidf",
    "q_retrieval_hybrid_rrf",
    "q_agg_dashboard_materialized",
    "q_corpus_prep_pipeline",
    "q_upsert_scd2_history",
    "q_sim_lsh_recall",
    "q_sink_schema_evolution",
    "q_text_pack_concat",
    "q_validate_expectations",
    "q_clean_winsorize",
    "q_ts_gapfill_ffill",
    "q_agg_incremental_maintenance",
    "q_events_funnel",
    "q_multimodal_resize",
    "q_topk_per_group",
    "q_graph_pagerank",
    "q_text_vocab_coverage",
    "q_text_bpe_merges",
    "q_join_bloom_prefilter",
    "q_sample_split",
    "q_approx_topk_cms",
    "q_stats_regression",
    "q_text_collocations",
    "q_sink_jsonl",
    "q_window_ohlc",
    "q_text_bpe_encode",
    "q_sink_dynamic_overwrite",
    "q_agg_mode",
    "q_agg_share",
    "q_join_nullsafe",
    "q_join_incremental_maintenance",
    "q_sink_codec_zstd",
    "q_window_ntile",
    "q_events_retention",
    "q_sim_centroid_outliers",
    # (b2) new late in round 5: triangle counting, Z-order layout,
    # last-touch attribution, MAD outliers, and the streaming catch-up
    # demo below (each verify_local-green at sf0.001+sf0.01 when added)
    "q_graph_triangles",
    "q_layout_zorder",
    "q_events_attribution",
    "q_clean_mad_outliers",
    "q_sim_int8_quantize",
    "q_stats_drift_tvd",
    "q_stream_daily_agg",
    # (c) implementation changed since last green row: the r5
    # persist(DISK_ONLY) rewrite of the reuse checkpoints touches every
    # consumer of minhash_lsh_pairs/simhash_pairs and the IVF family;
    # minhash demos also carry the r4 Kirsch-Mitzenmacher rewrite the
    # driver should re-record. One representative per changed persist
    # path: minhash_lsh (shingle persist + KM hashing), simhash_pairs
    # (fingerprint persist + one-pass votes), ivf_topk (IVF persist).
    # The banded/h3/lloyd/pq/clusters variants share these paths and
    # were displaced by the (b2) additions; all are green in the
    # session's full-registry sweeps at sf0.01 and rotate back next
    # round.
    "q_dedup_minhash_lsh",
    "q_dedup_simhash_pairs",
    "q_sim_ivf_topk",
]

# Prior-green re-verification filler: none this round — every slot is
# taken by fixes, first-verdict entries, and changed-since-green rows.
_WINDOW_FILLER: list[str] = []

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
