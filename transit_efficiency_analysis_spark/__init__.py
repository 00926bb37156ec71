"""transit_efficiency_analysis_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference GTFS transit-delay pipeline (`andreszlima/transit-efficiency-analysis`,
surveyed in SURVEY.md), re-expressed Spark-first:

- declarative DataFrame/SQL plans (Catalyst optimizes; no hand scheduling)
- pure column expressions for every scalar function (whole-stage codegen;
  no row-at-a-time Python in the hot path)
- window-dedup upserts instead of per-row ``INSERT ... ON CONFLICT``
- Structured Streaming for the realtime micro-batch path
- LLM-data-pipeline extensions: dedup (exact/MinHash-LSH/SimHash/Jaccard/
  embedding), similarity search, text analysis, multimodal column plumbing

Layout:
    functions/   scalar column-expression libraries (time, weather, text, vectors)
    sources/     readers (GTFS static CSV, realtime protobuf, testdata registry)
    operators/   relational operators (star join, delay diff, upsert, analytics,
                 dedup, similarity, text ops, multimodal)
    plans/       plan-inspection helpers (pushdown/broadcast assertions)
    streaming/   Structured Streaming variants of the ingest path
"""

__version__ = "0.1.0"
