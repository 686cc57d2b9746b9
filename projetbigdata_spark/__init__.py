"""projetbigdata_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query semantics and operator surface of the
reference opinion-mining pipeline (pifouuu/ProjetBigData, surveyed in
SURVEY.md), re-expressed as idiomatic Spark DataFrame / SQL / Catalyst
plans, extended with the relational + LLM-data-pipeline operator set a
100 TB training-data platform needs.

Layout:
    session     — SparkSession factory tuned for scale (AQE, Arrow, UTC)
    sources     — parquet catalog over the test tables + sinks
    functions   — reusable column expressions (text, vectors, quality)
    operators   — batch operators, each a (spark, sf_dir) -> DataFrame query
    streaming   — Structured Streaming surface over `events`
    ml          — pipeline / feature-selection lifecycle (SURVEY.md §2.10)
    multimodal  — binary-column (image/audio) plumbing with stubbed decode
    registry    — aggregates every query + its DuckDB oracle SQL
"""

__version__ = "0.1.0"
