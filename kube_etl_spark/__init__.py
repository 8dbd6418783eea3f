"""kube_etl_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
ETL toolkit (`gke-labs/kube-etl`, studied read-only at /root/reference)
as an idiomatic Spark DataFrame/SQL engine, plus the LLM-data-pipeline
operator surface (dedup, similarity search, multimodal columns, text
analysis) designed for 100 TB scale.

Layout:
    session.py   — SparkSession construction with scale-aware defaults
    catalog.py   — fixture-table loading + type normalization
    registry.py  — the declared query list (SURVEY.md §2) with DuckDB oracles
    exact.py     — deterministic float aggregation (decimal-exact sums)
    queries/     — one module per operator family; registers into registry
    plans/       — batch pipelines (export-job analog, syncer rule compiler)
    streaming/   — Structured Streaming sources/sinks/CDC
"""

__version__ = "0.1.0"
