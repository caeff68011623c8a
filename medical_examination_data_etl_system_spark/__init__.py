"""medical_examination_data_etl_system_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-implementation of the capabilities of the
reference repo ``zzlinislatszy/Medical-Examination-Data-ETL-System`` (a pandas ETL
pipeline behind FastAPI; see SURVEY.md), extended with the relational
operator surface (joins/aggregates/windows/set-ops/event-time windows)
and LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for cluster scale.

Layout:
    session      SparkSession factory (AQE + Arrow on)
    schemas      explicit StructType contracts (input, SUBSET, dims)
    pipeline/    the medical-report ETL: ingest -> enrich -> clean ->
                 render (reference parity, mock-LLM deterministic)
    operators/   dedup, similarity, text analysis, multimodal,
                 clustering, skew, bucketing, cache scoping
    queries/     oracle-checked query battery over /root/testdata
                 (sources: parquet via queries.load, JSONL via
                 pipeline.ingest, Mongo dims via pipeline.dims)
    streaming/   Structured Streaming variants of event-time ops
"""

from medical_examination_data_etl_system_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
