"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship: the medical-report pipeline run over
  records synthesized deterministically from the sf0.001 documents
  table (end-to-end ingest→enrich→clean→render with mock LLM).
- ``queries()`` — the oracle-checked operator battery
  (medical_examination_data_etl_system_spark/queries/*).
- ``oracle_sql()`` — matching DuckDB SQL for every exactly-expressible
  query; hash-based/approximate operators are rows-only by design.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from medical_examination_data_etl_system_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full medical-report pipeline on sf0.001-derived records."""
    from medical_examination_data_etl_system_spark.pipeline import process_records
    from medical_examination_data_etl_system_spark.pipeline.synthesize import records_from_documents

    sf_dir = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    records = records_from_documents(docs, max_records=50)
    return process_records(spark, records)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in all_queries().items() if qd.oracle is not None}
