"""Dimension tables: offline fallback generator + pluggable loaders.

Parity with reference db_to_dataframe.py:61-95 (fallback) / :98-141
(MongoDB). The engine treats dims as plain DataFrames; where they come
from (parquet, JDBC, Mongo connector) is a loader concern. The fallback
derives deterministic dims from the fact table's distinct keys so the
whole pipeline runs offline — same guarantee the reference makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.schemas import (
    DIAG_TBL_SCHEMA,
    ITEM_GROUP_MAP_SCHEMA,
    ITEM_META_SCHEMA,
    SUMMARY_TBL_SCHEMA,
)


def fallback_dims(flat: DataFrame) -> dict[str, DataFrame]:
    """Synthesize the four dim tables from distinct fact keys.

    Reference parity (db_to_dataframe.py:63-95):
    - item_meta: one row per distinct ITEM_CODE with '項目/项目/Item {code}'
      names. The reference stamps every row with the FIRST record's
      ORG_ID (``.iloc[0]``); the engine uses the distinct
      (ITEM_CODE, ORG_ID) pairs instead — identical for single-org
      batches, and correct (instead of silently join-missing) for
      multi-org batches.
    - item_group_map: every code → GROUPNO 1, '範例分類/Sample Group/…'.
    - diag_tbl: identity DIAG_CODE → SUMMARY_CODE, empty comment names.
    - summary_tbl: every summary code with empty names (so the
      per-language defaults kick in downstream).
    """
    code = F.col("ITEM_CODE")
    item_meta = (
        flat.select(
            F.trim(code.cast("string")).alias("ITEM_CODE"),
            F.trim(F.col("ORG_ID").cast("string")).alias("ORG_ID"),
        )
        .distinct()
        .select(
            "ITEM_CODE",
            F.concat(F.lit("項目 "), F.col("ITEM_CODE")).alias("TCNAME_ITEM"),
            F.concat(F.lit("项目 "), F.col("ITEM_CODE")).alias("SCNAME_ITEM"),
            F.concat(F.lit("項目 "), F.col("ITEM_CODE")).alias("JPNAME_ITEM"),
            F.concat(F.lit("Item "), F.col("ITEM_CODE")).alias("ENNAME_ITEM"),
            "ORG_ID",
        )
    )

    item_group_map = (
        flat.select(F.trim(code.cast("string")).alias("ITEM_CODE"))
        .distinct()
        .select(
            "ITEM_CODE",
            F.lit(1).cast("int").alias("GROUPNO"),
            F.lit("範例分類").alias("TCNAME_GROUP"),
            F.lit("Sample Group").alias("ENNAME_GROUP"),
            F.lit("サンプル分類").alias("JPNAME_GROUP"),
            F.lit("示例分类").alias("SCNAME_GROUP"),
        )
    )

    diag_tbl = (
        flat.select(F.trim(F.col("DIAG_CODE").cast("string")).alias("DIAG_CODE"))
        .distinct()
        .select(
            "DIAG_CODE",
            F.col("DIAG_CODE").alias("SUMMARY_CODE"),
            F.lit("").alias("ENNAME_COMMENT"),
            F.lit("").alias("JPNAME_COMMENT"),
            F.lit("").alias("SCNAME_COMMENT"),
        )
    )

    summary_tbl = diag_tbl.select(
        F.col("SUMMARY_CODE"),
        F.lit("").alias("TCNAME_SUMMARY"),
        F.lit("").alias("SCNAME_SUMMARY"),
        F.lit("").alias("ENNAME_SUMMARY"),
        F.lit("").alias("JPNAME_SUMMARY"),
    ).distinct()

    return {
        "item_meta": item_meta,
        "item_group_map": item_group_map,
        "diag_tbl": diag_tbl,
        "summary_tbl": summary_tbl,
    }


def dims_from_parquet(spark, base_dir: str) -> dict[str, DataFrame]:
    """Load the four dims from parquet files named after the tables."""
    schemas = {
        "item_meta": ITEM_META_SCHEMA,
        "item_group_map": ITEM_GROUP_MAP_SCHEMA,
        "diag_tbl": DIAG_TBL_SCHEMA,
        "summary_tbl": SUMMARY_TBL_SCHEMA,
    }
    return {
        name: spark.read.schema(schema).parquet(f"{base_dir}/{name}.parquet")
        for name, schema in schemas.items()
    }
