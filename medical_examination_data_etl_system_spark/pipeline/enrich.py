"""Enrichment: four broadcast left equi-joins against the dim tables.

Parity with reference db_to_dataframe.py:144-184 (key normalization +
J1-J4 merges + SUBSET projection), Spark-first:

- Dim tables derive from (or are filtered by) the request's key space —
  they are small by construction, so every join is an explicit
  ``F.broadcast``: no shuffle of the fact table, which is the side that
  scales to 100 TB.
- Key normalization (trim + cast-to-string, reference :144-162) happens
  once on each side before joining.
- Suffix collisions (pandas ``suffixes=('_ITEM','_GROUP')``) don't arise:
  the canonical dim schemas already carry suffixed names (schemas.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.schemas import SUBSET, ensure_columns


def _norm_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Trim + cast-to-string each join key (reference F2 semantics)."""
    present = [k for k in keys if k in df.columns]
    return df.withColumns({k: F.trim(F.col(k).cast("string")) for k in present})


def enrich(flat: DataFrame, dims: dict[str, DataFrame]) -> DataFrame:
    """fact ⋈ item_meta ⋈ item_group_map ⋈ diag_tbl ⋈ summary_tbl.

    All left joins, all broadcast. Returns SUBSET ∪ {ord, request}.
    """
    fact = _norm_keys(flat, ["ITEM_CODE", "ORG_ID", "DIAG_CODE"])

    item_meta = _norm_keys(dims["item_meta"], ["ITEM_CODE", "ORG_ID"])
    item_group_map = _norm_keys(dims["item_group_map"], ["ITEM_CODE"])
    diag_tbl = _norm_keys(dims["diag_tbl"], ["DIAG_CODE", "SUMMARY_CODE", "ORG_ID"])
    summary_tbl = _norm_keys(dims["summary_tbl"], ["SUMMARY_CODE", "ORG_ID"])

    # J1 (reference :164): multilingual item names on (ITEM_CODE, ORG_ID)
    df = fact.join(F.broadcast(item_meta), ["ITEM_CODE", "ORG_ID"], "left")
    # J2 (reference :165): group number + names on ITEM_CODE
    df = df.join(F.broadcast(item_group_map), ["ITEM_CODE"], "left")
    # J3 (reference :167-171): DIAG_CODE → SUMMARY_CODE + comment names.
    # The fact side carries no SUMMARY_CODE (dropped at ingest), so the
    # diag table's mapping is authoritative — the engine's resolution of
    # the reference's would-be column collision (SURVEY.md §2a J3).
    diag_cols = ["DIAG_CODE", "SUMMARY_CODE", "ENNAME_COMMENT", "JPNAME_COMMENT", "SCNAME_COMMENT"]
    df = df.join(F.broadcast(diag_tbl.select(*diag_cols)), ["DIAG_CODE"], "left")
    # J4 (reference :173-177): SUMMARY_CODE → multilingual summary names
    sum_cols = ["SUMMARY_CODE", "TCNAME_SUMMARY", "SCNAME_SUMMARY", "ENNAME_SUMMARY", "JPNAME_SUMMARY"]
    df = df.join(F.broadcast(summary_tbl.select(*sum_cols)), ["SUMMARY_CODE"], "left")

    # P3 + P2 (reference :180-184): backfill then fixed projection,
    # keeping the engine's order/echo columns.
    df = ensure_columns(df, SUBSET)
    return df.select(*SUBSET, "ord", "request")
