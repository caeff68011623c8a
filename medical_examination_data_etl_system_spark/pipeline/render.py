"""Rendering: per-record hierarchical text report.

Parity with reference text_processing.py:33-141, Spark-first:

- P4 (per-record language projection, reference :41-49) is data-parallel:
  one ``when``-coalesce chain per generic column instead of a per-record
  Python loop — all four languages in one pass, JVM-side.
- The rewrite lookup (reference :76 + :124 ``summary_translated.get``)
  is a broadcast left join against the persisted distinct-summary
  rewrite table (see ``pipeline.llm``) — not a driver-side dict.
- U2 (the renderer, reference :66-126) is genuinely row-procedural:
  order-preserving nested grouping GROUP → SUMMARY [→ COMMENT] with
  first-seen block regrouping. v1 implements it as a grouped-map
  ``applyInPandas`` per RECORD_ID — one Arrow batch per record group,
  pure-Python tree assembly inside. The record is the natural
  parallelism unit at scale (records are small; skew is bounded by
  record size, and AQE splits skewed shuffle partitions).

Indentation contract (reference :69-73,116-124):
GROUP at col 0, item line at 4 spaces, comment line at 8, summary line at
12 with a trailing ``\\n`` appended to each summary line.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from medical_examination_data_etl_system_spark.schemas import LANGU_MAP

_GENERIC_SRC = {
    "GROUP": {"1": "TCNAME_GROUP", "2": "ENNAME_GROUP", "3": "JPNAME_GROUP", "4": "SCNAME_GROUP"},
    "ITEM_NAME": {"1": "TCNAME_ITEM", "2": "ENNAME_ITEM", "3": "JPNAME_ITEM", "4": "SCNAME_ITEM"},
    "COMMENT_G": {"1": "COMMENT", "2": "ENNAME_COMMENT", "3": "JPNAME_COMMENT", "4": "SCNAME_COMMENT"},
    "SUMMARY": {"1": "TCNAME_SUMMARY", "2": "ENNAME_SUMMARY", "3": "JPNAME_SUMMARY", "4": "SCNAME_SUMMARY"},
}


def _lang_pick(src_by_lang: dict[str, str]) -> F.Column:
    lang = F.trim(F.col("LANG_NO").cast("string"))
    expr = F.lit("")
    chain = None
    for lang_no, src in src_by_lang.items():
        cond = lang == lang_no
        chain = F.when(cond, F.col(src)) if chain is None else chain.when(cond, F.col(src))
    return chain.otherwise(expr)


def with_generic_columns(df: DataFrame) -> DataFrame:
    """P4 for all four languages at once: add GROUP / ITEM_NAME /
    COMMENT_G / SUMMARY picked by each row's LANG_NO."""
    return df.withColumns({dst: _lang_pick(src) for dst, src in _GENERIC_SRC.items()})


# ---------------------------------------------------------------------------
# Per-record tree assembly (pure Python, runs inside applyInPandas)
# ---------------------------------------------------------------------------


def _groups_in_encounter_order(rows: list[dict], key: str) -> list[tuple[str, list[dict]]]:
    """All rows per distinct key value; values in first-occurrence order.

    Semantics of pandas ``groupby(key, sort=False)`` iteration
    (reference text_processing.py:80,84,87): groups are keyed by value
    (non-adjacent rows with the same value unify), ordered by the key's
    first appearance.
    """
    acc: dict[str, list[dict]] = {}
    for r in rows:
        acc.setdefault(r[key], []).append(r)
    return list(acc.items())


def _first_seen_item_names(rows: Iterable[dict]) -> list[str]:
    """First-occurrence item-name dedup by ITEM_CODE (reference :129-141)."""
    seen: set[str] = set()
    names: list[str] = []
    for r in rows:
        code = str(r["ITEM_CODE"]).strip()
        if code not in seen:
            seen.add(code)
            names.append(str(r["ITEM_NAME"]).strip())
    return names


def _dedup_keep_first(values: Iterable[str]) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for v in values:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def render_record(lang_no: str, rows: list[dict]) -> str:
    """Assemble one record's indented report (reference :66-126).

    ``rows`` must be in encounter order (sorted by ``ord``) and carry
    GROUP, ITEM_CODE, ITEM_NAME, COMMENT_G, SUMMARY, REWRITTEN.
    """
    default_text = LANGU_MAP.get(str(lang_no).strip(), "")
    lines: list[str] = []

    for group_val, group_rows in _groups_in_encounter_order(rows, "GROUP"):
        lines.append(str(group_val).strip())

        # Build summary blocks (reference :83-101)
        blocks: list[dict] = []
        for summary_val, srows in _groups_in_encounter_order(group_rows, "SUMMARY"):
            stripped = str(summary_val).strip()
            rewritten = str(srows[0]["REWRITTEN"]).strip()
            if summary_val == default_text:
                # Default-summary branch: one block per distinct comment
                for comment_val, crows in _groups_in_encounter_order(srows, "COMMENT_G"):
                    blocks.append(
                        {
                            "items": _first_seen_item_names(crows),
                            "comments": [str(comment_val).strip()],
                            "summary": stripped,
                            "rewritten": rewritten,
                        }
                    )
            else:
                blocks.append(
                    {
                        "items": _first_seen_item_names(srows),
                        "comments": _dedup_keep_first(str(r["COMMENT_G"]).strip() for r in srows),
                        "summary": stripped,
                        "rewritten": rewritten,
                    }
                )

        # First-seen block regrouping (reference :103-110): stable-sort
        # blocks by (first index at which their items-tuple appeared,
        # original index).
        first_seen: dict[tuple, int] = {}
        for i, b in enumerate(blocks):
            first_seen.setdefault(tuple(b["items"]), i)
        ordered = sorted(enumerate(blocks), key=lambda t: (first_seen[tuple(t[1]["items"])], t[0]))

        # Emission (reference :112-124): item line only when the items
        # tuple changes; comment line when present; summary line with a
        # trailing newline.
        last_key: tuple | None = None
        for _, b in ordered:
            key = tuple(b["items"])
            if key != last_key:
                lines.append(f"    {'、'.join(b['items'])}")
                last_key = key
            if b["comments"]:
                lines.append(f"        {'、'.join(b['comments'])}")
            if b["summary"]:
                lines.append(f"            {b['rewritten']}\n")

    return "\n".join(lines)


_RENDER_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType(), True),
        T.StructField("report", T.StringType(), True),
        T.StructField("request", T.StringType(), True),
        T.StructField("rec_ord", T.LongType(), True),
    ]
)


def _render_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("ord")
    lang_no = str(pdf["LANG_NO"].iloc[0]).strip()
    rows = pdf[["GROUP", "ITEM_CODE", "ITEM_NAME", "COMMENT_G", "SUMMARY", "REWRITTEN"]].to_dict(
        "records"
    )
    report = render_record(lang_no, rows)
    return pd.DataFrame(
        {
            "record_id": [str(pdf["RECORD_ID"].iloc[0])],
            "report": [report],
            "request": [pdf["request"].iloc[0]],
            "rec_ord": [int(pdf["rec_ord"].iloc[0])],
        }
    )


def render_reports(cleaned: DataFrame, rewrites: DataFrame) -> DataFrame:
    """cleaned SUBSET frame + rewrite table → (record_id, report, request).

    ``rewrites`` is the persisted output of
    ``llm.rewrite_distinct_summaries`` keyed by (LANG_NO, SUMMARY).
    """
    df = with_generic_columns(cleaned)
    df = df.withColumn("_summary_key", F.trim(F.col("SUMMARY")))
    rw = rewrites.select(
        F.col("LANG_NO").alias("_rw_lang"),
        F.col("SUMMARY").alias("_rw_key"),
        "SUMMARY_REWRITTEN",
    )
    df = df.join(
        F.broadcast(rw),
        (F.trim(F.col("LANG_NO").cast("string")) == F.col("_rw_lang"))
        & (F.col("_summary_key") == F.col("_rw_key")),
        "left",
    )
    # Fallback to the original (stripped) summary — reference :124's
    # ``summary_translated.get(summary, summary)``.
    df = df.withColumn("REWRITTEN", F.coalesce(F.col("SUMMARY_REWRITTEN"), F.col("_summary_key")))

    narrow = df.select(
        "RECORD_ID",
        "LANG_NO",
        "ord",
        "rec_ord",
        "request",
        "GROUP",
        "ITEM_CODE",
        "ITEM_NAME",
        "COMMENT_G",
        "SUMMARY",
        "REWRITTEN",
    )
    return narrow.groupBy("RECORD_ID").applyInPandas(_render_group, schema=_RENDER_SCHEMA)
