"""The oracle-checked query battery (SURVEY.md §2b; driver contract).

Every entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame``
with (where expressible) an ANSI-SQL oracle that DuckDB runs on the same
parquet tables. Column names/aliases match exactly on both sides — the
driver's comparator sorts columns by name before value-hashing.

Registration pattern: each module exposes ``QUERIES: dict[name, QueryDef]``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → rows-only check (non-SQL-expressible)


def _read_with_nanos_as_long(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read with nanosAsLong scoped to schema resolution.

    The conf only matters while ``spark.read.parquet`` resolves the
    footer schema (the relation then carries ``ts: bigint``); verified
    that later actions execute fine with the conf restored — so a
    session-wide mutation isn't needed and other reads in the same
    session see their previous setting."""
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        return spark.read.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a testdata table.

    The events table stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects — read it as raw nanos
    (legacy.parquet.nanosAsLong) and convert to a microsecond timestamp
    (lossless here: the generator emits microsecond-precision values).
    """
    if table == "events":
        from pyspark.sql import functions as F

        df = _read_with_nanos_as_long(spark, f"{sf_dir}/{table}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: epoch-nanos exceed double's 2^53 mantissa,
            # so float division here would round the microsecond.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# The driver's correctness gate checks the FIRST 50 registry entries in
# order. Round 1 proved everything before `text_quality_langid` green but
# left the entire docs/emb/multimodal/stream/skew battery unchecked, so
# the registry is ordered by evidence need: queries with no driver row
# yet come first, then queries whose round-1 rows failed and have been
# fixed since (q9 exact-cents, q12/events_json_extract oracle casts),
# then the already-driver-green remainder in module order.
_DRIVER_WINDOW_PRIORITY = [
    # never checked in round 1 (registry positions 50-69)
    "text_quality_langid",
    "docs_dedup_exact",
    "docs_near_dup_minhash",
    "docs_near_dup_simhash",
    "docs_near_dup_components",
    "docs_ngram_jaccard",
    "emb_cosine_topk",
    "emb_near_dup_cosine",
    "text_rolling_fingerprint",
    "emb_lsh_topk",
    "emb_ivf_topk",
    "multimodal_doc_embedding_join",
    "multimodal_binary_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "stream_tumbling_hourly",
    "stream_sessionize_stateful",
    "stream_click_attribution",
    "skew_salted_count_distinct",
    "skew_salted_join",
    # new in round 3 (curation battery)
    "docs_hash_sample",
    "docs_domain_cap",
    "docs_pack_sequences",
    "docs_pii_redact",
    "docs_chunk_overlap",
    # new in round 2
    "emb_near_dup_srp",
    "join_bucketed_colocated",
    "docs_near_dup_components_alt",
    "unpivot_status_priority",
    "docs_curation_pipeline",
    # round-1 hash-fails, fixed
    "q9_product_profit",
    "q12_late_lines",
    "events_json_extract",
]


def all_queries() -> dict[str, QueryDef]:
    from medical_examination_data_etl_system_spark.queries import (
        curation,
        datapipe,
        events,
        functions,
        relational,
        skew,
        streaming,
        tpch,
        tpch2,
    )

    merged: dict[str, QueryDef] = {}
    for mod in (tpch, tpch2, relational, events, functions, datapipe, curation, streaming, skew):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    ordered: dict[str, QueryDef] = {}
    for name in _DRIVER_WINDOW_PRIORITY:
        if name in merged:
            ordered[name] = merged.pop(name)
    ordered.update(merged)
    return ordered
