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

    The events table's ``ts`` physical type has varied across testdata
    generations — TIMESTAMP(NANOS) (which Spark's vectorized reader
    rejects; read as raw nanos via legacy.parquet.nanosAsLong and
    convert — lossless: the generator emits microsecond-precision
    values) and TIMESTAMP(MICROS) without timezone (read as
    TIMESTAMP_NTZ). Both are normalized to a session-TZ TIMESTAMP so
    every consumer (windows, unix_micros, streaming parity) sees one
    type; the session TZ is UTC, so the NTZ→LTZ cast preserves the
    wall-clock value.
    """
    if table == "events":
        from pyspark.sql import functions as F

        df = _read_with_nanos_as_long(spark, f"{sf_dir}/{table}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division: epoch-nanos exceed double's 2^53 mantissa,
            # so float division here would round the microsecond.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# The driver's correctness gate checks the FIRST 50 registry entries in
# order, so the registry is ordered by EVIDENCE NEED each round (VERDICT
# r3 #1): rounds 1 and 3 together cover all 80 queries, but 30 of them
# carry only round-1 rows — and one of those
# (`agg_percentiles_by_flag`) had BOTH its implementation and its oracle
# rewritten in round 2 after its only driver check. Stale-since-changed
# first, then longest-unchecked (the round-1-only block), then the
# queries whose code changes THIS round (curation ADVICE fixes, bucketed
# table reuse, simhash collapse probe, SRP bucket shard) so their fresh
# rows also land inside the window; the 43 round-3-green remainder rides
# on its round-3 rows.
_DRIVER_WINDOW_PRIORITY = [
    # (1) rewritten in r2 AFTER its only driver check — highest need
    "agg_percentiles_by_flag",
    # (2) round-1 rows only, untouched since — longest unchecked
    "q20_potential_promotion",
    "q21_suppliers_who_kept_waiting",
    "q22_global_sales_opportunity",
    "join_inner_enrich",
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "join_range_ship_lag",
    "agg_distinct_per_segment",
    "agg_rollup_region_nation",
    "agg_cube_status_priority",
    "agg_approx_distinct_parts",
    "pivot_status_by_priority",
    "window_running_total",
    "window_topk_orders_per_customer",
    "window_order_gaps",
    "set_union_nations",
    "set_intersect_nations",
    "set_except_nations",
    "dedup_first_lineitem_per_order",
    "events_tumbling_hourly",
    "events_asof_attribution",
    "events_sliding_windows",
    "events_session_windows",
    "fn_datetime_extract",
    "fn_math_string",
    "fn_array_ops",
    "fn_conditional_case",
    "fn_map_ops",
    "text_token_stats",
    # (3) code touched in round 4 — re-verify after the change
    "docs_hash_sample",
    "docs_domain_cap",
    "docs_pack_sequences",
    "docs_pii_redact",
    "docs_chunk_overlap",
    "docs_curation_pipeline",
    "join_bucketed_colocated",
    "docs_near_dup_simhash",
    "docs_near_dup_minhash",
    "emb_near_dup_srp",
    # (4) r3-green, high-signal oracles to fill the 50-entry window
    "q9_product_profit",
    "q12_late_lines",
    "events_json_extract",
    "text_quality_langid",
    "docs_dedup_exact",
    "docs_ngram_jaccard",
    "emb_cosine_topk",
    "emb_near_dup_cosine",
    "text_rolling_fingerprint",
    "unpivot_status_priority",
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
    missing = [n for n in _DRIVER_WINDOW_PRIORITY if n not in merged]
    if missing:
        # A typo or a rename here would silently demote the query out of
        # the driver's 50-entry checked window — fail loudly instead.
        raise ValueError(f"_DRIVER_WINDOW_PRIORITY names not in registry: {missing}")
    ordered: dict[str, QueryDef] = {}
    for name in _DRIVER_WINDOW_PRIORITY:
        ordered[name] = merged.pop(name)
    ordered.update(merged)
    return ordered
