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
# r3 #1). Round 7 (driver r05), counted at rotation time: 69 of 149 then-
# registered queries had no driver row (rounds r01∪r03∪r04 cover 80);
# the 6 late-round additions below grew the registry to 155 (all 6 took
# window slots — see the displacement notes). The window holds
# (1) the 18 queries ADDED OR REWRITTEN this round — the two scale
# rewrites (join_interval_overlap's canonical-bucket blocking,
# lineitem_spearman_corr's distributed ranks) happened after their only
# local parity runs, so they lead; then (2) the 3 streaming queries
# whose code changed (events ts-normalization, internal round 5) AFTER
# their last driver row (r03) and which r04's window could not hold;
# then (3) the never-checked round-5/6 additions. 19 never-checked
# queries with the strongest alternative evidence (pytest oracle parity
# green + plan guards; simplest shapes: fn_value_histogram,
# explode_outer, mom_growth, format_roundtrip, corrupt_json_audit,
# compact_small_files, full_outer, window_distribution, kmeans/pagerank
# rows-only, triangle, top_paths, daily_anomaly, chi_square,
# price_qty_corr, train_val_test_split, length_buckets, weighted_sample,
# p90_outlier, domain_mix, customer_rfm_segments and
# events_pmi_cooccurrence, emb_label_centroids, emb_quantize_int8,
# window_range_30d_sum, events_variant_extract, layout_partition_prune,
# layout_schema_evolution — displaced by the 8 late-round additions
# (epoch-shuffle/attribution/latency/KMV/negative-sampling/bloom/
# Holt/trend); the layout family keeps zorder as its window
# representative, both displaced layouts carry plan guards in pytest; tfidf/entropy
# yield to the final seasonality/cluster-size additions — both were
# 100×-swept this round and carry pytest parity) wait for the r06 rotation — a query with
# ZERO driver rows outranks one green 1-2 rounds ago, but within the
# zero-row set the novel/changed surfaces outrank the pytest-pinned
# trivia. Every name is asserted against the registry (ADVICE r4).
_DRIVER_WINDOW_PRIORITY = [
    "events_cumulative_distinct",
    "events_ewma_smoothing",
    "events_histogram_equidepth",
    "agg_grouping_sets",
    "join_interval_overlap",
    "agg_hll_rollup",
    "emb_gram_matrix",
    "emb_pca_project",
    "fn_url_parse",
    "docs_bigram_coherence",
    "incr_agg_merge_orders",
    "lineitem_spearman_corr",
    "emb_standardize",
    "docs_stratified_sample",
    "docs_dedup_keep_best",
    "multimodal_phash_near_dup",
    "docs_vocab_growth",
    "stream_running_ewma",
    "docs_epoch_shuffle",
    "events_linear_attribution",
    "events_conversion_latency",
    "agg_kmv_overlap",
    "emb_negative_sampling",
    "join_bloom_prefilter",
    "events_holt_forecast",
    "customer_spend_trend",
    "orders_seasonality_index",
    "docs_dedup_cluster_sizes",
    "stream_tumbling_hourly",
    "stream_sessionize_stateful",
    "stream_click_attribution",
    "docs_decontaminate",
    "docs_repetition_ratio",
    "cdc_merge_orders",
    "scd2_user_event_history",
    "stream_dedup_exactly_once",
    "pit_purchase_user_state",
    "stream_upsert_latest_state",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_gap_fill_hourly",
    "docs_ngram_containment",
    "layout_zorder_cluster",
    "docs_heavy_hitter_terms",
    "events_transition_matrix",
    "dq_check_orders",
    "docs_fuzzy_levenshtein",
    "sql_interface_revenue",
    "stream_static_enrich",
    "sql_recursive_hierarchy",
]


def all_queries() -> dict[str, QueryDef]:
    from medical_examination_data_etl_system_spark.queries import (
        analytics,
        cdc,
        curation,
        datapipe,
        events,
        functions,
        quality,
        relational,
        skew,
        streaming,
        tpch,
        tpch2,
    )

    merged: dict[str, QueryDef] = {}
    for mod in (tpch, tpch2, relational, events, functions, datapipe, curation, streaming, skew, cdc, analytics, quality):
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
