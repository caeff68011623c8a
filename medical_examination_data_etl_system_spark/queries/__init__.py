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
# r3 #1). Round 8 (driver r06) rotation — VERDICT r5 #1 verbatim: "rotate
# the driver window to the never-driver-checked queries". Computed at
# rotation time against CORRECTNESS_r{01,03,04,05}.json: 127 of the 160
# registered queries have at least one driver row; the window now holds
# (1) all 33 with ZERO driver rows ever — the 32 'local' rows in
# VERDICT r5's coverage table (all hash-green in pytest's oracle-parity
# replica for ≥1 round) plus the round-8 renderer query
# pipeline_render_reports; graph_pagerank_parts doubles as a
# changed-this-round entry (top-k rewritten to TakeOrderedAndProject);
# then (2) the 6 queries whose CODE changed this round after their last
# driver row: the two collapse-pre-step rewrites
# (multimodal_phash_near_dup, text_rolling_fingerprint), the
# overflow-guarded linalg pair (emb_gram_matrix, emb_pca_project), the
# persist-fixed join_bloom_prefilter, and the null-poisoning-fixed
# stream_running_ewma, plus the 2 queries ADDED this round
# (graph_bfs_depths — the exact-oracle iterative BFS —
# and docs_blocklist_filter), which outrank stale-green rows; then
# (3) 8 stale-evidence rows last checked in r03 — the full multimodal
# family, both CC variants, and both approximate ANN paths. Every name
# is asserted against the registry below (ADVICE r4).
# r07 ROTATION PLAN (leave for the next round): 16 round-8 queries
# landed after this window froze and carry ZERO driver rows —
# events_dau_wau_stickiness, orders_price_mad, fn_try_arithmetic,
# fn_higher_order_arrays, incr_join_merge_revenue,
# set_bag_semantics_nations, join_null_safe_keys,
# events_activity_streaks, lineitem_skyline_frontier,
# window_topk_with_ties, window_locf_fill, events_session_length_stats,
# orders_open_backlog_monthly, customer_cohort_ltv,
# lineitem_basket_lift, docs_ngram_novelty (all hash-green in the local
# parity gate + individually 100x-checked this round). They lead r07's
# window, followed by the displaced r03-stale rows (multimodal family,
# CC variants, emb_ivf/lsh_topk, q1/q10/q11).
_DRIVER_WINDOW_PRIORITY = [
    # (1) never driver-checked — 33
    "pipeline_render_reports",
    "graph_pagerank_parts",
    "graph_triangle_stats",
    "layout_partition_prune",
    "layout_schema_evolution",
    "layout_format_roundtrip",
    "layout_compact_small_files",
    "emb_kmeans_clusters",
    "emb_label_centroids",
    "emb_quantize_int8",
    "docs_tfidf_top_terms",
    "docs_token_entropy",
    "docs_weighted_sample",
    "docs_train_val_test_split",
    "docs_length_buckets",
    "docs_domain_mix",
    "stream_sliding_halfhour",
    "stream_session_builtin",
    "events_top_paths",
    "events_chi_square",
    "events_pmi_cooccurrence",
    "events_variant_extract",
    "events_corrupt_json_audit",
    "orders_daily_anomaly",
    "orders_mom_growth",
    "customer_rfm_segments",
    "lineitem_price_qty_corr",
    "agg_p90_outlier_orders",
    "window_range_30d_sum",
    "window_distribution_stats",
    "join_full_outer_reconcile",
    "fn_explode_outer_arrays",
    "fn_value_histogram",
    # (2) code changed or added this round — 10 (incl. the
    # value-domain agg_percentiles_by_flag rewrite)
    "multimodal_phash_near_dup",
    "text_rolling_fingerprint",
    "emb_gram_matrix",
    "emb_pca_project",
    "join_bloom_prefilter",
    "stream_running_ewma",
    "graph_bfs_depths",
    "docs_blocklist_filter",
    "agg_cms_user_counts",
    "agg_percentiles_by_flag",
    "docs_semantic_dedup",
    "customer_abc_classes",
    "lineitem_weighted_median",
    "customer_gini_revenue",
    "events_sessionized_funnel",
    "docs_semantic_dedup_srp",
    "stream_cms_user_counts",
    # (3) stale r03 evidence: fully displaced this round — every slot
    # went to a zero-row query per the stated policy; the multimodal
    # family and IVF keep local oracle-parity + pytest pins, and r07's
    # rotation should lead with them. (resize/frame_sample
    # yielded to the weighted-median/Gini additions — both carry pytest
    # byte-oracles and the family keeps two window rows; the CC variants
    # yielded their slots to docs_semantic_dedup, which drives the SAME
    # connected-components kernel under an EXACT recursive-CTE oracle)
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
