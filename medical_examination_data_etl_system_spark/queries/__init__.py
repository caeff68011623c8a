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
# r3 #1). The r09 window (VERDICT r8 #1, executing the committed plan):
# positions 1-10 are the ten round-12 additions with zero driver rows
# (PSI drift, purged CV, IPW, A/B assignment, matryoshka recall,
# conformal forecast, CUPED, itemCF — RESTRUCTURED this round with the
# degree cap (VERDICT r8 #5), Mann-Whitney, off-policy eval; all
# hash-green in the local oracle-parity replica and 100x-checked);
# positions 11-14 re-certify the four queries RESTRUCTURED this round
# (posexplode banding in the shared MinHash kernel — bit-identical
# outputs, new executed plans, same treatment r08 gave ushape/CDC —
# plus the PassJoin pigeonhole rewrite of docs_fuzzy_levenshtein);
# 15 is q22 (the one r04 row outside the stale backlog file groups);
# 16-21 are the r04-stale rows whose IMPLEMENTATIONS changed since r04
# (emb_near_dup_srp mega-bucket shard r5, events_asof attribution,
# join_bucketed_colocated mtime-fingerprint reuse, the batch
# event-window trio); 22-50 are the remaining r04-stale rows in name
# order (the window cuts at 50 after set_union_nations, so six
# r04-stale rows roll to r10). Every name is hash-green in the local
# replica before commit (scripts/parity_subset.py).
# Positions 51+ are the COMMITTED R10 PLAN: the six rolled r04 rows,
# then the 43 live r05-stale rows (agg_grouping_sets ... stream_upsert
# _latest_state, minus the two retired sketches) in name order. The
# rest of the registry follows in module order (r06-r08 evidence, all
# locally green).
# Every name is asserted against the registry below (ADVICE r4).
# Retired rows-only originals (VERDICT r8 #2) are in RETIRED_QUERIES
# below — out of the driver/bench registry, still importable and
# pytest-smoked (tests/test_retired.py).
_DRIVER_WINDOW_PRIORITY = [
    # -- r09 window: the ten round-12 additions (zero driver rows) --
    "events_psi_drift",
    "orders_purged_cv_folds",
    "customer_ipw_spend",
    "customer_ab_assignment",
    "emb_matryoshka_recall",
    "orders_conformal_forecast",
    "customer_cuped_readout",
    "lineitem_itemcf_recommend",
    "orders_mann_whitney",
    "events_offpolicy_eval",
    # -- restructured in r09 (posexplode banding in the shared MinHash
    # -- kernel — bit-identical outputs, new executed plans, so their
    # -- r07 rows are re-certified like r08 did for ushape/CDC) --
    "docs_incremental_dedup",
    "docs_minhash_md5_exact",
    "docs_minhash_calibration",
    # -- also restructured in r09: the PassJoin pigeonhole rewrite
    # -- (landed after the window was first laid out; same
    # -- re-certify-in-window rule, so one name-order row rolls) --
    "docs_fuzzy_levenshtein",
    # -- q22 + the changed-since-r04 stale rows (VERDICT r8 #1) --
    "q22_global_sales_opportunity",
    "emb_near_dup_srp",
    "events_asof_attribution",
    "join_bucketed_colocated",
    "events_session_windows",
    "events_sliding_windows",
    "events_tumbling_hourly",
    # -- remaining r04-stale rows, name order (cuts at 50 after --
    # -- window_order_gaps; the last two roll to r10) --
    "agg_approx_distinct_parts",
    "agg_cube_status_priority",
    "agg_distinct_per_segment",
    "agg_rollup_region_nation",
    "dedup_first_lineitem_per_order",
    "docs_chunk_overlap",
    "docs_curation_pipeline",
    "docs_dedup_exact",
    "docs_domain_cap",
    "docs_hash_sample",
    "docs_ngram_jaccard",
    "docs_pack_sequences",
    "docs_pii_redact",
    "emb_cosine_topk",
    "emb_near_dup_cosine",
    "events_json_extract",
    "fn_array_ops",
    "fn_conditional_case",
    "fn_datetime_extract",
    "fn_map_ops",
    "fn_math_string",
    "join_anti_customers_without_orders",
    "join_inner_enrich",
    "join_range_ship_lag",
    "join_semi_customers_with_orders",
    "pivot_status_by_priority",
    "set_except_nations",
    "set_intersect_nations",
    "set_union_nations",
    # ---- end of the r09 driver window (50 = through set_union_nations;
    # ---- text_quality_langid rolled to r10 when the PassJoin row
    # ---- entered the window) ----
    # -- committed r10 plan: the six rolled r04 rows, then the 43
    # -- live r05-stale rows, name order --
    "text_quality_langid",
    "text_token_stats",
    "unpivot_status_priority",
    "window_order_gaps",
    "window_running_total",
    "window_topk_orders_per_customer",
    "agg_grouping_sets",
    "cdc_merge_orders",
    "customer_spend_trend",
    "docs_bigram_coherence",
    "docs_decontaminate",
    "docs_dedup_cluster_sizes",
    "docs_dedup_keep_best",
    "docs_epoch_shuffle",
    "docs_heavy_hitter_terms",
    "docs_ngram_containment",
    "docs_repetition_ratio",
    "docs_stratified_sample",
    "docs_vocab_growth",
    "dq_check_orders",
    "emb_negative_sampling",
    "emb_standardize",
    "events_conversion_latency",
    "events_cumulative_distinct",
    "events_ewma_smoothing",
    "events_funnel_conversion",
    "events_gap_fill_hourly",
    "events_histogram_equidepth",
    "events_holt_forecast",
    "events_linear_attribution",
    "events_retention_cohorts",
    "events_transition_matrix",
    "fn_url_parse",
    "incr_agg_merge_orders",
    "join_interval_overlap",
    "layout_zorder_cluster",
    "lineitem_spearman_corr",
    "orders_seasonality_index",
    "pit_purchase_user_state",
    "scd2_user_event_history",
    "sql_interface_revenue",
    "sql_recursive_hierarchy",
    "stream_click_attribution",
    "stream_dedup_exactly_once",
    "stream_sessionize_stateful",
    "stream_static_enrich",
    "stream_tumbling_hourly",
    "stream_upsert_latest_state",
]


# Retired rows-only originals (VERDICT r8 #2, executing the written
# retirement policy in SURVEY.md §2b): each is the production variant of
# a driver-green exact-oracle twin (X137-X148) that certifies the same
# distributed shape with an exact DuckDB hash, so re-benching the
# rows-only original every round buys no new evidence. They leave the
# driver/bench registry but stay fully implemented, importable through
# retired_queries(), and smoke-run per rotation-equivalent by
# tests/test_retired.py (rows>0 + stable schema at sf0.001) plus their
# pre-existing semantic pins (recall/property tests).
#   original -> certifying exact twin
#   docs_near_dup_minhash   -> docs_minhash_md5_exact   (X147)
#   docs_near_dup_simhash   -> docs_simhash_md5_exact   (X148)
#   emb_ivf_topk            -> emb_ivf_topk_exact       (X140)
#   emb_lsh_topk            -> emb_srp_topk_exact       (X141)
#   graph_pagerank_parts    -> graph_pagerank_int3      (X142)
#   emb_kmeans_clusters     -> emb_kmeans_iter2_exact   (X143/X137)
#   emb_pca_project         -> emb_power_iteration_exact (X144)
#   agg_kmv_overlap         -> agg_kmv_overlap_exact    (X145)
#   agg_hll_rollup          -> agg_hll_md5_rollup_exact (X146)
RETIRED = frozenset({
    "docs_near_dup_minhash",
    "docs_near_dup_simhash",
    "emb_ivf_topk",
    "emb_lsh_topk",
    "graph_pagerank_parts",
    "emb_kmeans_clusters",
    "emb_pca_project",
    "agg_kmv_overlap",
    "agg_hll_rollup",
})


def retired_queries() -> dict[str, QueryDef]:
    """The retired rows-only originals (see RETIRED above): implemented,
    tested, callable — just no longer part of the driver/bench surface."""
    from medical_examination_data_etl_system_spark.queries import analytics, datapipe, relational

    out: dict[str, QueryDef] = {}
    for mod in (datapipe, relational, analytics):
        for name in RETIRED & mod.QUERIES.keys():
            out[name] = mod.QUERIES[name]
    missing = RETIRED - out.keys()
    if missing:
        raise ValueError(f"RETIRED names not found in their modules: {missing}")
    return out


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
    absent = RETIRED - merged.keys()
    if absent:
        raise ValueError(f"RETIRED names not in any module registry: {absent}")
    for name in RETIRED:
        merged.pop(name)
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
