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
# r3 #1). The r08 window (VERDICT r7 #1, exactly as ordered there):
# positions 1-17 are the seventeen round-11-late queries with zero
# driver rows (hash-green in pytest's oracle-parity replica since they
# were added); 18-19 re-certify the two queries RESTRUCTURED this round
# after their r07 rows (events_ushape_attribution's channel collapse,
# docs_cdc_chunk_dedup's distinct-text collapse — both exact rewrites,
# oracles unchanged, but the executed plan is new so the driver row
# should be too); 20-46 are the full 27-query r03-stale set (multimodal
# family, both CC variants, both approximate-ANN paths, q1-q8/q10/q11/
# q13-q19, both skew demos — several changed implementation since r03:
# adaptive collapse r5, CC loop hygiene r5/r6); 47-50 start burning the
# r04-stale backlog (q9/q12/q20/q21). Every name is hash-green in the
# local oracle-parity replica before commit (scripts/parity_subset.py).
# Positions 51+ are the COMMITTED R09 PLAN (VERDICT r7 #5): the ten
# round-12 additions first (zero driver rows — PSI drift, purged CV,
# IPW, A/B assignment, matryoshka recall, conformal forecast, CUPED,
# itemCF, Mann-Whitney, off-policy eval; all hash-green in the local
# replica and 100×-checked when added), then q22 + the remaining 44
# r04-stale rows (the window cuts at 50, so the last five r04-stale
# rows here roll to r10). The rest of the registry follows in module
# order (r05-r07 evidence, all locally green); the oldest r05-stale
# rows (agg_grouping_sets …) continue the r10 rotation.
# Every name is asserted against the registry below (ADVICE r4).
_DRIVER_WINDOW_PRIORITY = [
    # -- r08 window: 17 zero-driver-row round-11-late queries --
    "docs_gopher_quality_rules",
    "docs_feature_hashing",
    "customer_k_anonymity",
    "orders_revenue_acf",
    "customer_survival_km",
    "events_bot_detection",
    "emb_label_noise_audit",
    "docs_dataset_card",
    "graph_link_prediction",
    "emb_mmr_diversify",
    "part_trigram_search",
    "orders_benford_audit",
    "orders_bootstrap_ci",
    "orders_churn_training_set",
    "events_cusum_changepoint",
    "emb_drift_monitor",
    "lineitem_winsorize_prices",
    # -- restructured in r08 (exact rewrites; re-certify the new plans) --
    "events_ushape_attribution",
    "docs_cdc_chunk_dedup",
    # -- the 27 r03-stale rows (VERDICT r7 #1) --
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_doc_embedding_join",
    "multimodal_binary_features",
    "docs_near_dup_components",
    "docs_near_dup_components_alt",
    "emb_ivf_topk",
    "emb_lsh_topk",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q11_important_parts",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_relationship",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "skew_salted_count_distinct",
    "skew_salted_join",
    # -- start of the r04-stale backlog (window cuts at 50 after q21) --
    "q9_product_profit",
    "q12_late_lines",
    "q20_potential_promotion",
    "q21_suppliers_who_kept_waiting",
    # ---- end of the r08 driver window (50) ----
    # -- committed r09 plan: round-12 additions (5) + q22 + r04-stale (44) --
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
    "q22_global_sales_opportunity",
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
    "docs_near_dup_minhash",
    "docs_near_dup_simhash",
    "docs_ngram_jaccard",
    "docs_pack_sequences",
    "docs_pii_redact",
    "emb_cosine_topk",
    "emb_near_dup_cosine",
    "emb_near_dup_srp",
    "events_asof_attribution",
    "events_json_extract",
    "events_session_windows",
    "events_sliding_windows",
    "events_tumbling_hourly",
    "fn_array_ops",
    "fn_conditional_case",
    "fn_datetime_extract",
    "fn_map_ops",
    "fn_math_string",
    "join_anti_customers_without_orders",
    "join_bucketed_colocated",
    "join_inner_enrich",
    "join_range_ship_lag",
    "join_semi_customers_with_orders",
    "pivot_status_by_priority",
    "set_except_nations",
    "set_intersect_nations",
    "set_union_nations",
    "text_quality_langid",
    "text_token_stats",
    "unpivot_status_priority",
    "window_order_gaps",
    "window_running_total",
    "window_topk_orders_per_customer",
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
