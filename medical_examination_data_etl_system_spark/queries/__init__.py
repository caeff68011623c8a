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


_ROWCOUNTS: dict[tuple[str, str], int] = {}


def table_rowcount(spark: SparkSession, sf_dir: str, table: str) -> int | None:
    """Row count of a testdata table, memoized per (sf_dir, table) for
    the process lifetime — used as a cheap SIZING BOUND (e.g. the
    distributed-rank switch sizes per-customer frames off |customer|),
    where a one-job parquet count per query call would otherwise
    dominate small-scale benchmarks. Testdata dirs are immutable
    within a process, which is what makes the memo sound. Returns
    ``None`` (unmemoized) when the table doesn't exist in ``sf_dir`` —
    synthetic edge-case dirs carry only the tables a test needs, and
    a missing HINT must degrade to self-sizing, not an error."""
    from pyspark.errors import AnalysisException

    key = (sf_dir, table)
    if key not in _ROWCOUNTS:
        try:
            _ROWCOUNTS[key] = load(spark, sf_dir, table).count()
        except AnalysisException:
            return None
    return _ROWCOUNTS[key]


# The driver's correctness gate checks the FIRST 50 registry entries in
# order, so the registry is ordered by EVIDENCE NEED each round (VERDICT
# r3 #1). Structured bookkeeping (ADVICE r9 #3): each entry is a
# ``(name, why)`` tuple where ``why`` is the machine-checkable reason the
# row sits in the current window — "r04"/"r05" = driver evidence last
# refreshed that round (VERDICT r9 #1: the committed r10 plan, six rolled
# r04 rows then the 42 live r05-stale rows in name order), "r10-restr" =
# RESTRUCTURED this round, so its prior row is re-certified in-window
# (the rule r08 applied to ushape/CDC and r09 to the MinHash kernel).
# The window cut is WINDOW_SIZE; the import-time check below fails
# loudly if an insert shifts a restructured row past the cut, and
# tests/test_edge_cases.py pins the invariant.
# Positions 51+ are the COMMITTED R11 PLAN: the r06-stale rows in name
# order (47 of them; the cut at 50 leaves the remainder plus the r07
# backlog to r12). Every windowed name is hash-green in the local
# replica before commit (scripts/parity_subset.py).
# Retired rows-only originals (VERDICT r8 #2) are in RETIRED below —
# out of the driver/bench registry, still importable and pytest-smoked
# (tests/test_retired.py).
WINDOW_SIZE = 50

_WINDOW_PLAN: list[tuple[str, str]] = [
    # -- the six r04-stale rows rolled from the r09 window --
    ("text_quality_langid", "r04"),
    ("text_token_stats", "r04"),
    ("unpivot_status_priority", "r04"),
    ("window_order_gaps", "r04"),
    ("window_running_total", "r04"),
    ("window_topk_orders_per_customer", "r04"),
    # -- the 42 live r05-stale rows, name order --
    ("agg_grouping_sets", "r05"),
    ("cdc_merge_orders", "r05"),
    ("customer_spend_trend", "r05"),
    ("docs_bigram_coherence", "r05"),
    ("docs_decontaminate", "r05"),
    ("docs_dedup_cluster_sizes", "r05"),
    ("docs_dedup_keep_best", "r05"),
    ("docs_epoch_shuffle", "r05"),
    ("docs_heavy_hitter_terms", "r05"),
    ("docs_ngram_containment", "r05"),
    ("docs_repetition_ratio", "r05"),
    ("docs_stratified_sample", "r05"),
    ("docs_vocab_growth", "r05"),
    ("dq_check_orders", "r05"),
    ("emb_negative_sampling", "r05"),
    ("emb_standardize", "r05"),
    ("events_conversion_latency", "r05"),
    ("events_cumulative_distinct", "r05"),
    ("events_ewma_smoothing", "r05"),
    ("events_funnel_conversion", "r05"),
    ("events_gap_fill_hourly", "r05"),
    ("events_histogram_equidepth", "r05"),
    ("events_holt_forecast", "r05"),
    ("events_linear_attribution", "r05"),
    ("events_retention_cohorts", "r05"),
    ("events_transition_matrix", "r05"),
    ("fn_url_parse", "r05"),
    ("incr_agg_merge_orders", "r05"),
    ("join_interval_overlap", "r05"),
    ("layout_zorder_cluster", "r05"),
    ("lineitem_spearman_corr", "r05"),
    ("orders_seasonality_index", "r05"),
    ("pit_purchase_user_state", "r05"),
    ("scd2_user_event_history", "r05"),
    ("sql_interface_revenue", "r05"),
    ("sql_recursive_hierarchy", "r05"),
    ("stream_click_attribution", "r05"),
    ("stream_dedup_exactly_once", "r05"),
    # -- restructured in r10, prior rows re-certified in-window.
    # -- (emb_cosine_topk: corpus-side parallelism rebalance — the
    # -- full-battery 100× sweep caught the quadratic fold running on
    # -- ONE core when the corpus scan is a single parquet file;
    # -- values unchanged, plan changed.) --
    ("emb_cosine_topk", "r10-restr"),
    # -- (customer_rfm_segments / customer_abc_classes /
    # -- customer_gini_revenue: distributed global-rank rewrite +
    # -- gini/abc decimal overflow hardening — outputs bit-identical
    # -- at driver scale by the adaptive small-frame branch, but the
    # -- code changed, so they re-certify; three r05 rows rolled to
    # -- the r11 head to make room.) --
    ("customer_rfm_segments", "r10-restr"),
    ("customer_abc_classes", "r10-restr"),
    ("customer_gini_revenue", "r10-restr"),
    # -- (emb_near_dup_srp: the table-scaling change only alters the
    # -- executed plan when n > target·2^num_planes = 65,536, so its
    # -- sf0.01 run is bit-identical to the r09 row — re-certified
    # -- anyway under the strict reading of the rule since the
    # -- operator's code changed; the behavior change itself is
    # -- certified by the pytest recall pins +
    # -- scripts/srp_recall_report.py.) --
    ("graph_triangle_stats", "r10-restr"),
    ("emb_near_dup_srp", "r10-restr"),
    # ---- end of the r10 driver window (cut = WINDOW_SIZE) ----
    # -- committed r11 plan: the four r05 rows displaced by the
    # -- customer-family + cosine-topk restructures, then the
    # -- r06-stale rows in name order (43 — graph_triangle_stats and
    # -- the three customer queries moved in-window above; the cut at
    # -- 50 leaves the tail plus the r07 backlog to r12) --
    ("stream_sessionize_stateful", "r05"),
    ("stream_static_enrich", "r05"),
    ("stream_tumbling_hourly", "r05"),
    ("stream_upsert_latest_state", "r05"),
    ("agg_cms_user_counts", "r06"),
    ("agg_p90_outlier_orders", "r06"),
    ("agg_percentiles_by_flag", "r06"),
    ("docs_blocklist_filter", "r06"),
    ("docs_domain_mix", "r06"),
    ("docs_length_buckets", "r06"),
    ("docs_semantic_dedup", "r06"),
    ("docs_semantic_dedup_srp", "r06"),
    ("docs_tfidf_top_terms", "r06"),
    ("docs_token_entropy", "r06"),
    ("docs_train_val_test_split", "r06"),
    ("docs_weighted_sample", "r06"),
    ("emb_gram_matrix", "r06"),
    ("emb_label_centroids", "r06"),
    ("emb_quantize_int8", "r06"),
    ("events_chi_square", "r06"),
    ("events_corrupt_json_audit", "r06"),
    ("events_pmi_cooccurrence", "r06"),
    ("events_sessionized_funnel", "r06"),
    ("events_top_paths", "r06"),
    ("events_variant_extract", "r06"),
    ("fn_explode_outer_arrays", "r06"),
    ("fn_value_histogram", "r06"),
    ("graph_bfs_depths", "r06"),
    ("join_bloom_prefilter", "r06"),
    ("join_full_outer_reconcile", "r06"),
    ("layout_compact_small_files", "r06"),
    ("layout_format_roundtrip", "r06"),
    ("layout_partition_prune", "r06"),
    ("layout_schema_evolution", "r06"),
    ("lineitem_price_qty_corr", "r06"),
    ("lineitem_weighted_median", "r06"),
    ("multimodal_phash_near_dup", "r06"),
    ("orders_daily_anomaly", "r06"),
    ("orders_mom_growth", "r06"),
    ("pipeline_render_reports", "r06"),
    ("stream_cms_user_counts", "r06"),
    ("stream_running_ewma", "r06"),
    ("stream_session_builtin", "r06"),
    ("stream_sliding_halfhour", "r06"),
    ("text_rolling_fingerprint", "r06"),
    ("window_distribution_stats", "r06"),
    ("window_range_30d_sum", "r06"),
]

_DRIVER_WINDOW_PRIORITY = [name for name, _why in _WINDOW_PLAN]

# The re-certify-in-window rule only works if restructured rows are IN
# the checked window — a silent shift past the cut would void the rule.
_restr = [i for i, (_n, why) in enumerate(_WINDOW_PLAN) if why.endswith("-restr")]
if _restr and max(_restr) >= WINDOW_SIZE:
    raise ValueError(
        f"restructured rows past the {WINDOW_SIZE}-entry driver window: "
        f"{[_WINDOW_PLAN[i][0] for i in _restr if i >= WINDOW_SIZE]}"
    )


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
