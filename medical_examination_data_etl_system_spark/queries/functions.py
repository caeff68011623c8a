"""Scalar-function battery: date/time, math, string, array (SURVEY.md
§2b X11). Computed integer columns are cast to bigint on both sides so
the oracle's schema comparison can't trip on width differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.queries import QueryDef, load


def fn_datetime_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar extraction + truncation: orders per (year, quarter)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.quarter("o_orderdate").cast("long").alias("o_quarter"),
            F.month("o_orderdate").cast("long").alias("o_month"),
            "o_totalprice",
        )
        .groupBy("o_year", "o_quarter")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_month").alias("n_months"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_year", "o_quarter")
    )


DATETIME_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT)    AS o_year,
       CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
       count(*)                             AS n_orders,
       count(DISTINCT CAST(month(o_orderdate) AS BIGINT)) AS n_months,
       round(sum(o_totalprice), 2)          AS total_price
FROM orders
GROUP BY 1, 2
ORDER BY o_year, o_quarter
"""


def fn_math_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + string scalar functions over part."""
    part = load(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.substring("p_type", 1, 6).alias("type_prefix"),
            F.length("p_name").cast("long").alias("name_len"),
            F.round(F.sqrt(F.col("p_size").cast("double")), 6).alias("size_sqrt"),
            F.round(F.log(F.col("p_retailprice") + 1.0), 6).alias("log_price"),
            F.round(F.abs(F.col("p_retailprice") - 1000.0), 2).alias("abs_diff"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        )
        .orderBy("p_partkey")
    )


MATH_STRING_SQL = """
SELECT p_partkey,
       upper(p_brand)                                  AS brand_upper,
       substr(p_type, 1, 6)                            AS type_prefix,
       CAST(length(p_name) AS BIGINT)                  AS name_len,
       round(sqrt(CAST(p_size AS DOUBLE)), 6)          AS size_sqrt,
       round(ln(p_retailprice + 1.0), 6)               AS log_price,
       round(abs(p_retailprice - 1000.0), 2)           AS abs_diff,
       concat_ws('|', p_brand, p_type)                 AS brand_type
FROM part
ORDER BY p_partkey
"""


def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + element ops from split tokens."""
    part = load(spark, sf_dir, "part")
    toks = F.split(F.col("p_type"), " ")
    return (
        part.select(
            "p_partkey",
            F.size(toks).cast("long").alias("n_tokens"),
            F.element_at(toks, 1).alias("first_token"),
            F.element_at(toks, -1).alias("last_token"),
            F.array_contains(toks, "PLATED").cast("boolean").alias("has_plated"),
            F.array_join(F.array_sort(toks), "_").alias("sorted_tokens"),
        )
        .orderBy("p_partkey")
    )


ARRAY_SQL = """
SELECT p_partkey,
       CAST(len(string_split(p_type, ' ')) AS BIGINT)       AS n_tokens,
       string_split(p_type, ' ')[1]                         AS first_token,
       string_split(p_type, ' ')[-1]                        AS last_token,
       list_contains(string_split(p_type, ' '), 'PLATED')   AS has_plated,
       array_to_string(list_sort(string_split(p_type, ' ')), '_') AS sorted_tokens
FROM part
ORDER BY p_partkey
"""


def fn_conditional_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN + coalesce + nullif battery over customer balances."""
    cust = load(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
    )
    return (
        cust.select("c_custkey", tier.alias("tier"), "c_acctbal", "c_mktsegment")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
        .orderBy("tier")
    )


CASE_SQL = """
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS tier,
       count(*) AS n_customers,
       round(avg(c_acctbal), 4) AS avg_bal,
       count(DISTINCT c_mktsegment) AS n_segments
FROM customer
GROUP BY 1
ORDER BY tier
"""


def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type construction + lookup: per-nation map of order-status →
    count, consumed via element_at (scalar outputs for the oracle)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    per_status = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    as_map = per_status.groupBy("c_nationkey").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("status_map")
    )
    return as_map.select(
        "c_nationkey",
        F.coalesce(F.element_at("status_map", "F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.element_at("status_map", "O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.element_at("status_map", "P"), F.lit(0)).alias("n_p"),
        F.array_join(F.map_keys("status_map"), ",").alias("statuses"),
    ).orderBy("c_nationkey")


MAP_SQL = """
SELECT c_nationkey,
       coalesce(count(*) FILTER (o_orderstatus = 'F'), 0) AS n_f,
       coalesce(count(*) FILTER (o_orderstatus = 'O'), 0) AS n_o,
       coalesce(count(*) FILTER (o_orderstatus = 'P'), 0) AS n_p,
       array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def fn_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values per type: 50-unit bins,
    clamped upper tail — binning as pure integer arithmetic (identical
    in any engine, unlike width_bucket variants), one hash aggregate."""
    ev = load(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 50).cast("int"), F.lit(9))
    return (
        ev.groupBy("event_type", bucket.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
        .orderBy("event_type", "bin")
    )


HISTOGRAM_SQL = """
SELECT event_type,
       CAST(least(floor(value / 50), 9) AS INTEGER) AS bin,
       count(*) AS n,
       round(min(value), 2) AS lo,
       round(max(value), 2) AS hi
FROM events
GROUP BY 1, 2
ORDER BY event_type, bin
"""


def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction with the built-in parse_url (map-only
    codegen) over URLs assembled from document metadata — the
    normalize-before-dedup step of any web-crawl pipeline."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/d"), F.col("doc_id"),
        F.lit("?ref="), F.col("source"), F.lit("&page="), F.col("doc_id") % 7,
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).cast("int").alias("page"),
    ).orderBy("doc_id")


# DuckDB has no parse_url; the oracle re-derives the components from the
# same metadata the URL was assembled from — equivalent by construction.
URL_PARSE_SQL = """
SELECT doc_id,
       source || '.example.com' AS host,
       '/' || lang || '/d' || doc_id AS path,
       source AS ref,
       CAST(doc_id % 7 AS INTEGER) AS page
FROM documents
ORDER BY doc_id
"""


def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI error-tolerant scalar surface: ``try_divide`` /
    ``try_add`` / ``try_to_number`` return NULL where strict ANSI would
    raise (divide-by-zero, overflow, malformed numeric) — the
    ingest-hardening functions a dirty-data pipeline leans on instead
    of blanket ANSI-off. Derived zero divisors and malformed numeric
    strings exercise each NULL path deterministically; map-only."""
    part = load(spark, sf_dir, "part")
    zeroable = (F.col("p_partkey") % 7).cast("long")  # 0 every 7th row
    numlike = F.when(
        F.col("p_partkey") % 3 == 0, F.concat(F.lit("x"), F.col("p_partkey").cast("string"))
    ).otherwise(F.col("p_partkey").cast("string"))
    return (
        part.select(
            "p_partkey",
            F.try_divide(F.col("p_retailprice"), zeroable).alias("price_per_bucket"),
            F.try_add(
                F.lit(2**62),
                F.when(F.col("p_partkey") % 5 == 0, F.lit(2**62)).otherwise(
                    F.col("p_partkey")
                ),
            ).alias("overflowing_add"),
            F.try_to_number(numlike, F.lit("999999999")).cast("long").alias("parsed_key"),
        )
        .orderBy("p_partkey")
    )


TRY_ARITH_SQL = """
SELECT p_partkey,
       CASE WHEN p_partkey % 7 = 0 THEN NULL
            ELSE p_retailprice / (p_partkey % 7) END AS price_per_bucket,
       CASE WHEN p_partkey % 5 = 0 THEN NULL
            ELSE 4611686018427387904 + p_partkey END AS overflowing_add,
       CASE WHEN p_partkey % 3 = 0 THEN NULL ELSE p_partkey END AS parsed_key
FROM part
ORDER BY p_partkey
"""


def fn_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lambda higher-order-function battery — transform / filter /
    aggregate (fold) / exists / zip_with over a per-row derived array,
    all folded to scalars for the oracle. Integer arithmetic
    throughout, so every fold is engine-exact. These are the array
    combinators the operator kernels lean on (int8 quantization,
    EWMA folds); this row pins their SEMANTICS as a user-facing
    surface."""
    part = load(spark, sf_dir, "part")
    k = (F.col("p_size") % 8) + 1
    arr = F.sequence(F.lit(1), k.cast("int"))
    sq_sum = F.aggregate(
        F.transform(arr, lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
    )
    evens = F.array_join(F.filter(arr, lambda x: x % 2 == 0), ",")
    any7 = F.exists(arr, lambda x: F.col("p_size") % 7 == x % 7)
    zipped = F.array_join(
        F.zip_with(arr, F.reverse(arr), lambda x, y: x + y).cast("array<string>"), ","
    )
    return (
        part.select(
            "p_partkey",
            sq_sum.alias("sum_squares"),
            evens.alias("even_elems"),
            any7.alias("has_mod7_match"),
            zipped.alias("palindrome_sums"),
        )
        .orderBy("p_partkey")
    )


HOF_SQL = """
WITH t AS (
  SELECT p_partkey, p_size,
         range(1, (p_size % 8) + 2) AS arr,
         (p_size % 8) + 1 AS k
  FROM part
)
SELECT p_partkey,
       CAST(list_sum(list_transform(arr, x -> x * x)) AS BIGINT) AS sum_squares,
       coalesce(array_to_string(list_filter(arr, x -> x % 2 = 0), ','), '') AS even_elems,
       len(list_filter(arr, x -> p_size % 7 = x % 7)) > 0 AS has_mod7_match,
       array_to_string(list_transform(arr, x -> CAST(k + 1 AS VARCHAR)), ',') AS palindrome_sums
FROM t
ORDER BY p_partkey
"""


QUERIES = {
    "fn_try_arithmetic": QueryDef(fn_try_arithmetic, TRY_ARITH_SQL),
    "fn_higher_order_arrays": QueryDef(fn_higher_order_arrays, HOF_SQL),
    "fn_value_histogram": QueryDef(fn_value_histogram, HISTOGRAM_SQL),
    "fn_datetime_extract": QueryDef(fn_datetime_extract, DATETIME_SQL),
    "fn_math_string": QueryDef(fn_math_string, MATH_STRING_SQL),
    "fn_array_ops": QueryDef(fn_array_ops, ARRAY_SQL),
    "fn_conditional_case": QueryDef(fn_conditional_case, CASE_SQL),
    "fn_map_ops": QueryDef(fn_map_ops, MAP_SQL),
    "fn_url_parse": QueryDef(fn_url_parse, URL_PARSE_SQL),
}
