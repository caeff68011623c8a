"""TPC-H query shapes Q2/Q7-Q9/Q11-Q13/Q15/Q16/Q18-Q22, adapted to the
driver testdata's reduced schema (no partsupp, no l_commitdate /
l_receiptdate / l_shipmode, no c_phone / p_container).

Adaptation rules (documented per query):
- partsupp is absent → lineitem is the part↔supplier link; "supply
  cost"-style metrics use l_extendedprice or p_retailprice proxies.
- commit/receipt dates are absent → "late" means l_shipdate more than
  N days after o_orderdate.
- c_phone country codes are absent → n_name is the country code.

Scale notes (100 TB stance): dimension joins broadcast; fact-fact joins
shuffle on the join key only after pushed-down filters; "first/min per
group" uses a single window or partial-agg join rather than a
correlated per-row subquery; Q21's double EXISTS/NOT EXISTS is rewritten
as ONE per-order aggregation (two extra scans of lineitem in the naive
form become one shuffle). Floating aggregates are rounded identically
on both sides so summation order can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.queries import QueryDef, load


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# Q2 — min-cost supplier per part (correlated-min → window)
# --------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each size-15 part, the EUROPE supplier(s) that
    shipped it at the minimum extended price. The reference schema's
    partsupp is absent, so lineitem plays the part-supplier catalog.
    Correlated scalar-min subquery becomes min() OVER (PARTITION BY
    p_partkey) — one shuffle, no per-row re-scan."""
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    li = load(spark, sf_dir, "lineitem")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("_mn", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("_mn"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("l_extendedprice").alias("min_price"),
        )
        .distinct()
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


Q2_SQL = """
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name,
       l_extendedprice AS min_price
FROM (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name, l_extendedprice,
         min(l_extendedprice) OVER (PARTITION BY p_partkey) AS mn
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_size = 15 AND r_name = 'EUROPE'
)
WHERE l_extendedprice = mn
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# --------------------------------------------------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume NATION_1 <-> NATION_2 by ship year.
    nation joins twice under different roles (supplier vs customer) —
    both broadcast."""
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_name").alias("cust_nation")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# Q8 — national market share
# --------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_3 suppliers' share of ECONOMY-part revenue sold to
    ASIA customers, by order year. Conditional-sum ratio over a 6-way
    join; all dims broadcast."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31"))
    )
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_regionkey").alias("_cr_key")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    li = load(spark, sf_dir, "lineitem")
    vol = _rev()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("_cn_key"))
        .join(F.broadcast(region), F.col("_cr_key") == region.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# --------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: profit on widget parts by supplier nation and order year.
    partsupp.ps_supplycost is absent → cost proxy is
    0.1 * p_retailprice * l_quantity (documented adaptation).

    Float-stability (same pattern as q22): summing doubles in different
    orders flips round(sum, 2) at half-cent boundaries, so both engines
    sum EXACT CENTS — round(amount*100) per row is an integer-valued
    double, the sum stays < 2^53 (exact), and the final /100 is the
    same IEEE division on both sides."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem")
    amount = _rev() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    amount_cents = F.round(amount * 100, 0)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(amount_cents) / 100).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       sum(round((l_extendedprice * (1 - l_discount)
                  - 0.1 * p_retailprice * l_quantity) * 100, 0)) / 100 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------------------
# Q11 — important part values (agg + global-total scalar subquery)
# --------------------------------------------------------------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts whose NATION_5-supplied revenue exceeds 0.1% of the
    total. The scalar subquery (grand total) is a 1-row aggregate
    crossJoined back — broadcast, no driver round-trip."""
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    li = load(spark, sf_dir, "lineitem")
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("_value"))
    )
    total = per_part.agg((F.sum("_value") * 0.001).alias("_threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_value") > F.col("_threshold"))
        .select("l_partkey", F.round("_value", 2).alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = """
WITH pv AS (
  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey
)
SELECT l_partkey, round(value, 2) AS part_value
FROM pv
WHERE value > (SELECT sum(value) * 0.001 FROM pv)
ORDER BY part_value DESC, l_partkey
"""


# --------------------------------------------------------------------------
# Q12 — late lines by priority class
# --------------------------------------------------------------------------

def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional counts of high/low-priority orders among
    late 1997 shipments, grouped by l_linestatus (l_shipmode is absent;
    'late' = shipped >90 days after the order date)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join → double agg)
# --------------------------------------------------------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: histogram of per-customer order counts, keeping 0-order
    customers via the left outer join (the join predicate filters
    URGENT orders without dropping unmatched customers)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# Q15 — top supplier (view + scalar max)
# --------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) achieving max quarterly revenue. Revenue is
    rounded BEFORE the max comparison so cross-engine summation order
    can't split ties."""
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    revenue = li.groupBy("l_suppkey").agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q16 — supplier count by part attributes (anti-join + count distinct)
# --------------------------------------------------------------------------

def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16: distinct suppliers per (brand, type, size) bucket, excluding
    negative-balance suppliers (stand-in for the 'complaints' NOT IN).
    NOT IN on a non-nullable key = left_anti join."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q18 — large-volume customers (IN over HAVING subquery → semi join)
# --------------------------------------------------------------------------

def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: orders whose total quantity exceeds 300 (p99 is ~262 on
    this data), with their customers. The IN-subquery is a left_semi
    join against the HAVING aggregate; quantities are integral doubles
    so the sum threshold is exact on both engines."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("_q")).filter(F.col("_q") > 300)
    return (
        li.join(F.broadcast(big.select("l_orderkey")), "l_orderkey", "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 2) AS total_qty
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
"""


# --------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-attribute predicate)
# --------------------------------------------------------------------------

def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: three OR'd brand/size/quantity windows (p_container absent —
    p_size ranges play its role). Catalyst extracts the common
    l_partkey = p_partkey conjunct so the join stays an equi hash join
    with the disjunction as a post-join filter."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 15))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & q.between(10, 25))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & q.between(20, 35))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 35)
"""


# --------------------------------------------------------------------------
# Q20 — potential part promotion (nested IN → chained semi joins)
# --------------------------------------------------------------------------

def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20: suppliers who moved >200 units of 'small *' parts in 1997.
    Both nested INs become semi-join shapes; quantity sums are exact
    integers so the HAVING threshold is engine-stable. (partsupp's
    availqty is absent — shipped quantity is the stand-in.)"""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    heavy = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 200)
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(heavy.select("l_suppkey")), supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 200
)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS → one agg)
# --------------------------------------------------------------------------

def q21_suppliers_who_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21: late lineitems on finalized multi-supplier orders where the
    line's supplier is the ONLY late one ('late' = shipped >60 days
    after the order date; commit/receipt dates are absent).

    Spark-first rewrite: instead of the classic correlated
    EXISTS(l2) + NOT EXISTS(l3) — two extra scans of lineitem and a
    double self-join — compute per-order supplier stats ONCE
    (countDistinct suppliers, countDistinct late suppliers) and join
    them back: l1.late AND n_supp >= 2 AND n_late_supp = 1 is
    equivalent, and costs a single extra shuffle that AQE can
    broadcast."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    flagged = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    per_order = flagged.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("_n_late_supp"),
    )
    return (
        flagged.filter(F.col("late"))
        .join(per_order, F.col("l_orderkey") == F.col("_ok"))
        .filter((F.col("_n_supp") >= 2) & (F.col("_n_late_supp") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


Q21_SQL = """
WITH lf AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, count(*) AS numwait
FROM lf l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM lf l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lf l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (scalar avg subquery + anti join)
# --------------------------------------------------------------------------

def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: rich customers with no URGENT orders, bucketed by nation
    (c_phone country codes are absent — n_name is the country code;
    every customer has at least one order in this testdata, so the
    anti-join side is 'no 1-URGENT order' to keep the result
    non-vacuous).

    Float-stability note: the threshold avg(c_acctbal) would differ in
    the last ulp between engines (different summation order), which can
    flip boundary rows. Both sides therefore compare EXACT CENTS:
    round(sum(bal*100)) is an exact integer-valued double on both
    engines (total ≈ 1e9 << 2^53), so threshold and comparison are
    bit-identical."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    thr = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.round(F.sum(F.col("c_acctbal") * 100), 0) / F.count(F.lit(1))).alias("_avg_cents")
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.round(F.col("c_acctbal") * 100, 0) > F.col("_avg_cents"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = """
SELECT n_name AS cntrycode, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE round(c_acctbal * 100) > (
  SELECT round(sum(c_acctbal * 100)) / count(*)
  FROM customer WHERE c_acctbal > 0.0
)
AND NOT EXISTS (SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY n_name
ORDER BY cntrycode
"""


QUERIES = {
    "q2_min_cost_supplier": QueryDef(q2_min_cost_supplier, Q2_SQL),
    "q7_volume_shipping": QueryDef(q7_volume_shipping, Q7_SQL),
    "q8_market_share": QueryDef(q8_market_share, Q8_SQL),
    "q9_product_profit": QueryDef(q9_product_profit, Q9_SQL),
    "q11_important_parts": QueryDef(q11_important_parts, Q11_SQL),
    "q12_late_lines": QueryDef(q12_late_lines, Q12_SQL),
    "q13_customer_distribution": QueryDef(q13_customer_distribution, Q13_SQL),
    "q15_top_supplier": QueryDef(q15_top_supplier, Q15_SQL),
    "q16_parts_supplier_relationship": QueryDef(q16_parts_supplier_relationship, Q16_SQL),
    "q18_large_volume_customers": QueryDef(q18_large_volume_customers, Q18_SQL),
    "q19_discounted_revenue": QueryDef(q19_discounted_revenue, Q19_SQL),
    "q20_potential_promotion": QueryDef(q20_potential_promotion, Q20_SQL),
    "q21_suppliers_who_kept_waiting": QueryDef(q21_suppliers_who_kept_waiting, Q21_SQL),
    "q22_global_sales_opportunity": QueryDef(q22_global_sales_opportunity, Q22_SQL),
}
