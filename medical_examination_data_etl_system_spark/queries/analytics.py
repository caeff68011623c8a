"""Product-analytics battery over the events table (SURVEY.md §2b
X43-X45): ordered funnel, cohort retention, gap-filled resampling.

All three carry full DuckDB oracles — the funnel's window cascade and
the resampler's generated spine are expressible in ANSI SQL, so the
driver value-hashes them end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators.timeseries import (
    ewma,
    holt,
    funnel_stages,
    resample_gap_fill,
    retention_cohorts,
)
from medical_examination_data_etl_system_spark.queries import QueryDef, load, table_rowcount


# Value-domain adaptive-prefix cutoff (ADVICE r11 #2): the callers below
# pass the FACT table's metadata-only rowcount as ``n_rows_hint`` — an
# upper bound on their distinct-VALUE frame that is structurally loose
# on bounded domains (a 60M-row fact over ~49k distinct cents). The
# operator's 1M default was sized for per-customer frames; the r12
# calibration on the continuous-value corpus (counts-frame + running
# sum, the exact shape these callers run) measured the crossover an
# order of magnitude higher:
#   5.3M-row frame: plain 7.8 s vs distributed 9.9 s  (plain wins)
#   19.4M:          plain 20.4 s vs distributed 11.0 s (distributed)
#   58.2M:          plain 60.1 s vs distributed 31.0 s (distributed)
# so the switch point sits at the measured ~10M crossover. The hint
# still OVERESTIMATES bounded domains past it (a >10M fact with a 49k
# value domain pays the distributed machinery's fixed ~2 s of extra
# jobs on a tiny frame — the residual price of a metadata-only hint,
# bounded and documented); on continuous domains the distributed
# branch engages exactly where the single sort task starts losing.
# (p90's caller keeps its own measured 20M: its window is partitioned
# 5-way, so per-task frames are a fifth of these.)
VALUE_DOMAIN_SMALL_FRAME_ROWS = 10_000_000


def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view → click → purchase funnel (strictly-after semantics)."""
    ev = load(spark, sf_dir, "events")
    return funnel_stages(ev, ["view", "click", "purchase"])


# Mirrors the operator's window cascade: running min of each stage's
# valid timestamps over (user, ts, event_id), strict < against the
# previous stage's running first. Strict < makes the result invariant
# to tie order within a timestamp; event_id still pins the window
# order so both engines fold identically.
FUNNEL_SQL = """
WITH s0 AS (
  SELECT user_id, ts, event_type, event_id,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS f0
  FROM events
), s1 AS (
  SELECT *, CASE WHEN event_type = 'click' AND f0 < ts THEN ts END AS v1
  FROM s0
), s1m AS (
  SELECT *, min(v1) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS f1
  FROM s1
), s2 AS (
  SELECT *, CASE WHEN event_type = 'purchase' AND f1 < ts THEN ts END AS v2
  FROM s1m
), per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS s0v,
         min(v1) AS s1v,
         min(v2) AS s2v
  FROM s2
  GROUP BY user_id
), counts AS (
  SELECT count(s0v) AS n0, count(s1v) AS n1, count(s2v) AS n2 FROM per_user
)
SELECT * FROM (
  SELECT 0 AS stage_idx, 'view' AS stage, n0 AS n_users,
         round(CAST(n0 AS DOUBLE) / n0, 4) AS pct_of_first FROM counts
  UNION ALL
  SELECT 1, 'click', n1, round(CAST(n1 AS DOUBLE) / n0, 4) FROM counts
  UNION ALL
  SELECT 2, 'purchase', n2, round(CAST(n2 AS DOUBLE) / n0, 4) FROM counts
)
ORDER BY stage_idx
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention triangle, first week only."""
    ev = load(spark, sf_dir, "events")
    return retention_cohorts(ev, max_offset_days=7)


RETENTION_SQL = """
WITH first_day AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
)
SELECT f.cohort_day,
       CAST(datediff('day', f.cohort_day, a.active_day) AS INTEGER) AS day_offset,
       count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN first_day f USING (user_id)
WHERE datediff('day', f.cohort_day, a.active_day) <= 7
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type resample over a generated dense spine with
    forward-filled sums."""
    ev = load(spark, sf_dir, "events")
    return resample_gap_fill(ev, key_col="event_type", step="1 hour")


GAP_FILL_SQL = """
WITH base AS (
  SELECT event_type AS k, date_trunc('hour', ts) AS bucket_start, value AS v
  FROM events
), actual AS (
  SELECT k, bucket_start, count(*) AS n_events,
         round(sum(v), 2) AS sum_value
  FROM base GROUP BY 1, 2
), bounds AS (
  SELECT min(bucket_start) AS lo, max(bucket_start) AS hi FROM base
), spine AS (
  SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_start
  FROM (SELECT DISTINCT k FROM base) CROSS JOIN bounds
)
SELECT s.k AS event_type, s.bucket_start,
       coalesce(a.n_events, 0) AS n_events,
       a.sum_value,
       last_value(a.sum_value IGNORE NULLS)
         OVER (PARTITION BY s.k ORDER BY s.bucket_start
               ROWS UNBOUNDED PRECEDING) AS filled_sum,
       a.sum_value IS NULL AS was_gap
FROM spine s LEFT JOIN actual a USING (k, bucket_start)
ORDER BY event_type, bucket_start
"""


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user next-event (Markov) transition counts + row-normalized
    probabilities. One Exchange on user_id (the lead window), then a
    key-local count — the clickstream path-analysis shape.

    The lead is over (ts, event_id) so same-timestamp successors are
    engine-deterministic; terminal events (lead = null) are dropped,
    and probabilities are exact ratios of BIGINT counts rounded at 4.
    """
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wtot = Window.partitionBy("from_type")
    return (
        trans.withColumn("p", F.round(F.col("n") / F.sum("n").over(wtot), 4))
        .orderBy("from_type", "to_type")
    )


TRANSITION_SQL = """
WITH trans AS (
  SELECT user_id, event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM trans WHERE to_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 4) AS p
FROM counts
ORDER BY from_type, to_type
"""


def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the co-purchase part graph (parts
    sharing an order are linked, both directions): top-20 parts.
    Edge build is one self-join on the order key — pair count per
    order is quadratic in order SIZE, which TPC-H bounds at 7 lines,
    so edges stay linear in lineitem. Iterative float folding →
    rows-only at the driver; values pinned vs NumPy in tests."""
    from pyspark.sql import Window

    from medical_examination_data_etl_system_spark.operators.clustering import pagerank

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    ranks = pagerank(edges, n_iter=10)
    # Top-20 via orderBy().limit() → TakeOrderedAndProject (per-partition
    # heap + driver merge), NOT an unpartitioned row_number window that
    # would funnel every node's rank through one task. The row_number
    # that derives ``rnk`` runs AFTER the limit, over 20 rows.
    top = ranks.orderBy(F.desc("rank"), F.asc("node")).limit(20)
    w = Window.orderBy(F.desc("rank"), F.asc("node"))
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select(F.col("node").alias("l_partkey"), F.round("rank", 6).alias("rank"), "rnk")
        .orderBy("rnk")
    )


def graph_pagerank_int3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PageRank power-iteration loop under a FULL exact oracle —
    the chip-the-rows-only move (docs_semantic_dedup → CC,
    emb_kmeans_assign_round1 → Lloyd assignment) applied to the last
    big iterative kernel that had none. Rank mass lives as a scaled
    int64 (BASE = 10^12); every per-round operation — contribution
    ``rank div out_degree``, damping ``(85·x) div 100``, teleport
    ``(15·BASE) div (100·n)``, dangling redistribute — is integer
    multiply/divide, so three unrolled rounds are bit-replayable in
    DuckDB (Spark ``div`` and DuckDB ``//`` both truncate toward
    zero). The graph is the DIRECTED co-purchase graph (low part key →
    high part key within an order), so sink nodes EXIST and the
    dangling-mass path is exercised, unlike the symmetric float
    variant where it is vacuous.

    Same loop hygiene as the production float pagerank
    (operators/clustering.pagerank): edge set eager-checkpointed once,
    per-round dangling mass a 1-row broadcast aggregate (zero in-loop
    driver actions), each round's rank frame a lazy localCheckpoint.
    At 100 TB the per-round cost is one |edges| equi-join shuffle —
    identical physical shape to the float path this row certifies."""
    BASE = 1_000_000_000_000
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    # Degrees ride WITH the edges (clustering.pagerank's discipline):
    # the out-degree is attached by one window over the single edge-
    # build pass, so the expensive self-join materializes exactly once
    # and each round is ONE ranks⋈edges equi-join — no per-round
    # degree groupBy or second copy of the edge set.
    # repartition BEFORE distinct (r14): hashpartitioning(src)
    # satisfies both the dedup's (src, dst) clustering and the degree
    # window, so the edge build pays ONE exchange instead of two
    # (same-process A/B on this build: 2.4 → 1.7 s at sf0.1).
    e_deg = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .repartition("src")
        .distinct()
        .withColumn("deg", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e_deg.select(F.col("src").alias("node"))
        .union(e_deg.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n1 = nodes.agg(F.count(F.lit(1)).alias("_n"))
    dangling_nodes = (
        nodes.join(e_deg.select(F.col("src").alias("node")), "node", "left_anti")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", F.expr(f"CAST({BASE} AS BIGINT) div _n").alias("r")
    )
    for _ in range(3):
        dang = ranks.join(dangling_nodes, "node", "left_semi").agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("_d")
        )
        contribs = (
            e_deg.join(ranks.select(F.col("node").alias("src"), "r"), "src")
            .select(F.col("dst").alias("node"), F.expr("r div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .crossJoin(F.broadcast(n1))
            .select(
                "node",
                (
                    F.expr(f"(15 * CAST({BASE} AS BIGINT)) div (100 * _n)")
                    + F.expr("(85 * coalesce(inflow, CAST(0 AS BIGINT))) div 100")
                    + F.expr("(85 * (_d div _n)) div 100")
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    top = ranks.orderBy(F.desc("r"), F.asc("node")).limit(20)
    w = Window.orderBy(F.desc("r"), F.asc("node"))
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select(F.col("node").alias("l_partkey"), F.col("r").alias("rank_scaled"), "rnk")
        .orderBy("rnk")
    )


def _pr_int3_round(prev: str, idx: int) -> str:
    """One unrolled integer-PageRank round as DuckDB CTE text."""
    return f"""d{idx} AS (
  SELECT CAST(COALESCE(sum(r), 0) AS BIGINT) AS d FROM {prev}
  WHERE node NOT IN (SELECT src FROM deg)
), i{idx} AS (
  SELECT e.dst AS node, CAST(sum(p.r // dg.deg) AS BIGINT) AS inflow
  FROM edges e JOIN {prev} p ON p.node = e.src JOIN deg dg ON dg.src = e.src
  GROUP BY e.dst
), r{idx + 1} AS (
  SELECT nd.node, CAST(
         (15 * 1000000000000) // (100 * (SELECT n FROM n))
       + (85 * COALESCE(i{idx}.inflow, 0)) // 100
       + (85 * ((SELECT d FROM d{idx}) // (SELECT n FROM n))) // 100
       AS BIGINT) AS r
  FROM nodes nd LEFT JOIN i{idx} ON i{idx}.node = nd.node
)"""


PAGERANK_INT3_SQL = (
    """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
n AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT node, 1000000000000 // (SELECT n FROM n) AS r FROM nodes),
"""
    + ",\n".join(_pr_int3_round(f"r{i}", i) for i in range(3))
    + """,
ranked AS (
  SELECT node, r, row_number() OVER (ORDER BY r DESC, node) AS rnk FROM r3
)
SELECT node AS l_partkey, r AS rank_scaled, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 20 ORDER BY rnk
"""
)


def events_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types co-occurring
    within a user-day — the association-mining primitive (which
    behaviors travel together). All probabilities are exact ratios of
    BIGINT co-occurrence counts; ln enters once at the end, rounded.

    Plan: distinct (user-day, type) contexts → per-type context counts
    (vocabulary-sized, broadcast back) → same-context self-join for
    pair counts. The self-join shuffles on the context key — pair
    volume is Σ_ctx |types-in-ctx|², bounded by the type-alphabet
    squared per context, NOT by row count — the same structural bound
    as the n-gram inverted index."""
    ev = load(spark, sf_dir, "events")
    ctx = ev.select(
        F.concat_ws("|", F.col("user_id"), F.to_date("ts")).alias("ctx"),
        F.col("event_type").alias("t"),
    ).distinct()
    # context total as a broadcast 1-row aggregate — no driver action
    n = ctx.agg(F.countDistinct("ctx").alias("n_ctx"))
    singles = ctx.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    a, b = ctx.alias("a"), ctx.alias("b")
    pairs = (
        a.join(b, (F.col("a.ctx") == F.col("b.ctx")) & (F.col("a.t") < F.col("b.t")))
        .groupBy(F.col("a.t").alias("t1"), F.col("b.t").alias("t2"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    sa = singles.select(F.col("t").alias("t1"), F.col("n_t").alias("n1"))
    sb = singles.select(F.col("t").alias("t2"), F.col("n_t").alias("n2"))
    pmi = F.round(
        F.log(
            (F.col("n_pair").cast("double") * F.col("n_ctx").cast("double"))
            / (F.col("n1").cast("double") * F.col("n2").cast("double"))
        ),
        4,
    )
    return (
        pairs.join(F.broadcast(sa), "t1")
        .join(F.broadcast(sb), "t2")
        .crossJoin(F.broadcast(n))
        .select("t1", "t2", "n_pair", "n1", "n2", pmi.alias("pmi"))
        .orderBy("t1", "t2")
    )


PMI_SQL = """
WITH ctx AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) || '|' || CAST(CAST(ts AS DATE) AS VARCHAR) AS ctx,
         event_type AS t
  FROM events
), n AS (
  SELECT count(DISTINCT ctx) AS n_ctx FROM ctx
), singles AS (
  SELECT t, count(*) AS n_t FROM ctx GROUP BY t
), pairs AS (
  SELECT a.t AS t1, b.t AS t2, count(*) AS n_pair
  FROM ctx a JOIN ctx b ON a.ctx = b.ctx AND a.t < b.t
  GROUP BY 1, 2
)
SELECT t1, t2, n_pair, s1.n_t AS n1, s2.n_t AS n2,
       round(ln(CAST(n_pair AS DOUBLE) * n_ctx / (CAST(s1.n_t AS DOUBLE) * CAST(s2.n_t AS DOUBLE))), 4) AS pmi
FROM pairs
JOIN singles s1 ON pairs.t1 = s1.t
JOIN singles s2 ON pairs.t2 = s2.t
CROSS JOIN n
ORDER BY t1, t2
"""


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency / frequency / monetary,
    quartiled and rolled up to segment sizes. Every quartile ordering
    carries the customer key as the final tie-break, so assignment —
    normally order-dependent under ties — is engine-deterministic and
    the whole segmentation value-hashes.

    Each quartile is ``with_global_ntile`` — native ``F.ntile`` over
    the plain window while the per-customer frame is small (the exact
    pre-round-15 plan; the sizing bound is the memoized |customer|
    metadata count, distinct fact keys never exceeding the dimension),
    switching to a range-partitioned parallel rank +
    ``ntile_from_rank`` reconstruction past 10⁶ rows (bit-identical,
    pinned in tests) — the frame is dim-sized (1.39M adversarial /
    10⁹ cluster), past what three single-task ntile sorts should
    carry."""
    from medical_examination_data_etl_system_spark.operators.ranking import with_global_ntile

    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("monetary_cents"),
    )
    hint = table_rowcount(spark, sf_dir, "customer")
    scored = per_cust
    for out_col, order in (
        ("r_quartile", [F.desc("last_order"), F.asc("o_custkey")]),
        ("f_quartile", [F.desc("frequency"), F.asc("o_custkey")]),
        ("m_quartile", [F.desc("monetary_cents"), F.asc("o_custkey")]),
    ):
        scored = with_global_ntile(scored, order, 4, out_col, n_rows_hint=hint)
    scored = scored.select(
        "o_custkey", "r_quartile", "f_quartile", "m_quartile", "monetary_cents"
    )
    return (
        scored.groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_cents").alias("segment_cents"),
        )
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey, max(o_orderdate) AS last_order, count(*) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT o_custkey, monetary_cents,
         CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS INTEGER) AS r_quartile,
         CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS INTEGER) AS f_quartile,
         CAST(ntile(4) OVER (ORDER BY monetary_cents DESC, o_custkey) AS INTEGER) AS m_quartile
  FROM per_cust
)
SELECT r_quartile, f_quartile, m_quartile,
       count(*) AS n_customers,
       CAST(sum(monetary_cents) AS BIGINT) AS segment_cents
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the
    co-purchase part graph — one summary row
    ``(n_nodes, n_edges, n_triangles, clustering)``.

    The enumeration is DEGREE-ORIENTED (each edge directed from its
    lower-(degree, id) endpoint), so the triangle {a<b<c} orients
    acyclically (a→b, a→c, b→c) and is counted exactly once — at its
    lowest edge — as |N⁺(a) ∩ N⁺(b)|, with out-degrees bounded by
    ~√|E| under any skew (the arboricity argument that makes triangle
    counting feasible on power-law graphs where an id-oriented join
    explodes on hub nodes).

    r10 restructure (VERDICT r9 #4): edge-iterator ADJACENCY
    INTERSECTION instead of a wedge self-join. The old plan
    materialized Σ out_deg² wedge ROWS through an exchange and probed
    them against the closing-edge hash table — at the adversarial
    100× graph that shuffle was the 916 s bottleneck. Now out-
    neighborhoods are packed ONCE per node (collect_list ≤ ~√|E|
    elements) and each oriented edge intersects its two endpoint
    lists JVM-side (``array_intersect`` inside whole-stage codegen):
    the same element volume moves as packed arrays in O(|E|) rows,
    wedges never exist as rows, and the count aggregates with a
    map-side partial sum. dst-list first: hubs sit on the dst side
    of most edges (orientation points low→high degree) but their
    OUT-lists are short, so the arrays that ride the second shuffle
    (by src) stay small exactly where the graph is skewed. Same
    exact count, bit-identical summary row.

    The oracle counts the same triangles with the naive u<v 3-way
    join (identical result, fine at sf0.01)."""
    from medical_examination_data_etl_system_spark.operators.cache import persist_tracked

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    # persisted: feeds the mirrored adjacency (both directions) and
    # n_edges — without the barrier each consumer recomputes the
    # distinct self-join.
    und = persist_tracked(
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    # r13 restructure of the orientation stage: degrees ride WITH the
    # mirrored adjacency via one window over c (the pagerank-int3
    # degree discipline), and the orientation falls out of a per-edge
    # min_by — each undirected edge appears exactly twice in the
    # mirrored frame (as (u,v,deg u) and (v,u,deg v)), so the row with
    # the lexicographically smaller (degree, id) IS the oriented edge.
    # The former shape (degree groupBy + TWO |E| joins back) planned
    # three exchanges and four sorts; this is two exchanges (by c, by
    # edge key) and no join. Measured 6.8 → 5.0 s at sf0.1, summary row
    # bit-identical. Tie rule unchanged: equal degrees fall back to the
    # smaller id (c differs within a pair, so min_by is deterministic).
    adjdc = persist_tracked(
        und.select(F.col("u").alias("c"), F.col("v").alias("n"))
        .unionByName(und.select(F.col("v").alias("c"), F.col("u").alias("n")))
        .withColumn("dc", F.count(F.lit(1)).over(Window.partitionBy("c")))
    )
    # No exchange: adjdc is already clustered by c from the window.
    deg = adjdc.groupBy("c").agg(F.first("dc").alias("d"))
    # Persisted CLUSTERED BY src (r14): the oriented frame has three
    # src-keyed consumers (the packed-list groupBy, the src endpoint
    # join) plus the dst join; the min_by groupBy leaves it
    # hash(_lo, _hi)-partitioned, which none of them can use. Storing
    # the cache src-clustered was measured as the active ingredient in
    # a 4-arm same-process A/B (repartition × join order, 2 passes):
    # rep arms 4.48-4.82 s vs no-rep 5.27-5.89 s; join order alone was
    # noise. NOTE the consumers still PLAN their exchanges — a lazy
    # cache under AQE exposes UnknownPartitioning at plan time — so
    # the win is runtime-side (clustered cache partitions feed the
    # src-keyed shuffles); an EAGER materialized layout
    # (repartition+sort+count, the bfs trick) did remove the plan-side
    # exchanges but measured SLOWER here (4.9-5.0 s): one extra
    # materialization job over three consumers doesn't amortize at
    # this size. Inner joins commute; src-first kept for locality.
    # Summary row bit-identical; oracle hash green at sf0.01 + sf0.1.
    oriented = persist_tracked(
        adjdc.groupBy(F.least("c", "n").alias("_lo"), F.greatest("c", "n").alias("_hi"))
        .agg(
            F.min_by(
                F.struct(F.col("c").alias("src"), F.col("n").alias("dst")),
                F.struct(F.col("dc"), F.col("c")),
            ).alias("_sd")
        )
        .select(F.col("_sd.src").alias("src"), F.col("_sd.dst").alias("dst"))
        .repartition("src")
    )
    # persisted: the packed lists feed BOTH endpoint joins below —
    # without the barrier the collect_list aggregation runs twice.
    adj = persist_tracked(
        oriented.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    )
    # inner joins: an edge whose dst has no out-neighbors closes no
    # triangle, so dropping it is both correct and smaller.
    tri = (
        oriented.join(adj.select("src", F.col("nbrs").alias("_nu")), "src")
        .join(adj.select(F.col("src").alias("dst"), F.col("nbrs").alias("_nv")), "dst")
        .select(F.size(F.array_intersect("_nu", "_nv")).alias("_t"))
        .agg(F.sum("_t").cast("long").alias("n_triangles"))
        .select(F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"))
    )
    summary = (
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
        )
        .crossJoin(F.broadcast(und.agg(F.count(F.lit(1)).alias("n_edges"))))
        .crossJoin(F.broadcast(tri))
    )
    return summary.select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        # wedge-free guard (r08 div-audit): a degree-<=1 graph has no
        # wedges -> NULL clustering on both engines, not an
        # engine-divergent 0/0
        F.when(
            F.col("n_wedges") > 0,
            F.round(F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6),
        ).alias("clustering"),
    )


TRIANGLE_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), deg AS (
  SELECT n, count(*) AS d FROM (
    SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e
  ) GROUP BY n
), tri AS (
  SELECT count(*) AS n_triangles
  FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(n_triangles AS BIGINT) FROM tri) AS n_triangles,
       CASE WHEN (SELECT sum(d * (d - 1) / 2) FROM deg) > 0
            THEN round(3.0 * (SELECT n_triangles FROM tri)
                       / (SELECT sum(d * (d - 1) / 2) FROM deg), 6)
       END AS clustering
"""




def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 15 most common 3-step event-type paths across
    user timelines (two stacked leads over one (user, ts, event_id)
    sort — a single Exchange, same window spec as the transition
    matrix), ranked with a deterministic tie-break."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select(
            F.col("event_type").alias("s1"),
            F.lead("event_type", 1).over(w).alias("s2"),
            F.lead("event_type", 2).over(w).alias("s3"),
        )
        .filter(F.col("s3").isNotNull())
        .groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rw = Window.orderBy(F.desc("n"), "s1", "s2", "s3")
    return (
        paths.withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= 15)
        .orderBy("rnk")
    )


TOP_PATHS_SQL = """
WITH paths AS (
  SELECT event_type AS s1,
         lead(event_type, 1) OVER w AS s2,
         lead(event_type, 2) OVER w AS s3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), counted AS (
  SELECT s1, s2, s3, count(*) AS n FROM paths WHERE s3 IS NOT NULL
  GROUP BY 1, 2, 3
)
SELECT s1, s2, s3, n, CAST(rnk AS INTEGER) AS rnk
FROM (SELECT *, row_number() OVER (ORDER BY n DESC, s1, s2, s3) AS rnk
      FROM counted)
WHERE rnk <= 15
ORDER BY rnk
"""


def orders_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags on daily revenue: 28-day trailing
    mean/std over exact BIGINT cent sums (population variance via the
    integer-sum identity (Σx² − (Σx)²/n)/n — float enters only at the
    final divisions, so both engines compute the identical statistic),
    RANGE frame on the day so the window is calendar-true. Flags days
    with |z| > 2; emits the most recent 60 days for compactness."""
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    day_sec = F.col("day").cast("timestamp").cast("long")
    w = (
        Window.orderBy(day_sec)
        .rangeBetween(-28 * 86400, -86400)  # trailing 28 days, excl. today
    )
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("cents").over(w).cast("double")
    # squares overflow BIGINT at sf0.1 (Σ of ~8e17 values); decimal
    # keeps the windowed sum EXACT (order-independent), double enters
    # only at the final conversion — identical on both engines.
    cents_dec = F.col("cents").cast("decimal(38,0)")
    sxx = F.sum(cents_dec * cents_dec).over(w).cast("double")
    mean = sx / n
    var = (sxx - sx * sx / n) / n
    # constant-window guard (r08 div-audit): var <= 0 (all-equal
    # window, or a negative float epsilon) -> NULL z on both engines
    z = F.when(var > 0, (F.col("cents") - mean) / F.sqrt(var))
    flagged = daily.select(
        "day",
        "cents",
        n.alias("n_window"),
        F.round(mean, 4).alias("mean_cents"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 2).alias("anomaly"),
    ).filter(F.col("n_window") >= 14)
    rw = Window.orderBy(F.desc("day"))
    return (
        flagged.withColumn("_rn", F.row_number().over(rw))
        .filter(F.col("_rn") <= 60)
        .drop("_rn")
        .orderBy("day")
    )


DAILY_ANOMALY_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), stats AS (
  SELECT day, cents,
         count(*) OVER w AS n_window,
         CAST(sum(cents) OVER w AS DOUBLE) AS sx,
         CAST(sum(CAST(cents AS HUGEINT) * cents) OVER w AS DOUBLE) AS sxx
  FROM daily
  WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 28 DAYS PRECEDING
                                      AND INTERVAL 1 DAY PRECEDING)
), scored AS (
  SELECT day, cents, CAST(n_window AS BIGINT) AS n_window,
         round(sx / n_window, 4) AS mean_cents,
         round(CASE WHEN (sxx - sx * sx / n_window) / n_window > 0
                    THEN (cents - sx / n_window)
                         / sqrt((sxx - sx * sx / n_window) / n_window) END, 4) AS z,
         abs(CASE WHEN (sxx - sx * sx / n_window) / n_window > 0
                  THEN (cents - sx / n_window)
                       / sqrt((sxx - sx * sx / n_window) / n_window) END) > 2 AS anomaly
  FROM stats WHERE n_window >= 14
)
SELECT day, cents, n_window, mean_cents, z, anomaly
FROM (SELECT *, row_number() OVER (ORDER BY day DESC) AS rn FROM scored)
WHERE rn <= 60
ORDER BY day
"""



def events_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test: is event type independent of
    day-of-week? Observed counts per (type, dow), expected =
    row_total × col_total / N — every term an exact BIGINT ratio,
    float only in the final (O−E)²/E fold, so the statistic is
    engine-identical. One contingency aggregation + two marginal
    aggregations broadcast back (the stats-on-aggregates shape: no
    row ever leaves the first groupBy)."""
    ev = load(spark, sf_dir, "events")
    obs = (
        ev.select(F.col("event_type").alias("t"), F.dayofweek("ts").alias("dow"))
        .groupBy("t", "dow")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    row_tot = obs.groupBy("t").agg(F.sum("o").alias("rt"))
    col_tot = obs.groupBy("dow").agg(F.sum("o").alias("ct"))
    n = obs.agg(F.sum("o").alias("n"))
    e = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    cells = (
        obs.join(F.broadcast(row_tot), "t")
        .join(F.broadcast(col_tot), "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "t",
            "dow",
            "o",
            F.round(e, 4).alias("expected"),
            ((F.col("o") - e) * (F.col("o") - e) / e).alias("_term"),
        )
    )
    return cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum("_term"), 4).alias("chi_square"),
    ).crossJoin(F.broadcast(n.select(F.col("n").alias("n_events"))))


CHI_SQUARE_SQL = """
WITH obs AS (
  SELECT event_type AS t, dayofweek(ts) + 1 AS dow, count(*) AS o
  FROM events GROUP BY 1, 2
), rt AS (SELECT t, sum(o) AS rt FROM obs GROUP BY t),
ct AS (SELECT dow, sum(o) AS ct FROM obs GROUP BY dow),
n AS (SELECT sum(o) AS n FROM obs),
cells AS (
  SELECT o.t, o.dow, o.o,
         CAST(rt AS DOUBLE) * ct / n AS e
  FROM obs o JOIN rt USING (t) JOIN ct USING (dow) CROSS JOIN n
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       round(sum((o - e) * (o - e) / e), 4) AS chi_square,
       (SELECT CAST(n AS BIGINT) FROM n) AS n_events
FROM cells
"""


def lineitem_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between price (exact cents) and quantity
    per return flag — computed from EXACT integer sums
    (n·Σxy − Σx·Σy over decimal accumulators; BIGINT² overflows at
    this volume), float entering only at the final ratio, so both
    engines produce the identical r — the discipline the built-in
    ``corr`` (order-dependent float sums) can't give across engines."""
    li = load(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
    y = F.col("l_quantity").cast("decimal(38,0)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return (
        agg.select(
            "l_returnflag",
            F.col("n").cast("long").alias("n_lines"),
            # zero-variance guard (r08 div-audit): constant price or
            # qty in a group -> NULL corr on both engines
            F.when(den > 0, F.round(num / den, 6)).alias("price_qty_corr"),
        )
        .orderBy("l_returnflag")
    )


CORR_SQL = """
WITH agg AS (
  SELECT l_returnflag,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)) AS sx,
         sum(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS sy,
         sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
             * CAST(l_quantity AS BIGINT)) AS sxy,
         sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxx,
         sum(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
             * CAST(l_quantity AS BIGINT)) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_lines,
       CASE WHEN sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE)) > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
       END AS price_qty_corr
FROM agg
ORDER BY l_returnflag
"""

def events_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day via the first-occurrence trick.

    ``count(distinct) over (order by day)`` is quadratic-state at scale;
    the standard reformulation — each user counts only on their FIRST
    active day, then a running sum over the tiny day-level frame — costs
    one shuffle on user_id plus a window over ~2 400 day rows.
    """
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("day"))
    daily = first.groupBy("day").agg(F.count(F.lit(1)).alias("n_new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).alias("cum_users"),
    ).orderBy("day")


CUMULATIVE_DISTINCT_SQL = """
WITH first_day AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
), daily AS (
  SELECT day, count(*) AS n_new_users FROM first_day GROUP BY day
)
SELECT day, n_new_users,
       CAST(sum(n_new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_users
FROM daily ORDER BY day
"""


def events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event value (alpha=0.25, 24-row lookback) — the
    bit-exact bounded-fold form (operators/timeseries.ewma): one
    Exchange on user_id, JVM-side fold, no Python, no self-join."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        ewma("user_id", ["ts", "event_id"], "value").alias("ewma_value"),
    ).orderBy("event_id")


# Mirrors the operator fold exactly: same frame, same seed, same
# left-to-right a*0.75 + b*0.25 steps — every op IEEE-correctly-rounded
# on identical inputs, so the doubles hash-match without tolerance.
EWMA_SQL = """
WITH framed AS (
  SELECT event_id, user_id, ts, value,
         list(CAST(value AS DOUBLE))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 24 PRECEDING AND CURRENT ROW) AS l
  FROM events
)
SELECT event_id, user_id, ts, value,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), l),
                   (a, b) -> a * 0.75 + b * 0.25) AS ewma_value
FROM framed ORDER BY event_id
"""


def events_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of event value WITHOUT a global
    sort: per-value tie-group counts first (the 2-decimal value domain
    bounds distinct values at ~49k, so the offset window runs over a
    BOUNDED frame, not over rows), then a distributed within-value
    row_number gives every row its exact global rank; the ANSI ntile
    assignment formula maps ranks to buckets. The only single-partition
    window is over the distinct-value frame — at 100 TB the per-row
    work stays in the value-partitioned shuffle.
    """
    # histogram over NON-NULL values, stated explicitly on both sides:
    # without the filter, Spark's inner join on "value" drops null rows
    # while still counting them in n — a silent boundary skew (review
    # finding); DuckDB's ntile would order them last instead.
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    nb = 10
    sizes = ev.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
    # Exclusive cumulative = inclusive − own count; the inclusive sum
    # ADAPTS to the value-domain size under the fact-rowcount hint (r11
    # continuous-value hardening — plain bounded-domain window today,
    # range-partitioned parallel prefix when distinct values ≈ n).
    from medical_examination_data_etl_system_spark.operators.ranking import with_global_prefix

    offsets = with_global_prefix(
        sizes,
        [F.col("value")],
        rank_col=None,
        running_sums={"_cumv": "cnt"},
        n_rows_hint=table_rowcount(spark, sf_dir, "events"),
        small_frame_rows=VALUE_DOMAIN_SMALL_FRAME_ROWS,
    ).select("value", (F.col("_cumv") - F.col("cnt")).alias("off"))
    w_in = Window.partitionBy("value").orderBy("event_id")
    ranked = (
        ev.join(offsets, "value")
        .select(
            "value",
            "event_id",
            (F.col("off") + F.row_number().over(w_in)).alias("rnk"),
        )
    )
    total = ev.agg(F.count(F.lit(1)).alias("n"))
    ranked = ranked.crossJoin(F.broadcast(total))
    # ANSI ntile: q = n div nb, r = n mod nb; first r buckets get q+1 rows.
    bucketed = ranked.select(
        "value",
        F.expr(
            f"CASE WHEN rnk <= (n % {nb}) * (n div {nb} + 1) "
            f"THEN (rnk - 1) div (n div {nb} + 1) + 1 "
            f"ELSE (n % {nb}) + (rnk - (n % {nb}) * (n div {nb} + 1) - 1) div (n div {nb}) + 1 END"
        ).cast("int").alias("bucket"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .orderBy("bucket")
    )


HISTOGRAM_EQUIDEPTH_SQL = """
WITH b AS (
  SELECT value, CAST(ntile(10) OVER (ORDER BY value, event_id) AS INTEGER) AS bucket
  FROM events WHERE value IS NOT NULL
)
SELECT bucket, count(*) AS n_rows,
       min(value) AS min_value, max(value) AS max_value,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM b GROUP BY bucket ORDER BY bucket
"""


def lineitem_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (quantity vs price) per return flag —
    tie-corrected via INTEGER doubled average ranks, then the exact-sum
    Pearson machinery over those ranks, so both engines produce the
    identical rho with float entering only at the final ratio.

    Doubled average rank without a tie-count window:
    ``2·r_avg = rank_asc − rank_desc + n + 1`` (min+max position of the
    tie group) — all four rank windows partition by flag only, so the
    whole ranking costs ONE Exchange and sorts within it.
    """
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    flag = "flag"

    def doubled_rank(valcol: str) -> DataFrame:
        """(flag, val, 2·avg_rank) from per-value tie-group counts:
        2r = 2·offset + m + 1 (offset = rows strictly smaller, m =
        ties). Ranking this way never sorts the FACT rows — the only
        ordered pass is a cumulative count over the DISTINCT-value
        frame (≤ |value domain| rows per flag), so rank assignment
        stays a distributed (flag, value) join however few flags there
        are. Four whole-partition rank() windows over 3 flag
        partitions were measured parallelism-starved at the 100× scale
        check (×73); this shape is the equi-depth-histogram trick
        applied to ranking.
        """
        sizes = li.groupBy(flag, valcol).agg(F.count(F.lit(1)).alias("_m"))
        w_off = (
            Window.partitionBy(flag)
            .orderBy(valcol)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return sizes.select(
            flag,
            valcol,
            (2 * F.coalesce(F.sum("_m").over(w_off), F.lit(0)) + F.col("_m") + 1)
            .cast("decimal(38,0)")
            .alias(f"r_{valcol}"),
        )

    # The cents rank never rides back onto the FACT rows (r14): every
    # Spearman sum is expressible over the per-cents tie groups once the
    # qty rank is pre-aggregated into them — integer multiplication
    # distributes exactly over the group sums, so Σ rx·ry =
    # Σ_c (Σ_{rows in c} rx)·r_c, Σ ry² = Σ_c m_c·r_c², etc. That
    # removes the old plan's join of the fact against the ~|cents
    # domain| rank table (a 594k-row broadcast build at sf0.1, the
    # single most expensive stage: +1.5 s of 3.5), leaving one fact
    # shuffle (the per-cents groupBy, map-side partial) and small-frame
    # work after it. Exact-parity discipline: the qty join is LEFT so a
    # row with no qty rank still counts in `m_all` (the rank offsets —
    # the old sizes frame counted every row), while the final sums use
    # only joined rows (`m_j`, the old inner-join semantics), and the
    # null-cents group — which the old fact⋈ranks join dropped — is
    # filtered after the window has consumed its offset mass.
    joined = li.join(F.broadcast(doubled_rank("qty")), [flag, "qty"], "left")
    per_cents = joined.groupBy(flag, "cents").agg(
        F.count(F.lit(1)).alias("_m_all"),
        F.count("r_qty").cast("decimal(38,0)").alias("_m_j"),
        F.sum("r_qty").alias("_sx"),
        F.sum(F.col("r_qty") * F.col("r_qty")).alias("_sxx"),
    )
    w_off = (
        Window.partitionBy(flag)
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_cents.withColumn(
        "ry",
        (2 * F.coalesce(F.sum("_m_all").over(w_off), F.lit(0)) + F.col("_m_all") + 1)
        .cast("decimal(38,0)"),
    ).filter(F.col("cents").isNotNull())
    agg = ranked.groupBy(flag).agg(
        F.sum("_m_j").alias("n"),
        F.sum("_sx").alias("sx"),
        F.sum(F.col("_m_j") * F.col("ry")).alias("sy"),
        F.sum(F.col("_sx") * F.col("ry")).alias("sxy"),
        F.sum("_sxx").alias("sxx"),
        F.sum(F.col("_m_j") * F.col("ry") * F.col("ry")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return agg.select(
        F.col(flag).alias("l_returnflag"),
        F.col("n").cast("long").alias("n_lines"),
        # zero-variance guard (r08 div-audit): all-tied ranks -> NULL
        F.when(den > 0, F.round(num / den, 6)).alias("spearman_rho"),
    ).orderBy("l_returnflag")


SPEARMAN_SQL = """
WITH ranked AS (
  SELECT l_returnflag,
         CAST(rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity ASC)
              - rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC)
              + count(*) OVER (PARTITION BY l_returnflag) + 1 AS HUGEINT) AS rx,
         CAST(rank() OVER (PARTITION BY l_returnflag
                           ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT) ASC)
              - rank() OVER (PARTITION BY l_returnflag
                             ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT) DESC)
              + count(*) OVER (PARTITION BY l_returnflag) + 1 AS HUGEINT) AS ry
  FROM lineitem
), agg AS (
  SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
         sum(rx) AS sx, sum(ry) AS sy,
         sum(rx * ry) AS sxy, sum(rx * rx) AS sxx, sum(ry * ry) AS syy
  FROM ranked GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_lines,
       CASE WHEN sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE)) > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
       END AS spearman_rho
FROM agg
ORDER BY l_returnflag
"""


def events_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution (the companion to the as-of
    last-touch query): every view/click in the hour before a purchase
    shares that purchase's value equally. Credits are integer
    ppm-cents (``(cents·10⁶) div n_touches`` summed as BIGINTs), so the
    per-channel totals are order-free exact — no float summation.
    Plan: one user-keyed join (per-user touch density bounds the pair
    work), one window count per purchase, one channel aggregation.
    """
    ev = load(spark, sf_dir, "events")
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("ts").alias("ts_t"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ts_p"),
        F.col("event_id").alias("purchase_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    paired = purchases.join(touches, "user_id").filter(
        (F.col("ts_t") <= F.col("ts_p"))
        & (F.col("ts_t") > F.col("ts_p") - F.expr("INTERVAL 1 HOUR"))
    )
    credited = paired.select(
        "channel",
        "purchase_id",
        F.expr("(cents * 1000000) div (count(1) over (partition by purchase_id))")
        .alias("credit_ppm"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("purchase_id").alias("n_purchases"),
            F.sum("credit_ppm").alias("credited_ppm_cents"),
        )
        .orderBy("channel")
    )


LINEAR_ATTRIBUTION_SQL = """
WITH touches AS (
  SELECT user_id, event_type AS channel, ts AS ts_t, event_id AS touch_id
  FROM events WHERE event_type IN ('view', 'click')
), purchases AS (
  SELECT user_id, ts AS ts_p, event_id AS purchase_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), paired AS (
  SELECT t.channel, p.purchase_id, p.cents
  FROM purchases p JOIN touches t USING (user_id)
  WHERE t.ts_t <= p.ts_p AND t.ts_t > p.ts_p - INTERVAL 1 HOUR
), credited AS (
  SELECT channel, purchase_id,
         (cents * 1000000) // count(*) OVER (PARTITION BY purchase_id)
           AS credit_ppm
  FROM paired
)
SELECT channel,
       count(*) AS n_touches,
       count(DISTINCT purchase_id) AS n_purchases,
       CAST(sum(credit_ppm) AS BIGINT) AS credited_ppm_cents
FROM credited
GROUP BY channel
ORDER BY channel
"""


def events_ushape_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch U-SHAPED (position-based) attribution — the third
    of the classic attribution trio (as-of last-touch, linear, U):
    first touch 40%, last touch 40%, middle touches share the
    remaining 20% over a 24-hour lookback; 2 touches split 50/50, a
    single touch keeps 100%.
    Credits are integer ppm-cents with every split a deterministic
    integer ``div`` (the linear query's exactness discipline — no
    float summation anywhere), so per-(channel, role) totals are
    order-free exact.

    Plan (the r08 rewrite — exact, not a cap; two structural moves):
    (1) DAY-BUCKET BLOCKING (the join_interval_overlap move): the
    plain user-keyed join enumerates EVERY (purchase × touch) pair per
    user before the 24 h filter — at sf0.1 that is 534k pairs of which
    only 17k survive, and the waste grows with the square of per-user
    density (83–102 s at 100×). The 24 h lookback spans at most two
    epoch-day buckets, so purchases probe exactly (day, day−1) and the
    join key (user_id, bucket) bounds enumeration to touches within
    48 h of each purchase — each surviving pair produced exactly once
    (a touch's bucket is unique). (2) CHANNEL COLLAPSE: U-shape needs
    only, per purchase, the argmin/argmax touch and per-CHANNEL touch
    counts (middle credit is uniform), so surviving pairs flow
    straight into a hash aggregate keyed (purchase, channel) — count +
    min/max struct(ts, touch_id, channel), all algebraic, map-side
    partial agg — and the only window runs over ≤|channels|-row
    partitions (the r07 form shuffled and SORTED every pair through a
    purchase-partitioned row_number). Shuffled volume after the join
    is ≤ purchases × |channels| rows under ANY density. Results are
    bit-identical (the oracle is unchanged). 100×: 96 s (collapse
    alone) → see SURVEY for the blocked figure."""
    ev = load(spark, sf_dir, "events")
    day = lambda c: F.floor(F.unix_timestamp(c) / 86400).cast("long")  # noqa: E731
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("ts").alias("ts_t"),
        F.col("event_id").alias("touch_id"),
        day("ts").alias("bkt"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ts_p"),
        F.col("event_id").alias("purchase_id"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.explode(F.array(day("ts"), day("ts") - 1)).alias("bkt"),
    )
    paired = purchases.join(touches, ["user_id", "bkt"]).filter(
        (F.col("ts_t") <= F.col("ts_p"))
        & (F.col("ts_t") > F.col("ts_p") - F.expr("INTERVAL 24 HOUR"))
    )
    # (ts_t, touch_id) is unique per user, so struct min/max is the
    # exact argmin/argmax of the original (ts_t, touch_id) ordering.
    key = F.struct(F.col("ts_t"), F.col("touch_id"), F.col("channel"))
    agg = paired.groupBy("purchase_id", "cents", "channel").agg(
        F.count(F.lit(1)).alias("m"),
        F.min(key).alias("mn"),
        F.max(key).alias("mx"),
    )
    wp = Window.partitionBy("purchase_id")
    enr = agg.select(
        "cents",
        "channel",
        "m",
        F.sum("m").over(wp).alias("n"),
        F.min("mn").over(wp)["channel"].alias("first_ch"),
        F.max("mx").over(wp)["channel"].alias("last_ch"),
    )
    c_only = F.expr("cents * 1000000")
    c_half = F.expr("(cents * 1000000 * 50) div 100")
    c_end = F.expr("(cents * 1000000 * 40) div 100")
    c_mid_each = F.expr("((cents * 1000000 * 20) div 100) div (n - 2)")
    is_first = F.col("first_ch") == F.col("channel")
    is_last = F.col("last_ch") == F.col("channel")
    mid_m = (F.col("m") - is_first.cast("long") - is_last.cast("long")).cast("long")
    one = F.lit(1).cast("long")
    contribs = F.array(
        F.when(
            is_first,
            F.struct(
                F.when(F.col("n") == 1, F.lit("only"))
                .otherwise(F.lit("first"))
                .alias("role"),
                one.alias("cnt"),
                F.when(F.col("n") == 1, c_only)
                .when(F.col("n") == 2, c_half)
                .otherwise(c_end)
                .alias("credit"),
            ),
        ),
        F.when(
            is_last & (F.col("n") >= 2),
            F.struct(
                F.lit("last").alias("role"),
                one.alias("cnt"),
                F.when(F.col("n") == 2, c_half).otherwise(c_end).alias("credit"),
            ),
        ),
        F.when(
            (F.col("n") >= 3) & (mid_m > 0),
            F.struct(
                F.lit("middle").alias("role"),
                mid_m.alias("cnt"),
                (mid_m * c_mid_each).alias("credit"),
            ),
        ),
    )
    rows = enr.select(
        "channel", F.explode(F.filter(contribs, lambda x: x.isNotNull())).alias("c")
    )
    return (
        rows.groupBy("channel", F.col("c")["role"].alias("role"))
        .agg(
            F.sum(F.col("c")["cnt"]).alias("n_touches"),
            F.sum(F.col("c")["credit"]).alias("credited_ppm_cents"),
        )
        .orderBy("channel", "role")
    )


USHAPE_ATTRIBUTION_SQL = """
WITH touches AS (
  SELECT user_id, event_type AS channel, ts AS ts_t, event_id AS touch_id
  FROM events WHERE event_type IN ('view', 'click')
), purchases AS (
  SELECT user_id, ts AS ts_p, event_id AS purchase_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), paired AS (
  SELECT t.channel, p.purchase_id, p.cents, t.ts_t, t.touch_id
  FROM purchases p JOIN touches t USING (user_id)
  WHERE t.ts_t <= p.ts_p AND t.ts_t > p.ts_p - INTERVAL 24 HOUR
), pos AS (
  SELECT channel, cents,
         row_number() OVER (PARTITION BY purchase_id ORDER BY ts_t, touch_id) AS rn,
         count(*) OVER (PARTITION BY purchase_id) AS n
  FROM paired
), credited AS (
  SELECT channel,
         CASE WHEN n = 1 THEN 'only'
              WHEN rn = 1 THEN 'first'
              WHEN rn = n THEN 'last'
              ELSE 'middle' END AS role,
         CASE WHEN n = 1 THEN cents * 1000000
              WHEN n = 2 THEN (cents * 1000000 * 50) // 100
              WHEN rn = 1 OR rn = n THEN (cents * 1000000 * 40) // 100
              ELSE ((cents * 1000000 * 20) // 100) // (n - 2) END AS credit_ppm
  FROM pos
)
SELECT channel, role,
       count(*) AS n_touches,
       CAST(sum(credit_ppm) AS BIGINT) AS credited_ppm_cents
FROM credited
GROUP BY channel, role
ORDER BY channel, role
"""


def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion latency: per user, seconds from first
    view to first STRICTLY-LATER purchase; exact interpolated p50/p90
    over those latencies computed WITHOUT ranking rows — per-value
    counts + a cumulative window over the BOUNDED latency domain
    (seconds within the corpus time range), then the two neighboring
    rank values are picked by conditional aggregation. This is the
    global-percentile shape that scales: agg_percentiles_by_flag's
    row_number ranking is right per GROUP KEY, but a global percentile
    at 10¹¹ rows must rank the value DOMAIN, not the rows. Formula
    tree mirrored expression-for-expression (PERCENTILES_SQL
    discipline).
    """
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("tp")
    )
    lat = (
        purchases.join(per_user, "user_id")
        .filter(F.col("tp") > F.col("fv"))
        .groupBy("user_id")
        .agg(
            # integer floor-division on BOTH engines: a double divide +
            # cast would round in DuckDB but truncate in Spark for
            # fractional-second latencies
            F.expr("(min(unix_micros(tp)) - max(unix_micros(fv))) div 1000000")
            .alias("lat_s")
        )
    )
    counts = lat.groupBy("lat_s").agg(F.count(F.lit(1)).alias("cnt"))
    # The latency domain is bounded by the corpus time range in the
    # driver data but degenerates to ~n_users on jittered-timestamp
    # corpora — the cumulative window ADAPTS under the events-rowcount
    # hint (an upper bound on converted users; r11 hardening).
    from medical_examination_data_etl_system_spark.operators.ranking import with_global_prefix

    cum = with_global_prefix(
        counts,
        [F.col("lat_s")],
        rank_col=None,
        running_sums={"cum": "cnt"},
        n_rows_hint=table_rowcount(spark, sf_dir, "events"),
        small_frame_rows=VALUE_DOMAIN_SMALL_FRAME_ROWS,
    ).select(
        "lat_s",
        "cum",
        (F.col("cum") - F.col("cnt")).alias("prev_cum"),
    )
    total = lat.agg(F.count(F.lit(1)).alias("n"))
    c = cum.crossJoin(F.broadcast(total))

    def _q(p: float) -> F.Column:
        h = (F.col("n") - 1) * F.lit(p) + 1
        fh = F.floor(h)
        lo = F.max(
            F.when((F.col("prev_cum") < fh) & (F.col("cum") >= fh), F.col("lat_s"))
        )
        hi = F.max(
            F.when(
                (F.col("prev_cum") < fh + 1) & (F.col("cum") >= fh + 1), F.col("lat_s")
            )
        )
        frac = F.max(h - fh)
        return F.round(lo + frac * (F.coalesce(hi, lo) - lo), 3)

    return c.agg(
        F.max("n").cast("long").alias("n_converted"),
        _q(0.5).alias("p50_latency_s"),
        _q(0.9).alias("p90_latency_s"),
    )


CONVERSION_LATENCY_SQL = """
WITH per_user AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS fv
  FROM events GROUP BY user_id
), lat AS (
  SELECT p.user_id,
         CAST((min(epoch_us(p.ts)) - max(epoch_us(u.fv))) // 1000000 AS BIGINT) AS lat_s
  FROM events p JOIN per_user u USING (user_id)
  WHERE p.event_type = 'purchase' AND p.ts > u.fv
  GROUP BY p.user_id
), counts AS (
  SELECT lat_s, count(*) AS cnt FROM lat GROUP BY lat_s
), cum AS (
  SELECT lat_s,
         sum(cnt) OVER (ORDER BY lat_s ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (ORDER BY lat_s ROWS UNBOUNDED PRECEDING) - cnt AS prev_cum
  FROM counts
), total AS (SELECT count(*) AS n FROM lat)
SELECT CAST(max(n) AS BIGINT) AS n_converted,
       round(
         max(CASE WHEN prev_cum < floor((n - 1) * CAST(0.5 AS DOUBLE) + 1)
                   AND cum >= floor((n - 1) * CAST(0.5 AS DOUBLE) + 1) THEN lat_s END)
         + max((n - 1) * CAST(0.5 AS DOUBLE) + 1 - floor((n - 1) * CAST(0.5 AS DOUBLE) + 1)) *
           (coalesce(max(CASE WHEN prev_cum < floor((n - 1) * CAST(0.5 AS DOUBLE) + 1) + 1
                          AND cum >= floor((n - 1) * CAST(0.5 AS DOUBLE) + 1) + 1 THEN lat_s END),
                     max(CASE WHEN prev_cum < floor((n - 1) * CAST(0.5 AS DOUBLE) + 1)
                          AND cum >= floor((n - 1) * CAST(0.5 AS DOUBLE) + 1) THEN lat_s END))
            - max(CASE WHEN prev_cum < floor((n - 1) * CAST(0.5 AS DOUBLE) + 1)
                   AND cum >= floor((n - 1) * CAST(0.5 AS DOUBLE) + 1) THEN lat_s END)), 3)
         AS p50_latency_s,
       round(
         max(CASE WHEN prev_cum < floor((n - 1) * CAST(0.9 AS DOUBLE) + 1)
                   AND cum >= floor((n - 1) * CAST(0.9 AS DOUBLE) + 1) THEN lat_s END)
         + max((n - 1) * CAST(0.9 AS DOUBLE) + 1 - floor((n - 1) * CAST(0.9 AS DOUBLE) + 1)) *
           (coalesce(max(CASE WHEN prev_cum < floor((n - 1) * CAST(0.9 AS DOUBLE) + 1) + 1
                          AND cum >= floor((n - 1) * CAST(0.9 AS DOUBLE) + 1) + 1 THEN lat_s END),
                     max(CASE WHEN prev_cum < floor((n - 1) * CAST(0.9 AS DOUBLE) + 1)
                          AND cum >= floor((n - 1) * CAST(0.9 AS DOUBLE) + 1) THEN lat_s END))
            - max(CASE WHEN prev_cum < floor((n - 1) * CAST(0.9 AS DOUBLE) + 1)
                   AND cum >= floor((n - 1) * CAST(0.9 AS DOUBLE) + 1) THEN lat_s END)), 3)
         AS p90_latency_s
FROM cum CROSS JOIN total
"""


def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt level+trend smoothing (operators/timeseries.holt):
    one-step-ahead forecast per event, bit-exact vs the oracle's
    struct-accumulator list fold — trend-aware smoothing with the same
    one-Exchange plan as the EWMA."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        holt("user_id", ["ts", "event_id"], "value").alias("forecast"),
    ).orderBy("event_id")


# Mirrors the operator fold exactly: same frame, same init, the same
# EXPANDED trend update (see operators/timeseries.holt — a 2-element
# LIST accumulator with single-reference fields sidesteps DuckDB 1.0's
# struct-field lambda aliasing bug), so the forecasts hash-match with
# no tolerance.
HOLT_SQL = """
WITH framed AS (
  SELECT event_id, user_id, ts, value,
         list(CAST(value AS DOUBLE))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 24 PRECEDING AND CURRENT ROW) AS lst
  FROM events
), folded AS (
  SELECT event_id, user_id, ts, value,
         list_reduce(
           list_prepend([CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
                        [[CAST(x AS DOUBLE), CAST(0.0 AS DOUBLE)] for x in lst]),
           (a, v) -> [CAST(0.25 AS DOUBLE) * v[1] + CAST(0.75 AS DOUBLE) * (a[1] + a[2]),
                      CAST(0.0625 AS DOUBLE) * v[1] - CAST(0.0625 AS DOUBLE) * a[1]
                        + CAST(0.9375 AS DOUBLE) * a[2]]
         ) AS s
  FROM framed
)
SELECT event_id, user_id, ts, value, s[1] + s[2] AS forecast
FROM folded ORDER BY event_id
"""


def customer_spend_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer spend TREND: exact least-squares slope/intercept of
    order value (cents) over order date (day index) from integer sums —
    the Pearson machinery's regression sibling; float enters only at
    the two final divisions, mirrored expression-for-expression.
    Customers whose orders all land on one day are excluded (slope
    undefined — zero denominator) on both engines.
    """
    o = load(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01")).cast("decimal(38,0)")
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)")
    agg = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(day).alias("sx"),
        F.sum(cents).alias("sy"),
        F.sum(day * cents).alias("sxy"),
        F.sum(day * day).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / den.cast("double")
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / F.col("n").cast("double")
    return (
        agg.filter(den != 0)
        .select(
            "o_custkey",
            F.col("n").cast("long").alias("n_orders"),
            F.round(slope, 4).alias("slope_cents_per_day"),
            F.round(intercept, 2).alias("intercept_cents"),
        )
        .orderBy("o_custkey")
    )


SPEND_TREND_SQL = """
WITH agg AS (
  SELECT o_custkey,
         CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS HUGEINT)) AS sx,
         sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)) AS sy,
         sum(CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS HUGEINT)
             * CAST(round(o_totalprice * 100) AS BIGINT)) AS sxy,
         sum(CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS HUGEINT)
             * datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS sxx
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       CAST(n AS BIGINT) AS n_orders,
       round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 4)
         AS slope_cents_per_day,
       round((CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 2) AS intercept_cents
FROM agg
WHERE n * sxx - sx * sx <> 0
ORDER BY o_custkey
"""


def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month seasonality index: each month's average order
    value (exact cents) relative to the global average — the seasonal
    baseline every demand forecast starts from. Two tiny aggregations
    (12-row month frame, 1-row global), index = mirrored double
    division of integer sums — engine-identical to the last bit.
    """
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    monthly = o.groupBy(F.month("o_orderdate").alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).alias("sum_cents"),
    )
    total = o.agg(
        F.count(F.lit(1)).alias("n_all"), F.sum(cents).alias("cents_all")
    )
    idx = (
        F.col("sum_cents").cast("double") / F.col("n_orders")
    ) / (F.col("cents_all").cast("double") / F.col("n_all"))
    return (
        monthly.crossJoin(F.broadcast(total))
        .select(
            "month",
            "n_orders",
            "sum_cents",
            F.round(idx, 6).alias("seasonal_index"),
        )
        .orderBy("month")
    )


SEASONALITY_SQL = """
WITH monthly AS (
  SELECT CAST(month(o_orderdate) AS INTEGER) AS month,
         count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM orders GROUP BY 1
), total AS (
  SELECT count(*) AS n_all,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_all
  FROM orders
)
SELECT month, n_orders, sum_cents,
       round((CAST(sum_cents AS DOUBLE) / n_orders)
             / (CAST(cents_all AS DOUBLE) / n_all), 6) AS seasonal_index
FROM monthly CROSS JOIN total
ORDER BY month
"""


def graph_bfs_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-synchronous BFS over the co-purchase part graph
    (operators/clustering.bfs_depths): minimum hop count from the
    global minimum part key, depth ≤ 4; per-depth node counts. The one
    iterative-graph operator whose loop the driver hash gate covers
    END-TO-END — min-depth semantics are exactly a recursive CTE with
    UNION dedup, so unlike pagerank (float folding, rows-only) every
    frontier expansion must agree with the oracle bit-for-bit.
    The source node is a 1-row driver scalar (bounded, like the
    k-means centroid pulls)."""
    from medical_examination_data_etl_system_spark.operators.clustering import bfs_depths

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    source = li.agg(F.min("l_partkey")).collect()[0][0]
    depths = bfs_depths(edges, source, max_depth=4)
    return (
        depths.groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_parts"), F.min("node").alias("min_partkey"))
        .orderBy("depth")
    )


BFS_SQL = """
WITH RECURSIVE e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), walk(node, depth) AS (
  SELECT min(l_partkey), CAST(0 AS INTEGER) FROM lineitem
  UNION
  SELECT e.dst, CAST(w.depth + 1 AS INTEGER)
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.depth < 4
), mind AS (
  SELECT node, min(depth) AS depth FROM walk GROUP BY node
)
SELECT depth, count(*) AS n_parts, min(node) AS min_partkey
FROM mind GROUP BY depth ORDER BY depth
"""


def customer_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto revenue classification: customers ranked by exact
    total cents, cumulative share cut at 80% (A) and 95% (B) — the
    inventory-analytics standard. Class boundaries are INTEGER
    comparisons (cum·100 ≤ total·80) in DECIMAL(38,0) — exact at any
    book size, where a long product overflows past ~10¹⁷ total cents —
    so no float enters until the final reported share. The cumulative
    sum runs over the per-customer aggregate frame via
    ``with_global_prefix`` (range-partitioned parallel prefix sum +
    bounded offset collect) — the frame is dim-sized (1.39M customers
    adversarial / 10⁹ on a cluster), past a single sort task; ties are
    broken by customer key so the ranking is engine-deterministic."""
    from medical_examination_data_etl_system_spark.operators.ranking import with_global_prefix

    orders = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(F.sum(cents).alias("rev_cents"))
    total = per_cust.agg(F.sum("rev_cents").alias("_total"))
    cum = with_global_prefix(
        per_cust,
        [F.desc("rev_cents"), F.asc("o_custkey")],
        rank_col="_rk",
        running_sums={"_cum": "rev_cents"},
        n_rows_hint=table_rowcount(spark, sf_dir, "customer"),
    ).crossJoin(F.broadcast(total))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    cls = (
        F.when(dec("_cum") * 100 <= dec("_total") * 80, "A")
        .when(dec("_cum") * 100 <= dec("_total") * 95, "B")
        .otherwise("C")
    )
    return (
        cum.select(cls.alias("abc_class"), "rev_cents", "_total")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev_cents").alias("class_cents"),
            F.round(F.sum("rev_cents").cast("double") / F.max("_total"), 4).alias("rev_share"),
        )
        .orderBy("abc_class")
    )


ABC_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY o_custkey
), cum AS (
  SELECT o_custkey, rev_cents,
         sum(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS c,
         sum(rev_cents) OVER () AS t
  FROM per_cust
)
SELECT CASE WHEN c * 100 <= t * 80 THEN 'A'
            WHEN c * 100 <= t * 95 THEN 'B'
            ELSE 'C' END AS abc_class,
       count(*) AS n_customers,
       CAST(sum(rev_cents) AS BIGINT) AS class_cents,
       round(CAST(sum(rev_cents) AS DOUBLE) / max(t), 4) AS rev_share
FROM cum
GROUP BY 1 ORDER BY abc_class
"""


def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-WEIGHTED median price per return flag — the weighted
    quantile the plain percentile battery doesn't have (a shipment of
    40 units should pull the 'typical price' 40× harder than a
    single-unit line). Same value-domain plan as the percentile
    rewrite: per-(flag, price) INTEGER weight sums, cumulative window
    over the distinct-price frame, median = smallest price whose
    doubled cumulative weight reaches the total (2·cumw ≥ W — pure
    integer comparison, no halves, no floats until the output).

    The cumulative window ADAPTS to the value-domain size under the
    fact-rowcount hint (r11 continuous-value hardening — the
    distinct-(flag, price) frame is ~n on the values corpus)."""
    from medical_examination_data_etl_system_spark.operators.ranking import with_partitioned_prefix

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice", "l_quantity")
    qty = F.round(F.col("l_quantity")).cast("long")
    counts = li.groupBy("l_returnflag", "l_extendedprice").agg(F.sum(qty).alias("_w"))
    ranked = with_partitioned_prefix(
        counts,
        ["l_returnflag"],
        [F.col("l_extendedprice")],
        running_sums={"_cumw": "_w"},
        part_total_cols={"_tw": "_w"},
        n_rows_hint=table_rowcount(spark, sf_dir, "lineitem"),
        small_frame_rows=VALUE_DOMAIN_SMALL_FRAME_ROWS,
    )
    return (
        ranked.groupBy("l_returnflag")
        .agg(
            F.min(
                F.when(2 * F.col("_cumw") >= F.col("_tw"), F.col("l_extendedprice"))
            ).alias("weighted_median_price"),
            F.max("_tw").alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )


WEIGHTED_MEDIAN_SQL = """
WITH counts AS (
  SELECT l_returnflag, l_extendedprice,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY l_returnflag, l_extendedprice
), ranked AS (
  SELECT l_returnflag, l_extendedprice, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM counts
)
SELECT l_returnflag,
       min(CASE WHEN 2 * cumw >= tw THEN l_extendedprice END) AS weighted_median_price,
       CAST(max(tw) AS BIGINT) AS total_qty
FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag
"""


def customer_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the inequality
    statistic for concentration monitoring (how much of the book one
    whale owns). Exact: cents are BIGINTs, ranks come from one window
    over the customer-count-bounded aggregate frame (the ABC class),
    and the classic Σ(2i−n−1)·xᵢ numerator is summed exactly in
    DECIMAL(38,0) — a long sum overflows past ~10⁶ customers
    (rank·cents products reach ~10¹⁷ each; the adversarial customers
    corpus caught the int64 blow-up at 1.39M customers), while 38
    digits carry to ~10⁹ customers × whale books. Equal values make
    the within-tie rank order irrelevant (the coefficient sum over a
    tie block factors out), so the statistic is engine-deterministic
    without a tie-break column. The n·Σx denominator multiplies as
    doubles for the same reason (each factor is long-exact; only the
    product overflows). One double division at the end, mirrored —
    bit-identical to the pre-fix output wherever the old longs didn't
    overflow, since the decimal sum is the same integer.

    Ranks come from ``with_global_prefix`` (range-partitioned parallel
    rank + bounded offset collect) rather than a single-task
    ``Window.orderBy`` — the per-customer frame is dim-sized (1.39M on
    the adversarial customers corpus, 10⁹ on a cluster), which is past
    what one sort task should carry; the total count rides along from
    the same offsets, replacing the unpartitioned count window."""
    from medical_examination_data_etl_system_spark.operators.ranking import with_global_prefix

    orders = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = orders.groupBy("o_custkey").agg(F.sum(cents).alias("_x"))
    ranked = with_global_prefix(
        per_cust,
        [F.asc("_x"), F.asc("o_custkey")],
        rank_col="_i",
        total_count_col="_n",
        # sizing bound: distinct o_custkey ≤ |customer| (memoized count)
        n_rows_hint=table_rowcount(spark, sf_dir, "customer"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("_x").alias("total_cents"),
        F.round(
            F.sum(
                (2 * F.col("_i") - F.col("_n") - 1).cast("decimal(38,0)")
                * F.col("_x").cast("decimal(38,0)")
            ).cast("double")
            / (
                F.count(F.lit(1)).cast("double")
                * F.sum("_x").cast("double")
            ),
            6,
        ).alias("gini"),
    )


GINI_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT x,
         row_number() OVER (ORDER BY x, o_custkey) AS i,
         count(*) OVER () AS n
  FROM per_cust
)
SELECT count(*) AS n_customers,
       CAST(sum(x) AS BIGINT) AS total_cents,
       round(CAST(sum((2 * i - n - 1) * x) AS DOUBLE) / (count(*) * sum(x)), 6) AS gini
FROM ranked
"""


def events_sessionized_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ordered funnel at SESSION grain: view → click → purchase must
    complete within one 15-minute-gap session, the product-analytics
    question the user-grain funnel can't answer (a purchase tomorrow
    should not convert today's view). Composition of two existing
    kernels: the lag/cumsum sessionizer (stream_session_builtin's batch
    twin) derives a per-session key, and operators/timeseries.
    funnel_stages runs UNCHANGED with that key as its partition column
    — same single-Exchange window cascade, now keyed by (user,
    session)."""
    from medical_examination_data_etl_system_spark.operators.timeseries import funnel_stages

    ev = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(wu)
    new_sess = (
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) >= 15 * 60 * 1_000_000)
    ).cast("int")
    sess_idx = F.sum(new_sess).over(
        wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_sess = ev.withColumn(
        "_sess", F.concat_ws(":", F.col("user_id").cast("string"), sess_idx.cast("string"))
    )
    return (
        funnel_stages(with_sess, ["view", "click", "purchase"], user_col="_sess")
        .withColumnRenamed("n_users", "n_sessions")
    )


SESSIONIZED_FUNNEL_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_type, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '15 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), s0 AS (
  SELECT user_id, session_id, ts, event_type, event_id,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS f0
  FROM sess
), s1 AS (
  SELECT *, CASE WHEN event_type = 'click' AND f0 < ts THEN ts END AS v1
  FROM s0
), s1m AS (
  SELECT *, min(v1) OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS f1
  FROM s1
), s2 AS (
  SELECT *, CASE WHEN event_type = 'purchase' AND f1 < ts THEN ts END AS v2
  FROM s1m
), per_sess AS (
  SELECT user_id, session_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS s0v,
         min(v1) AS s1v,
         min(v2) AS s2v
  FROM s2
  GROUP BY user_id, session_id
), counts AS (
  SELECT count(s0v) AS n0, count(s1v) AS n1, count(s2v) AS n2 FROM per_sess
)
SELECT * FROM (
  SELECT 0 AS stage_idx, 'view' AS stage, n0 AS n_sessions,
         round(CAST(n0 AS DOUBLE) / n0, 4) AS pct_of_first FROM counts
  UNION ALL
  SELECT 1, 'click', n1, round(CAST(n1 AS DOUBLE) / n0, 4) FROM counts
  UNION ALL
  SELECT 2, 'purchase', n2, round(CAST(n2 AS DOUBLE) / n0, 4) FROM counts
)
ORDER BY stage_idx
"""


def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness ratio per day — the
    engagement KPI. Trailing-window DISTINCT is the trap here: a naive
    count(DISTINCT) over a RANGE frame re-scans each day's users 7
    times AND holds per-window distinct state. Instead each distinct
    (user, day) pair explodes into the ≤7 window-days it covers and a
    plain distinct count per window-day does the rest — the exploded
    frame is bounded by 7 × |distinct (user, day)| (activity-bounded,
    not event-bounded) and every stage is a map-side-combinable
    aggregate."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    spread = ud.select(
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("wday"), "user_id"
    ).distinct()
    wau = spread.groupBy(F.col("wday").alias("day")).agg(F.count(F.lit(1)).alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias("stickiness"),
        )
        .orderBy("day")
    )


DAU_WAU_SQL = """
WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
spread AS (
  SELECT DISTINCT ud.day + s.x AS wday, ud.user_id
  FROM ud CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS x) s
),
wau AS (SELECT wday AS day, count(*) AS wau FROM spread GROUP BY wday)
SELECT d.day, d.dau, w.wau,
       round(CAST(d.dau AS DOUBLE) / w.wau, 4) AS stickiness
FROM dau d JOIN wau w USING (day) ORDER BY day
"""


def orders_price_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of order prices — the robust
    dispersion statistic (stddev's outlier-proof sibling). Two
    value-domain passes in exact integer cents: the global LOWER median
    (smallest value whose doubled cumulative count reaches n — no
    interpolation, no floats), then the lower median of |cents −
    median| over the deviation domain. Each cumulative window runs
    over a distinct-value frame (granularity-bounded), the median
    scalar travels as a broadcast 1-row cross join — no collect, no
    per-row rank. Both cumulative windows ADAPT to the value-domain
    size under the fact-rowcount hint (r11 continuous-value hardening:
    plain window on bounded domains, range-partitioned parallel prefix
    when distinct cents ≈ n)."""
    from medical_examination_data_etl_system_spark.operators.ranking import with_global_prefix

    orders = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    hint = table_rowcount(spark, sf_dir, "orders")

    def lower_median(df: DataFrame, col: str) -> DataFrame:
        counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("_c"))
        # n as an aggregate + broadcast cross join, NOT
        # sum(_c) OVER () — the unpartitioned-total window was itself a
        # single-task pass over the (possibly ~n) distinct-value frame.
        tot = counts.agg(F.sum("_c").alias("_nn"))
        ranked = with_global_prefix(
            counts,
            [F.col(col)],
            rank_col=None,
            running_sums={"_cum": "_c"},
            n_rows_hint=hint,
            small_frame_rows=VALUE_DOMAIN_SMALL_FRAME_ROWS,
        ).crossJoin(F.broadcast(tot))
        return ranked.agg(
            F.min(F.when(2 * F.col("_cum") >= F.col("_nn"), F.col(col))).alias("_med")
        )

    from medical_examination_data_etl_system_spark.operators.cache import persist_tracked

    base = orders.select(cents.alias("_cents"))
    # The 1-row median feeds TWO consumers (the deviation pass and the
    # final select) — pin it, or its whole counts+prefix lineage runs
    # twice (the dominant pass on the continuous-domain corpus).
    med = persist_tracked(
        lower_median(base, "_cents").select(F.col("_med").alias("_med_cents"))
    )
    dev = base.crossJoin(F.broadcast(med)).select(
        F.abs(F.col("_cents") - F.col("_med_cents")).alias("_dev"), "_med_cents"
    )
    mad = lower_median(dev.select("_dev"), "_dev").select(F.col("_med").alias("_mad_cents"))
    return (
        med.crossJoin(F.broadcast(mad))
        .select(
            F.round(F.col("_med_cents") / 100.0, 2).alias("median_price"),
            F.round(F.col("_mad_cents") / 100.0, 2).alias("mad_price"),
        )
    )


MAD_SQL = """
WITH base AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
), c1 AS (
  SELECT cents, count(*) AS c FROM base GROUP BY cents
), r1 AS (
  SELECT cents,
         sum(c) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER () AS n
  FROM c1
), med AS (
  SELECT min(CASE WHEN 2 * cum >= n THEN cents END) AS med_cents FROM r1
), dev AS (
  SELECT abs(b.cents - m.med_cents) AS d FROM base b CROSS JOIN med m
), c2 AS (
  SELECT d, count(*) AS c FROM dev GROUP BY d
), r2 AS (
  SELECT d,
         sum(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER () AS n
  FROM c2
), mad AS (
  SELECT min(CASE WHEN 2 * cum >= n THEN d END) AS mad_cents FROM r2
)
SELECT round(m.med_cents / 100.0, 2) AS median_price,
       round(x.mad_cents / 100.0, 2) AS mad_price
FROM med m CROSS JOIN mad x
"""


def events_session_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution (minutes): sessionize (15-min gap,
    the shared lag/cumsum rule), take each session's integer duration
    in minutes, then EXACT p50/p90 via the value-domain plan — the
    latency-percentile discipline applied to the session KPI every
    engagement dashboard leads with. Duration domain is
    gap-bounded×count-bounded (minutes as integers), so the
    cumulative frame is tiny at any corpus size."""
    ev = load(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(wu)
    new_sess = (
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) >= 15 * 60 * 1_000_000)
    ).cast("int")
    sess_idx = F.sum(new_sess).over(
        wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = (
        ev.withColumn("_sess", sess_idx)
        .groupBy("user_id", "_sess")
        .agg(
            ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / F.lit(60_000_000))
            .cast("long")
            .alias("dur_min"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    counts = sessions.groupBy("dur_min").agg(F.count(F.lit(1)).alias("_c"))
    wo = Window.orderBy("dur_min")
    ranked = counts.select(
        "dur_min",
        F.sum("_c").over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("_cum"),
        F.sum("_c").over(Window.partitionBy()).alias("_n"),
    )
    return ranked.agg(
        F.max("_n").alias("n_sessions"),
        F.min(F.when(2 * F.col("_cum") >= F.col("_n"), F.col("dur_min"))).alias("p50_minutes"),
        F.min(F.when(10 * F.col("_cum") >= 9 * F.col("_n"), F.col("dur_min"))).alias("p90_minutes"),
        F.max("dur_min").alias("max_minutes"),
    )


SESSION_LENGTH_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '15 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), sessions AS (
  -- elapsed whole minutes (floor of elapsed/60s), NOT date_diff: DuckDB's
  -- date_diff('minute') counts minute-BOUNDARY CROSSINGS, which reads one
  -- high whenever the sub-minute offsets wrap (r12: max 804 vs the true
  -- 803 on the jittered 10M-event corpus; driver corpora never hit it)
  SELECT user_id, session_id,
         CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 60000000 AS BIGINT) AS dur_min
  FROM sess GROUP BY user_id, session_id
), counts AS (
  SELECT dur_min, count(*) AS c FROM sessions GROUP BY dur_min
), ranked AS (
  SELECT dur_min,
         sum(c) OVER (ORDER BY dur_min ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER () AS n
  FROM counts
)
SELECT CAST(max(n) AS BIGINT) AS n_sessions,
       min(CASE WHEN 2 * cum >= n THEN dur_min END) AS p50_minutes,
       min(CASE WHEN 10 * cum >= 9 * n THEN dur_min END) AS p90_minutes,
       max(dur_min) AS max_minutes
FROM ranked
"""


def orders_open_backlog_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time by SWEEP-LINE: each order is open
    from its order date until its last line ships; +1/−1 delta events
    at the boundaries, cumulative sum over the date-ordered delta
    frame = concurrent-open count — the interval-stacking pattern
    (room occupancy, concurrent sessions, WIP inventory) WITHOUT
    exploding one row per open day. The delta frame is
    2·orders rows pre-aggregated to distinct dates before the
    cumulative window; sampled at month starts for a bounded report."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    close = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_date"))
    spans = o.join(close, o.o_orderkey == close.l_orderkey, "inner")
    deltas = (
        spans.select(F.col("o_orderdate").alias("day"), F.lit(1).alias("d"))
        .unionByName(
            spans.select(F.date_add("close_date", 1).alias("day"), F.lit(-1).alias("d"))
        )
        .groupBy("day")
        .agg(F.sum("d").alias("delta"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = deltas.withColumn("open_orders", F.sum("delta").over(w))
    month_starts = running.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy(F.date_trunc("month", "day")).orderBy(F.desc("day"))
        ),
    ).filter(F.col("_rn") == 1)
    return (
        month_starts.select(
            F.date_trunc("month", "day").cast("date").alias("month"),
            F.col("open_orders").cast("long").alias("open_at_month_end"),
        )
        .orderBy("month")
    )


BACKLOG_SQL = """
WITH close AS (
  SELECT l_orderkey, max(l_shipdate) AS close_date FROM lineitem GROUP BY l_orderkey
), spans AS (
  SELECT o.o_orderdate, c.close_date
  FROM orders o JOIN close c ON o.o_orderkey = c.l_orderkey
), deltas AS (
  SELECT day, CAST(sum(d) AS BIGINT) AS delta FROM (
    SELECT CAST(o_orderdate AS DATE) AS day, 1 AS d FROM spans
    UNION ALL
    SELECT CAST(close_date AS DATE) + 1 AS day, -1 AS d FROM spans
  ) GROUP BY day
), running AS (
  SELECT day, sum(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS open_orders
  FROM deltas
), month_last AS (
  SELECT *, row_number() OVER (PARTITION BY date_trunc('month', day)
                               ORDER BY day DESC) AS rn
  FROM running
)
SELECT CAST(date_trunc('month', day) AS DATE) AS month,
       CAST(open_orders AS BIGINT) AS open_at_month_end
FROM month_last WHERE rn = 1
ORDER BY month
"""


def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — the revenue sibling of the
    events retention cohorts: customers cohorted by FIRST-order year,
    cumulative exact-cents revenue by years-since-first, averaged per
    cohort member. Output is cohort×age bounded (years²); every sum is
    BIGINT cents, the per-customer division mirrored once at the
    end."""
    orders = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    first = orders.groupBy("o_custkey").agg(
        F.year(F.min("o_orderdate")).cast("int").alias("cohort")
    )
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_customers"))
    rev = (
        orders.join(first, "o_custkey")
        .groupBy("cohort", (F.year("o_orderdate") - F.col("cohort")).cast("int").alias("age_years"))
        .agg(F.sum(cents).alias("rev_cents"))
    )
    w = Window.partitionBy("cohort").orderBy("age_years").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = rev.withColumn("cum_cents", F.sum("rev_cents").over(w))
    return (
        cum.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age_years",
            "cum_cents",
            F.round(
                (F.col("cum_cents").cast("double") / 100.0) / F.col("n_customers"), 2
            ).alias("ltv_per_customer"),
        )
        .orderBy("cohort", "age_years")
    )


COHORT_LTV_SQL = """
WITH first AS (
  SELECT o_custkey, CAST(year(min(o_orderdate)) AS INTEGER) AS cohort
  FROM orders GROUP BY o_custkey
), sizes AS (
  SELECT cohort, count(*) AS n_customers FROM first GROUP BY cohort
), rev AS (
  SELECT f.cohort,
         CAST(year(o.o_orderdate) - f.cohort AS INTEGER) AS age_years,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders o JOIN first f USING (o_custkey)
  GROUP BY 1, 2
), cum AS (
  SELECT cohort, age_years, rev_cents,
         sum(rev_cents) OVER (PARTITION BY cohort ORDER BY age_years
                              ROWS UNBOUNDED PRECEDING) AS cum_cents
  FROM rev
)
SELECT c.cohort, c.age_years, CAST(c.cum_cents AS BIGINT) AS cum_cents,
       round((CAST(c.cum_cents AS DOUBLE) / 100.0) / s.n_customers, 2)
         AS ltv_per_customer
FROM cum c JOIN sizes s USING (cohort)
ORDER BY cohort, age_years
"""


def lineitem_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules: support / confidence / lift
    for part-bucket pairs co-occurring in an order — the
    frequent-itemset primitive (PMI's retail sibling, lift instead of
    log-ratio). Item alphabet quantizes to 25 buckets so the pair
    frame is alphabet²-bounded; pair generation is the same-order
    self-join whose volume is Σ|basket|² with TPC-H's ≤7-line orders.
    All counts are exact BIGINTs; the three ratios divide once each,
    mirrored (integer products stay under 2⁵³ so the doubles are
    exact)."""
    from medical_examination_data_etl_system_spark.operators.cache import persist_tracked

    li = load(spark, sf_dir, "lineitem")
    # persisted: feeds the total-orders aggregate, the per-item counts,
    # and both sides of the pair self-join — one distinct shuffle total
    basket = persist_tracked(
        li.select("l_orderkey", (F.col("l_partkey") % 25).cast("int").alias("item"))
        .distinct()
    )
    # total-order count rides as a broadcast 1-row aggregate — zero
    # driver actions at construction (the bloom-sizing ADVICE class)
    n_orders_df = basket.agg(F.countDistinct("l_orderkey").alias("_N"))
    item_n = basket.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a, b = basket.alias("a"), basket.alias("b")
    pair_n = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = item_n.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))
    nb = item_n.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))
    return (
        pair_n.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .crossJoin(F.broadcast(n_orders_df))
        .filter(F.col("n_ab") >= 5)
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("_N"), 4).alias("support"),
            F.round(F.col("n_ab").cast("double") / F.col("n_a"), 4).alias("confidence"),
            F.round(
                (F.col("n_ab") * F.col("_N")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                4,
            ).alias("lift"),
        )
        .orderBy("item_a", "item_b")
    )


BASKET_LIFT_SQL = """
WITH basket AS (
  SELECT DISTINCT l_orderkey, CAST(l_partkey % 25 AS INTEGER) AS item FROM lineitem
), n_orders AS (
  SELECT count(DISTINCT l_orderkey) AS n FROM basket
), item_n AS (
  SELECT item, count(*) AS n_item FROM basket GROUP BY item
), pair_n AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.item < b.item
  GROUP BY 1, 2
)
SELECT p.item_a, p.item_b, p.n_ab,
       round(CAST(p.n_ab AS DOUBLE) / o.n, 4) AS support,
       round(CAST(p.n_ab AS DOUBLE) / na.n_item, 4) AS confidence,
       round(CAST(p.n_ab * o.n AS DOUBLE) / CAST(na.n_item * nb.n_item AS DOUBLE), 4)
         AS lift
FROM pair_n p
JOIN item_n na ON na.item = p.item_a
JOIN item_n nb ON nb.item = p.item_b
CROSS JOIN n_orders o
WHERE p.n_ab >= 5
ORDER BY p.item_a, p.item_b
"""


def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days — the classic island detector (day − dense_rank is constant
    within a consecutive run). All windows partition BY USER over the
    distinct (user, day) frame (activity-bounded), so parallelism is
    user-count-wide; summarized as the streak-length distribution so
    the output stays bounded."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    wu = Window.partitionBy("user_id").orderBy("day")
    islanded = ud.withColumn(
        "_island", F.date_sub(F.col("day"), F.dense_rank().over(wu))
    )
    streaks = islanded.groupBy("user_id", "_island").agg(
        F.count(F.lit(1)).alias("_len")
    )
    per_user = streaks.groupBy("user_id").agg(F.max("_len").alias("max_streak"))
    return (
        per_user.groupBy("max_streak")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("max_streak")
    )


STREAKS_SQL = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
islanded AS (
  SELECT user_id, day,
         day - CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
           AS island
  FROM ud
), streaks AS (
  SELECT user_id, island, count(*) AS len FROM islanded GROUP BY user_id, island
), per_user AS (
  SELECT user_id, max(len) AS max_streak FROM streaks GROUP BY user_id
)
SELECT max_streak, count(*) AS n_users
FROM per_user GROUP BY max_streak ORDER BY max_streak
"""


def lineitem_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): the (price, quantity) points no
    other point dominates (≤ on both, < on at least one) — the
    multi-criteria shortlist operator. NOT the O(n²) NOT-EXISTS form:
    prices collapse to their min quantity first (ties on price keep
    only the best quantity — a dominated-by-equal-price point can
    never be on the frontier), then one running strict-min over the
    price-ordered DISTINCT-price frame keeps exactly the points whose
    quantity beats every cheaper point. Value-domain-bounded like the
    percentile family — and hardened the same way (r11): the running
    strict-min over the distinct-PRICE frame degenerates to ~n rows on
    a continuous price domain, so it routes through the adaptive
    prefix operator's exclusive-running-min under the fact-rowcount
    hint (plain window on bounded domains, range-partitioned
    least-of-cummin-and-offset past 1M distinct). The oracle replays
    the identical formulation (the naive dominance join would be
    3.6e9 pairs at sf0.01)."""
    from medical_examination_data_etl_system_spark.operators.ranking import with_global_prefix

    li = load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    per_price = li.select(cents.alias("price_cents"), qty.alias("qty")).groupBy(
        "price_cents"
    ).agg(F.min("qty").alias("min_qty"))
    frontier = with_global_prefix(
        per_price,
        [F.col("price_cents")],
        rank_col=None,
        running_mins_excl={"_prev_best": "min_qty"},
        n_rows_hint=table_rowcount(spark, sf_dir, "lineitem"),
        small_frame_rows=VALUE_DOMAIN_SMALL_FRAME_ROWS,
    ).filter(
        F.col("_prev_best").isNull() | (F.col("min_qty") < F.col("_prev_best"))
    )
    return frontier.select(
        "price_cents", F.col("min_qty").alias("qty")
    ).orderBy("price_cents")


SKYLINE_SQL = """
WITH per_price AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
         min(CAST(round(l_quantity) AS BIGINT)) AS min_qty
  FROM lineitem GROUP BY 1
), ranked AS (
  SELECT price_cents, min_qty,
         min(min_qty) OVER (ORDER BY price_cents
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_best
  FROM per_price
)
SELECT price_cents, min_qty AS qty
FROM ranked
WHERE prev_best IS NULL OR min_qty < prev_best
ORDER BY price_cents
"""


def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIVACY audit before data release: k-anonymity of the customer
    table under the quasi-identifier (nation, market segment, account-
    balance bucket) — how many customers sit in QI groups smaller than
    k=5 (re-identifiable), and how much GENERALIZATION (coarsening the
    balance bucket 1000→5000) repairs it. The standard governance
    check, and the generalization column is the standard fix, shown as
    one report per (nation, segment).

    Exact-cents bucketing (round(acctbal·100) → integer floor-division
    by the bucket width) so both engines draw identical bucket edges.
    Two bounded aggregations over a map-only base — group counts are
    QI-domain-bounded, never row-scaled."""
    cust = load(spark, sf_dir, "customer")
    base = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )

    def risk(bucket_cents: int, suffix: str) -> DataFrame:
        g = (
            base.withColumn("bal_b", F.floor(F.col("cents") / F.lit(float(bucket_cents))))
            .groupBy("c_nationkey", "c_mktsegment", "bal_b")
            .agg(F.count(F.lit(1)).alias("sz"))
        )
        return g.groupBy("c_nationkey", "c_mktsegment").agg(
            F.count(F.lit(1)).alias(f"n_groups_{suffix}"),
            F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0)).alias(
                f"at_risk_{suffix}"
            ),
            F.sum("sz").alias(f"_n_{suffix}"),
        )

    fine = risk(100_000, "fine")  # $1000 buckets
    coarse = risk(500_000, "coarse")  # $5000 buckets
    return (
        fine.join(coarse, ["c_nationkey", "c_mktsegment"])
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("_n_fine").alias("n_customers"),
            "n_groups_fine",
            "at_risk_fine",
            F.round(F.col("at_risk_fine") / F.col("_n_fine"), 4).alias("risk_share_fine"),
            "n_groups_coarse",
            "at_risk_coarse",
            F.round(F.col("at_risk_coarse") / F.col("_n_coarse"), 4).alias(
                "risk_share_coarse"
            ),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


K_ANONYMITY_SQL = """
WITH base AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
), fine_g AS (
  SELECT c_nationkey, c_mktsegment, floor(cents / 100000.0) AS bal_b, count(*) AS sz
  FROM base GROUP BY 1, 2, 3
), fine AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(count(*) AS BIGINT) AS n_groups_fine,
         CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS at_risk_fine,
         CAST(sum(sz) AS BIGINT) AS n_customers
  FROM fine_g GROUP BY 1, 2
), coarse_g AS (
  SELECT c_nationkey, c_mktsegment, floor(cents / 500000.0) AS bal_b, count(*) AS sz
  FROM base GROUP BY 1, 2, 3
), coarse AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(count(*) AS BIGINT) AS n_groups_coarse,
         CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS at_risk_coarse,
         CAST(sum(sz) AS BIGINT) AS _nc
  FROM coarse_g GROUP BY 1, 2
)
SELECT f.c_nationkey, f.c_mktsegment, f.n_customers,
       f.n_groups_fine, f.at_risk_fine,
       round(CAST(f.at_risk_fine AS DOUBLE) / f.n_customers, 4) AS risk_share_fine,
       c.n_groups_coarse, c.at_risk_coarse,
       round(CAST(c.at_risk_coarse AS DOUBLE) / c._nc, 4) AS risk_share_coarse
FROM fine f JOIN coarse c USING (c_nationkey, c_mktsegment)
ORDER BY f.c_nationkey, f.c_mktsegment
"""


def orders_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOCORRELATION of the daily-revenue series at lags 1–7 — the
    seasonality diagnostic run before choosing a forecast model (a
    weekly cycle shows as a lag-7 peak). Pearson r computed from EXACT
    integer moments: daily revenue in exact cents, all six sums
    (n, Σx, Σy, Σxy, Σxx, Σyy) accumulated in decimal(38,0) —
    order-independent — and the float enters ONCE per lag in the final
    closed form, rounded to 4. Identical algebra in DuckDB (HUGEINT).

    Scale shape: the fact table collapses to one row per day in the
    first aggregate; the day index, the 7-lag fan-out, the self-join
    and the per-lag moments all run on the day domain (time-bounded at
    any corpus size — the value-domain discipline)."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy("day")
    idx = daily.select("cents", F.row_number().over(w).alias("i"))
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = idx.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("i") - F.col("lag")).alias("j"), F.col("cents").alias("x")
    )
    b = idx.select(F.col("i").alias("j"), F.col("cents").alias("y"))
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    m = (
        a.join(b, "j")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(dx).alias("sx"),
            F.sum(dy).alias("sy"),
            F.sum(dx * dy).alias("sxy"),
            F.sum(dx * dx).alias("sxx"),
            F.sum(dy * dy).alias("syy"),
        )
    )
    cov = (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    # Zero-variance guard (ADVICE r7): a constant window at some lag
    # (vx·vy = 0) yields NULL acf on both engines instead of an
    # engine-divergent 0/0.
    return (
        m.select(
            "lag",
            "n_pairs",
            F.when(vx * vy > 0, F.round(cov / F.sqrt(vx * vy), 4)).alias("acf"),
        )
        .orderBy("lag")
    )


REVENUE_ACF_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), idx AS (
  SELECT cents, row_number() OVER (ORDER BY day) AS i FROM daily
), pairs AS (
  SELECT l.lag, a.cents AS x, b.cents AS y
  FROM idx a
  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
  JOIN idx b ON b.i = a.i - l.lag
), m AS (
  SELECT lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag, n_pairs,
       CASE WHEN CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                 * CAST(n_pairs * syy - sy * sy AS DOUBLE) > 0
            THEN round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                              * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 4)
       END AS acf
FROM m
ORDER BY lag
"""


def customer_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVIVAL ANALYSIS in-engine: the Kaplan-Meier estimator of
    time-to-next-order, with right-censoring done properly — every
    inter-order gap is an event interval, and each customer's tail
    (last order → corpus end) enters as a CENSORED interval instead of
    being dropped, the statistical point of KM. Emits the survival
    curve S(t) at each distinct event time ≤ 120 days with risk-set
    sizes — the repurchase-curve report a retention team reads.

    Scale shape: per-customer lead() builds intervals (partitioned
    window); intervals collapse to the distinct-gap-day DOMAIN (≤ max
    gap, time-bounded) in one aggregate; risk sets and the product-
    limit both run as windows over that domain (allowlisted bounded
    frame). The KM product is exp(Σ ln(1−d/n)) over a FIXED ascending
    order, so both engines add identical doubles in identical order —
    deterministic, rounded to 4."""
    orders = load(spark, sf_dir, "orders")
    base = orders.select("o_custkey", F.to_date("o_orderdate").alias("day"))
    mx = base.agg(F.max("day").alias("max_day"))
    w = Window.partitionBy("o_custkey").orderBy("day")
    iv = (
        base.withColumn("nxt", F.lead("day").over(w))
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(F.col("nxt").isNotNull(), F.datediff("nxt", "day"))
            .otherwise(F.datediff("max_day", "day"))
            .alias("t"),
            F.when(F.col("nxt").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    per_t = iv.groupBy("t").agg(
        F.sum("ev").alias("d"),
        F.sum(1 - F.col("ev")).alias("c"),
    )
    total = iv.agg(F.count(F.lit(1)).alias("n_total"))
    wt = Window.orderBy("t")
    prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    curve = (
        per_t.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_total") - F.coalesce(F.sum(F.col("d") + F.col("c")).over(prior), F.lit(0)),
        )
        .withColumn(
            # the terminal row can have d == n_risk (everyone at risk
            # dies): its factor is exactly 0, outside ln — contribute 0
            # to the log-sum and pin surv to 0 on that row instead.
            "_term",
            F.when(F.col("d") < F.col("n_risk"), F.log(1.0 - F.col("d") / F.col("n_risk"))).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "surv",
            F.when(F.col("d") >= F.col("n_risk"), F.lit(0.0)).otherwise(
                F.round(
                    F.exp(F.sum("_term").over(wt.rowsBetween(Window.unboundedPreceding, 0))),
                    4,
                )
            ),
        )
    )
    return (
        curve.filter((F.col("d") > 0) & (F.col("t") <= 120))
        .select("t", "n_risk", "d", "c", "surv")
        .orderBy("t")
    )


SURVIVAL_KM_SQL = """
WITH base AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day FROM orders
), mx AS (
  SELECT max(day) AS max_day FROM base
), iv AS (
  SELECT CASE WHEN nxt IS NOT NULL THEN date_diff('day', day, nxt)
              ELSE date_diff('day', day, max_day) END AS t,
         CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM (SELECT day, lead(day) OVER (PARTITION BY o_custkey ORDER BY day) AS nxt
        FROM base) CROSS JOIN mx
), per_t AS (
  SELECT t, CAST(sum(ev) AS BIGINT) AS d, CAST(sum(1 - ev) AS BIGINT) AS c
  FROM iv GROUP BY t
), total AS (
  SELECT count(*) AS n_total FROM iv
), risk AS (
  SELECT t, d, c,
         n_total - coalesce(sum(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM per_t CROSS JOIN total
), curve AS (
  SELECT t, d, c, n_risk,
         CASE WHEN d >= n_risk THEN 0.0 ELSE
           round(exp(sum(CASE WHEN d < n_risk THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk) ELSE 0.0 END)
                 OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 4)
         END AS surv
  FROM risk
)
SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d, c, surv
FROM curve
WHERE d > 0 AND t <= 120
ORDER BY t
"""


def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOT/SPAM traffic audit — the behavioral filter a training-data
    pipeline runs before trusting clickstream-derived labels: per user,
    event volume, request rate, and the REGULARITY of inter-arrival
    gaps (coefficient of variation — machine traffic is too regular,
    cv ≪ 1, where human/Poisson traffic has cv ≈ 1). Flags
    `too_regular` (cv < 0.3), `too_fast` (> 60 events/active-hour),
    and the `is_bot` union.

    Gap moments accumulate as exact integers (unix-second gaps,
    Σ and Σ² in decimal(38,0)): cv = √(n·Σxx − Σx²)/Σx and the rate
    are exact-integer algebra with ONE float entry each, rounded to 4
    — both engines agree bit-for-bit. One partitioned lag window over
    events, one per-user aggregate; nothing global.

    Zero-span guard (ADVICE r7): a user whose events all land in the
    same truncated second has Σgap = 0 — rate and cv are NULL on both
    engines (F.when(sx > 0) here, NULLIF(sx, 0) in the oracle) instead
    of a data-dependent ANSI divide error / engine-divergent ∞."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("et")
    )
    w = Window.partitionBy("user_id").orderBy("et", "event_id")
    gaps = ev.withColumn("gap", F.col("et") - F.lag("et").over(w)).filter(
        F.col("gap").isNotNull()
    )
    dg = F.col("gap").cast("decimal(38,0)")
    m = gaps.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),
        F.count(F.lit(1)).alias("n"),
        F.sum(dg).alias("sx"),
        F.sum(dg * dg).alias("sxx"),
    )
    var_num = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    pos_span = F.col("sx") > 0
    rate = F.when(
        pos_span, F.round(F.col("n_events") * 3600.0 / F.col("sx").cast("double"), 4)
    )
    cv = F.when(pos_span, F.round(F.sqrt(var_num) / F.col("sx").cast("double"), 4))
    out = m.select(
        "user_id",
        "n_events",
        F.col("sx").cast("long").alias("span_s"),
        F.round(F.col("sx").cast("double") / F.col("n"), 4).alias("mean_gap_s"),
        cv.alias("gap_cv"),
        rate.alias("events_per_hour"),
    ).select(
        "*",
        (F.col("gap_cv") < 0.3).alias("too_regular"),
        (F.col("events_per_hour") > 60.0).alias("too_fast"),
    )
    return out.withColumn(
        "is_bot", F.col("too_regular") | F.col("too_fast")
    ).orderBy("user_id")


BOT_DETECTION_SQL = """
WITH g AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS gap
  FROM events
), m AS (
  SELECT user_id,
         CAST(count(*) + 1 AS BIGINT) AS n_events,
         count(*) AS n,
         sum(CAST(gap AS HUGEINT)) AS sx,
         sum(CAST(gap AS HUGEINT) * gap) AS sxx
  FROM g WHERE gap IS NOT NULL
  GROUP BY user_id
), s AS (
  SELECT user_id, n_events,
         CAST(sx AS BIGINT) AS span_s,
         round(CAST(sx AS DOUBLE) / n, 4) AS mean_gap_s,
         round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               / NULLIF(CAST(sx AS DOUBLE), 0), 4) AS gap_cv,
         round(n_events * 3600.0 / NULLIF(CAST(sx AS DOUBLE), 0), 4) AS events_per_hour
  FROM m
)
SELECT *,
       (too_regular OR too_fast) AS is_bot
FROM (SELECT *, gap_cv < 0.3 AS too_regular, events_per_hour > 60.0 AS too_fast FROM s)
ORDER BY user_id
"""


def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK PREDICTION by common-neighbor counting — the classic
    graph-ML baseline: the top-10 NON-adjacent part pairs sharing the
    most co-purchase wedge centers (the "customers also bought" pairs
    most likely to become edges). Two scale guards, both part of the
    query's DEFINITION so the oracle replays them exactly: an explicit
    degree cap (256) on wedge centers — the hub-exclusion bound that
    keeps per-center fan-out ≤ cap² under any skew — and a
    deterministic md5 CENTER SAMPLE (1-in-5): wedge volume is Σdeg²
    over centers, the one quantity in this battery that grows with
    graph size times density, and center sampling is the standard
    unbiased estimator (each pair's expected sampled count = common/5;
    the top of the ranking is preserved by concentration). `common_w`
    is therefore the SAMPLED wedge count — the DuckDB oracle draws the
    identical sample, so the gate is still exact-hash. Candidate pairs
    anti-join the edge set, top-10 via TakeOrdered, ranks post-limit."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return _link_prediction(li, center_sample_mod=5)


def _link_prediction(li: DataFrame, center_sample_mod: int | None) -> DataFrame:
    from medical_examination_data_etl_system_spark.operators.cache import persist_tracked
    from medical_examination_data_etl_system_spark.operators.curation import hash_bucket

    a, b = li.alias("a"), li.alias("b")
    # persisted: the distinct co-purchase edge set feeds the adjacency
    # union (twice), the degree count, and the final anti-join — four
    # consumers of one expensive self-join + distinct.
    und = persist_tracked(
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    adj = und.select(F.col("u").alias("c"), F.col("v").alias("n")).unionByName(
        und.select(F.col("v").alias("c"), F.col("u").alias("n"))
    )
    # r13: the degree cap rides inline via one count window over c (the
    # triangle/pagerank degree discipline) instead of a degree groupBy
    # joined back onto the adjacency — one exchange instead of two plus
    # a join. The capped frame is then PERSISTED: it is both sides of
    # the wedge self-join below, and the window leaves it clustered
    # (and sorted) by c, so the self-join reads the cache twice with
    # ZERO further exchanges. Measured 12.1 → 7.3 s at sf0.1 (warm
    # min-of-3 pair), top-10 bit-identical.
    small = (
        adj.withColumn("_d", F.count(F.lit(1)).over(Window.partitionBy("c")))
        .filter(F.col("_d") <= 256)
        .drop("_d")
    )
    if center_sample_mod is not None:
        small = small.filter(hash_bucket(F.col("c"), center_sample_mod) == 0)
    small = persist_tracked(small)
    # Wedge generation stays a center-keyed SELF-JOIN deliberately: an
    # itemCF-style per-center array pair-generation was built, measured
    # and REJECTED in r10 — at the 256-cap this graph's centers carry
    # ~120-256 neighbors, so the HOF projection materializes up-to-32k-
    # struct arrays per row and lost 1.4× at sf0.1 (14.5 vs 10.1 s)
    # while gaining only ~5% at the adversarial 100× graph (598.8 vs
    # 631.1 s idle, same VM). The pair stage is answer-bound either way
    # (2.69e9 distinct sampled wedge pairs at 100×, profiled r10); the
    # streaming hash join wins where groups are large — the array idiom
    # wins where groups are small (itemCF's ≤64 baskets).
    wa, wb = small.alias("wa"), small.alias("wb")
    pairs = (
        wa.join(
            wb,
            (F.col("wa.c") == F.col("wb.c")) & (F.col("wa.n") < F.col("wb.n")),
        )
        .groupBy(F.col("wa.n").alias("u"), F.col("wb.n").alias("v"))
        .agg(F.count(F.lit(1)).alias("common_w"))
    )
    cand = pairs.join(und, ["u", "v"], "left_anti")
    top = cand.orderBy(F.desc("common_w"), F.asc("u"), F.asc("v")).limit(10)
    w = Window.orderBy(F.desc("common_w"), F.asc("u"), F.asc("v"))
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("int"))
        .select("rnk", "u", "v", "common_w")
        .orderBy("rnk")
    )


LINK_PREDICTION_SQL = """
WITH und AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), adj AS (
  SELECT u AS c, v AS n FROM und UNION ALL SELECT v, u FROM und
), deg AS (
  SELECT c, count(*) AS d FROM adj GROUP BY c
), small AS (
  SELECT a.c, a.n FROM adj a JOIN deg USING (c)
  WHERE d <= 256
    AND (('0x' || substr(md5(CAST(a.c AS VARCHAR)), 1, 8))::BIGINT % 5) = 0
), pairs AS (
  SELECT wa.n AS u, wb.n AS v, CAST(count(*) AS BIGINT) AS common_w
  FROM small wa JOIN small wb ON wa.c = wb.c AND wa.n < wb.n
  GROUP BY 1, 2
), cand AS (
  SELECT p.* FROM pairs p ANTI JOIN und e ON p.u = e.u AND p.v = e.v
)
SELECT CAST(rnk AS INTEGER) AS rnk, u, v, common_w
FROM (SELECT *, row_number() OVER (ORDER BY common_w DESC, u, v) AS rnk FROM cand)
WHERE rnk <= 10
ORDER BY rnk
"""


def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORENSIC data-quality audit: first-significant-digit
    distribution of order totals vs Benford's law — the fraud/
    fabrication screen auditors run on financial facts. Per digit
    1–9: observed count, observed share, Benford expectation
    log10(1+1/d), and the signed deviation; plus the chi-square
    statistic replicated onto every row (the single-number verdict).

    First digit extracted by STRING algebra on exact cents (no float
    log-floor edge cases): substring of the cents cast. One map +
    one 9-key aggregate; Benford constants enter as exact literals,
    shares round to 4."""
    orders = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    digits = orders.select(
        F.substring(F.abs(cents).cast("string"), 1, 1).cast("int").alias("digit")
    ).filter(F.col("digit") >= 1)
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("n_total"))
    scored = obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("n_total"), 4).alias("obs_share"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 4).alias("benford_share"),
    )
    scored = scored.withColumn(
        "deviation", F.round(F.col("obs_share") - F.col("benford_share"), 4)
    )
    chi = scored.crossJoin(F.broadcast(tot)).select(
        (
            (F.col("obs_share") - F.col("benford_share"))
            * (F.col("obs_share") - F.col("benford_share"))
            / F.col("benford_share")
            * F.col("n_total")
        ).alias("_c")
    ).agg(F.round(F.sum("_c"), 4).alias("chi_square"))
    return (
        scored.crossJoin(F.broadcast(chi))
        .select("digit", "n", "obs_share", "benford_share", "deviation", "chi_square")
        .orderBy("digit")
    )


BENFORD_SQL = """
WITH digits AS (
  SELECT CAST(substr(CAST(abs(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
), obs AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits WHERE digit >= 1 GROUP BY digit
), tot AS (
  SELECT sum(n) AS n_total FROM obs
), scored AS (
  SELECT digit, n,
         round(CAST(n AS DOUBLE) / n_total, 4) AS obs_share,
         round(log10(1.0 + 1.0 / digit), 4) AS benford_share
  FROM obs CROSS JOIN tot
), chi AS (
  SELECT round(sum((obs_share - benford_share) * (obs_share - benford_share)
                   / benford_share * n_total), 4) AS chi_square
  FROM scored CROSS JOIN tot
)
SELECT digit, n, obs_share, benford_share,
       round(obs_share - benford_share, 4) AS deviation, chi_square
FROM scored CROSS JOIN chi
ORDER BY digit
"""


# Poisson(1) inverse-CDF thresholds (cumulative, exact literals shared
# by both engines): P(K<=k) for k = 0..5; weights cap at 6.
_POIS_CDF = [0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
             0.9810118431238462, 0.9963401531726563, 0.9994058151824183]


def orders_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The POISSON BOOTSTRAP — the resampling method that actually
    works on distributed data (per-element independent Poisson(1)
    weights instead of a global multinomial draw): a 95% CI for MEAN
    DAILY REVENUE from 100 deterministic replicates. Uniforms come
    from md5(day, replicate) (the engine-independent hash convention)
    and map through exact Poisson(1) inverse-CDF literal thresholds,
    so both engines draw byte-identical weight matrices; replicate
    means use exact integer cents sums; the CI takes the 3rd and 98th
    order statistics of the 100 replicate means by explicit
    row_number (no quantile-definition ambiguity).

    Scale shape: the fact table collapses to day rows first; the
    100-replicate fan-out, weighting, and order statistics all run on
    the bounded day×replicate domain."""
    from medical_examination_data_etl_system_spark.operators.curation import hash_bucket

    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    reps = spark.range(1, 101).select(F.col("id").cast("int").alias("rep"))
    u = hash_bucket(
        F.concat(F.col("day").cast("string"), F.lit("#"), F.col("rep").cast("string")),
        1_000_000,
    ) / 1_000_000.0
    wexpr = F.lit(6)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        wexpr = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(wexpr)
    weighted = daily.crossJoin(F.broadcast(reps)).select(
        "rep", wexpr.alias("w"), "cents"
    )
    # All-zero-weight replicate guard (ADVICE r7): Poisson(1) draws of
    # all-zero weights are astronomically rare but would hit an ANSI
    # divide-by-zero; such replicates are dropped identically on both
    # engines (HAVING sum(w) > 0 in the oracle).
    means = (
        weighted.groupBy("rep")
        .agg(
            F.sum(F.col("w") * F.col("cents")).cast("double").alias("num"),
            F.sum("w").alias("den"),
        )
        .filter(F.col("den") > 0)
        .select((F.col("num") / F.col("den")).alias("m"))
    )
    from pyspark.sql import Window

    wn = Window.orderBy("m")
    ranked = means.select("m", F.row_number().over(wn).alias("r"))
    point = daily.agg((F.sum("cents").cast("double") / F.count(F.lit(1))).alias("point"))
    ci = ranked.filter(F.col("r").isin(3, 98)).groupBy().agg(
        F.round(F.min("m"), 2).alias("ci_lo"),
        F.round(F.max("m"), 2).alias("ci_hi"),
    )
    return (
        point.crossJoin(F.broadcast(ci))
        .select(
            F.lit("mean_daily_revenue_cents").alias("metric"),
            F.round("point", 2).alias("point"),
            "ci_lo",
            "ci_hi",
            F.lit(100).cast("int").alias("n_replicates"),
        )
    )


BOOTSTRAP_CI_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), reps AS (
  SELECT CAST(unnest(range(1, 101)) AS INTEGER) AS rep
), u AS (
  SELECT d.day, d.cents, r.rep,
         ((('0x' || substr(md5(CAST(d.day AS VARCHAR) || '#' || CAST(r.rep AS VARCHAR)), 1, 8))::BIGINT % 1000000) / 1000000.0) AS uu
  FROM daily d CROSS JOIN reps r
), w AS (
  SELECT rep, cents,
         CASE WHEN uu < 0.36787944117144233 THEN 0
              WHEN uu < 0.7357588823428847 THEN 1
              WHEN uu < 0.9196986029286058 THEN 2
              WHEN uu < 0.9810118431238462 THEN 3
              WHEN uu < 0.9963401531726563 THEN 4
              WHEN uu < 0.9994058151824183 THEN 5
              ELSE 6 END AS w
  FROM u
), means AS (
  SELECT rep, CAST(sum(w * cents) AS DOUBLE) / sum(w) AS m
  FROM w GROUP BY rep HAVING sum(w) > 0
), ranked AS (
  SELECT m, row_number() OVER (ORDER BY m) AS r FROM means
), ci AS (
  SELECT round(min(m), 2) AS ci_lo, round(max(m), 2) AS ci_hi
  FROM ranked WHERE r IN (3, 98)
), pt AS (
  SELECT CAST(sum(cents) AS DOUBLE) / count(*) AS point FROM daily
)
SELECT 'mean_daily_revenue_cents' AS metric, round(point, 2) AS point,
       ci_lo, ci_hi, CAST(100 AS INTEGER) AS n_replicates
FROM pt CROSS JOIN ci
"""


def orders_churn_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME-CORRECT training-set generation — the leakage
    discipline every churn/propensity model needs and most pipelines
    get wrong: a cutoff at (max date − 180 d) splits time; FEATURES
    (order count, spend, recency, tenure) come STRICTLY from before
    the cutoff, the LABEL (churned = no order within 180 d after)
    strictly from after. Nothing computed on the feature side can see
    the label window — the temporal contract is structural (two
    disjoint date filters), not a convention.

    One broadcast cutoff row; one pre-cutoff per-customer aggregate
    (exact cents); one post-cutoff DISTINCT customer set anti-joined
    for the label. Summarized-at-the-end nothing: the result IS the
    per-customer training table."""
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cut = base.agg(F.date_sub(F.max("day"), 180).alias("cutoff"))
    pre = (
        base.crossJoin(F.broadcast(cut))
        .filter(F.col("day") <= F.col("cutoff"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
            F.max("day").alias("last_order"),
            F.min("day").alias("first_order"),
            F.first("cutoff").alias("cutoff"),
        )
        .select(
            "o_custkey",
            "n_orders",
            "total_cents",
            F.datediff("cutoff", "last_order").alias("recency_d"),
            F.datediff("cutoff", "first_order").alias("tenure_d"),
            "cutoff",
        )
    )
    post = (
        base.crossJoin(F.broadcast(cut))
        .filter(F.col("day") > F.col("cutoff"))
        .select("o_custkey")
        .distinct()
        .withColumn("_active", F.lit(1))
    )
    return (
        pre.join(post, "o_custkey", "left")
        .select(
            "o_custkey",
            "n_orders",
            "total_cents",
            "recency_d",
            "tenure_d",
            F.when(F.col("_active").isNull(), True).otherwise(False).alias("churned"),
        )
        .orderBy("o_custkey")
    )


CHURN_TRAINING_SQL = """
WITH base AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), cut AS (
  -- ::DATE keeps the cutoff in the date domain (ADVICE r7): DuckDB
  -- types day - INTERVAL as TIMESTAMP, Spark's date_sub yields DATE
  SELECT CAST(max(day) - INTERVAL 180 DAY AS DATE) AS cutoff FROM base
), pre AS (
  SELECT o_custkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         CAST(date_diff('day', max(day), (SELECT cutoff FROM cut)) AS INTEGER) AS recency_d,
         CAST(date_diff('day', min(day), (SELECT cutoff FROM cut)) AS INTEGER) AS tenure_d
  FROM base WHERE day <= (SELECT cutoff FROM cut)
  GROUP BY o_custkey
), post AS (
  SELECT DISTINCT o_custkey FROM base WHERE day > (SELECT cutoff FROM cut)
)
SELECT p.o_custkey, p.n_orders, p.total_cents, p.recency_d, p.tenure_d,
       (a.o_custkey IS NULL) AS churned
FROM pre p LEFT JOIN post a ON p.o_custkey = a.o_custkey
ORDER BY p.o_custkey
"""


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM CHANGE-POINT detection on the daily event-count series —
    the monitoring primitive behind drift alarms: the cumulative sum
    of deviations from the global mean peaks (in |·|) at the most
    likely level shift. Emits the 10 largest-|CUSUM| days with their
    running statistic.

    Shape: the fact table collapses to one row per day; mean = exact
    n_events/n_days division; the running sum is sequential over the
    bounded day domain in a FIXED ascending order (identical double
    additions both engines); top-10 via TakeOrdered on |cusum|."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = daily.agg(
        F.sum("cnt").alias("n_events"), F.count(F.lit(1)).alias("n_days")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cus = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn("mean", F.col("n_events") / F.col("n_days"))
        .withColumn("cusum", F.round(F.sum(F.col("cnt") - F.col("mean")).over(w), 4))
    )
    top = cus.orderBy(F.desc(F.abs(F.col("cusum"))), F.asc("day")).limit(10)
    wr = Window.orderBy(F.desc(F.abs(F.col("cusum"))), F.asc("day"))
    return (
        top.withColumn("rnk", F.row_number().over(wr).cast("int"))
        .select("rnk", "day", "cnt", "cusum")
        .orderBy("rnk")
    )


CUSUM_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), tot AS (
  SELECT sum(cnt) AS n_events, count(*) AS n_days FROM daily
), cus AS (
  SELECT day, cnt,
         round(sum(cnt - CAST(n_events AS DOUBLE) / n_days)
               OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cusum
  FROM daily CROSS JOIN tot
)
SELECT CAST(rnk AS INTEGER) AS rnk, day, cnt, cusum
FROM (SELECT *, row_number() OVER (ORDER BY abs(cusum) DESC, day) AS rnk FROM cus)
WHERE rnk <= 10
ORDER BY rnk
"""


def lineitem_winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZATION — the robust-statistics cleaning step before any
    mean-based metric: clamp extended prices at the exact p1/p99 and
    report the effect (raw vs winsorized mean, clip counts). The
    percentiles are TYPE-1 ORDER STATISTICS computed on the VALUE
    DOMAIN (distinct exact-cents values with counts + cumulative
    window — the agg_percentiles_by_flag discipline): the quantile
    definition is explicit (smallest value whose cumulative count
    reaches ceil(q·n)), so both engines pick the identical cent.

    Fact rows are touched twice map-side (value-domain collapse; final
    clamped sum); every window ADAPTS to the distinct-price domain
    (plain bounded-domain window under the fact-rowcount hint; the
    range-partitioned parallel prefix when the domain is ~n — the r11
    continuous-value hardening)."""
    from medical_examination_data_etl_system_spark.operators.ranking import with_global_prefix

    li = load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    vals = li.select(cents.alias("v")).groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    tot = vals.agg(F.sum("c").alias("n"))
    cum = with_global_prefix(
        vals,
        [F.col("v")],
        rank_col=None,
        running_sums={"cum": "c"},
        n_rows_hint=table_rowcount(spark, sf_dir, "lineitem"),
        small_frame_rows=VALUE_DOMAIN_SMALL_FRAME_ROWS,
    ).crossJoin(F.broadcast(tot))
    # Both bounds from ONE conditional aggregation (min-over-filter ≡
    # min-of-when): the separate lo/hi aggregates each re-ran the whole
    # counts+prefix lineage — 2× the dominant pass on the continuous-
    # domain corpus where the distributed prefix is live.
    bounds = cum.agg(
        F.min(F.when(F.col("cum") >= F.ceil(F.col("n") * 0.01), F.col("v"))).alias("lo_cents"),
        F.min(F.when(F.col("cum") >= F.ceil(F.col("n") * 0.99), F.col("v"))).alias("hi_cents"),
    )
    clamped = li.select(cents.alias("v")).crossJoin(F.broadcast(bounds))
    return (
        clamped.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.first("lo_cents").alias("lo_cents"),
            F.first("hi_cents").alias("hi_cents"),
            F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 2).alias("mean_cents"),
            F.round(
                F.sum(F.greatest(F.least(F.col("v"), F.col("hi_cents")), F.col("lo_cents"))).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("winsorized_mean_cents"),
            F.sum(F.when(F.col("v") < F.col("lo_cents"), 1).otherwise(0)).alias("n_clipped_low"),
            F.sum(F.when(F.col("v") > F.col("hi_cents"), 1).otherwise(0)).alias("n_clipped_high"),
        )
    )


WINSORIZE_SQL = """
WITH vals AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v, count(*) AS c
  FROM lineitem GROUP BY 1
), tot AS (
  SELECT sum(c) AS n FROM vals
), cum AS (
  SELECT v, c, n, sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM vals CROSS JOIN tot
), lo AS (
  SELECT min(v) AS lo_cents FROM cum WHERE cum >= ceil(n * 0.01)
), hi AS (
  SELECT min(v) AS hi_cents FROM cum WHERE cum >= ceil(n * 0.99)
), base AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v, lo_cents, hi_cents
  FROM lineitem CROSS JOIN lo CROSS JOIN hi
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(lo_cents) AS BIGINT) AS lo_cents,
       CAST(min(hi_cents) AS BIGINT) AS hi_cents,
       round(CAST(sum(v) AS DOUBLE) / count(*), 2) AS mean_cents,
       round(CAST(sum(greatest(least(v, hi_cents), lo_cents)) AS DOUBLE) / count(*), 2) AS winsorized_mean_cents,
       CAST(sum(CASE WHEN v < lo_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       CAST(sum(CASE WHEN v > hi_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high
FROM base
"""


def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX between the first and second half of
    the event stream, per event_type — the standard tabular-feature
    drift alarm an ML-monitoring pipeline runs next to the embedding
    drift monitor (X184): PSI = Σ_buckets (p_i − q_i)·ln(p_i/q_i) over
    10 value buckets, with +1 Laplace smoothing so empty buckets are
    defined (PSI < 0.1 stable / > 0.25 drifted by the usual rule).

    Exactness: the time midpoint and bucket edges are INTEGER algebra
    (epoch-micros midpoint by integer div; bucket = c·10 div (max_c+1)
    on exact cents), counts are exact, each term enters float once,
    and the cross-bucket sum folds in fixed ascending-bucket order via
    a running window (the CUSUM discipline) so both engines add the
    same doubles in the same order.

    Scale shape: facts collapse map-side to (event_type, half, bucket)
    counts — everything after is on the bounded type×10 domain."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    b = ev.agg(
        F.min("us").alias("mn"), F.max("us").alias("mx"), F.max("c").alias("mc")
    )
    tagged = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.expr("CASE WHEN us <= (mn + mx) div 2 THEN 0 ELSE 1 END").alias("half"),
        F.least(F.expr("(c * 10) div (mc + 1)"), F.lit(9)).alias("bucket"),
    )
    cts = tagged.groupBy("event_type", "half", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    et = ev.select("event_type").distinct()
    spine = et.crossJoin(F.broadcast(spark.range(10).select(F.col("id").alias("bucket"))))
    wide = (
        spine.join(cts, ["event_type", "bucket"], "left")
        .groupBy("event_type", "bucket")
        .agg(
            F.coalesce(F.sum(F.when(F.col("half") == 0, F.col("c"))), F.lit(0)).alias("cref"),
            F.coalesce(F.sum(F.when(F.col("half") == 1, F.col("c"))), F.lit(0)).alias("ccur"),
        )
    )
    tot = cts.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 0, F.col("c")).otherwise(0)).alias("nref"),
        F.sum(F.when(F.col("half") == 1, F.col("c")).otherwise(0)).alias("ncur"),
    )
    p = (F.col("cref") + 1).cast("double") / (F.col("nref") + 10)
    q = (F.col("ccur") + 1).cast("double") / (F.col("ncur") + 10)
    terms = wide.join(tot, "event_type").select(
        "event_type", "bucket", "nref", "ncur", ((p - q) * F.log(p / q)).alias("term")
    )
    w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = terms.select(
        "event_type", "bucket", "nref", "ncur", F.sum("term").over(w).alias("psi")
    )
    return (
        cum.filter(F.col("bucket") == 9)
        .select(
            "event_type",
            F.col("nref").alias("n_ref"),
            F.col("ncur").alias("n_cur"),
            F.round("psi", 4).alias("psi"),
            (F.round("psi", 4) > 0.25).alias("drifted"),
        )
        .orderBy("event_type")
    )


PSI_DRIFT_SQL = """
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS us, CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), b AS (
  SELECT min(us) AS mn, max(us) AS mx, max(c) AS mc FROM ev
), tagged AS (
  SELECT event_type,
         CASE WHEN us <= (mn + mx) // 2 THEN 0 ELSE 1 END AS half,
         least((c * 10) // (mc + 1), 9) AS bucket
  FROM ev CROSS JOIN b
), cts AS (
  SELECT event_type, half, bucket, count(*) AS c FROM tagged GROUP BY 1, 2, 3
), spine AS (
  SELECT event_type, CAST(u.bucket AS BIGINT) AS bucket
  FROM (SELECT DISTINCT event_type FROM ev)
  CROSS JOIN (SELECT unnest(range(0, 10)) AS bucket) u
), wide AS (
  SELECT s.event_type, s.bucket,
         coalesce(sum(CASE WHEN t.half = 0 THEN t.c END), 0) AS cref,
         coalesce(sum(CASE WHEN t.half = 1 THEN t.c END), 0) AS ccur
  FROM spine s LEFT JOIN cts t ON t.event_type = s.event_type AND t.bucket = s.bucket
  GROUP BY 1, 2
), tot AS (
  SELECT event_type,
         sum(CASE WHEN half = 0 THEN c ELSE 0 END) AS nref,
         sum(CASE WHEN half = 1 THEN c ELSE 0 END) AS ncur
  FROM cts GROUP BY 1
), terms AS (
  SELECT w.event_type, w.bucket, t.nref, t.ncur,
         ((CAST(w.cref + 1 AS DOUBLE) / (t.nref + 10))
          - (CAST(w.ccur + 1 AS DOUBLE) / (t.ncur + 10)))
         * ln((CAST(w.cref + 1 AS DOUBLE) / (t.nref + 10))
              / (CAST(w.ccur + 1 AS DOUBLE) / (t.ncur + 10))) AS term
  FROM wide w JOIN tot t USING (event_type)
), cum AS (
  SELECT event_type, bucket, nref, ncur,
         sum(term) OVER (PARTITION BY event_type ORDER BY bucket
                         ROWS UNBOUNDED PRECEDING) AS psi
  FROM terms
)
SELECT event_type,
       CAST(nref AS BIGINT) AS n_ref,
       CAST(ncur AS BIGINT) AS n_cur,
       round(psi, 4) AS psi,
       round(psi, 4) > 0.25 AS drifted
FROM cum WHERE bucket = 9
ORDER BY event_type
"""


def orders_purged_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURGED EXPANDING-WINDOW TIME-SERIES CROSS-VALIDATION folds —
    the split discipline for temporally-leaky training data (finance /
    churn / forecasting): the day domain is cut into 5 equal fifths;
    fold k trains on everything BEFORE fifth k+1 minus a 7-index-day
    PURGE GAP (so label windows that straddle the boundary can't leak
    into training) and tests on fifth k+1. Per fold: day span, order
    count, exact revenue cents, and date ranges for both sides — the
    audit table a pipeline materializes before fitting.

    All integer/date algebra: day indexes from one row_number over the
    DISTINCT day domain (bounded at any corpus size — the value-domain
    discipline; allowlisted unpartitioned window), boundaries by
    integer div, aggregates exact.

    Scale shape: the fact table collapses map-side to ONE row per day
    (count + exact cents) before the fold fan-out, so the 4-fold cross
    join, the role tagging and the final aggregate all run on the
    bounded day domain (the value-domain discipline; joining raw facts
    against the fold map measured 23.4 s at 100× vs ~3 s collapsed)."""
    orders = load(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    per_day = orders.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("dc")
    )
    days = per_day.select("day")
    w = Window.orderBy("day")
    idx = days.select("day", F.row_number().over(w).alias("i"))
    dd = idx.agg(F.max("i").alias("d"))
    folds = spark.range(1, 5).select(F.col("id").cast("int").alias("fold"))
    tagged = (
        idx.crossJoin(F.broadcast(dd))
        .crossJoin(F.broadcast(folds))
        .select(
            "fold",
            "day",
            F.expr(
                "CASE WHEN i > (fold * d) div 5 AND i <= ((fold + 1) * d) div 5"
                "     THEN 'test'"
                "     WHEN i <= (fold * d) div 5 - 7 THEN 'train' END"
            ).alias("role"),
        )
        .filter(F.col("role").isNotNull())
    )
    tr = F.col("role") == "train"
    te = F.col("role") == "test"
    return (
        per_day.join(tagged, "day")
        .groupBy("fold")
        .agg(
            F.sum(F.when(tr, 1).otherwise(0)).cast("long").alias("train_days"),
            F.sum(F.when(tr, F.col("n")).otherwise(0)).cast("long").alias("train_orders"),
            F.sum(F.when(tr, F.col("dc")).otherwise(0)).alias("train_cents"),
            F.min(F.when(tr, F.col("day"))).alias("train_start"),
            F.max(F.when(tr, F.col("day"))).alias("train_end"),
            F.sum(F.when(te, 1).otherwise(0)).cast("long").alias("test_days"),
            F.sum(F.when(te, F.col("n")).otherwise(0)).cast("long").alias("test_orders"),
            F.sum(F.when(te, F.col("dc")).otherwise(0)).alias("test_cents"),
            F.min(F.when(te, F.col("day"))).alias("test_start"),
            F.max(F.when(te, F.col("day"))).alias("test_end"),
        )
        .orderBy("fold")
    )


PURGED_CV_SQL = """
WITH per_day AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS dc
  FROM orders GROUP BY 1
), idx AS (
  SELECT day, row_number() OVER (ORDER BY day) AS i FROM per_day
), dd AS (
  SELECT max(i) AS d FROM idx
), tagged AS (
  SELECT f.fold, x.day,
         CASE WHEN x.i > (f.fold * dd.d) // 5 AND x.i <= ((f.fold + 1) * dd.d) // 5
              THEN 'test'
              WHEN x.i <= (f.fold * dd.d) // 5 - 7 THEN 'train' END AS role
  FROM idx x
  CROSS JOIN dd
  CROSS JOIN (SELECT CAST(unnest(range(1, 5)) AS INTEGER) AS fold) f
)
SELECT t.fold,
       CAST(sum(CASE WHEN t.role = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS train_days,
       CAST(sum(CASE WHEN t.role = 'train' THEN b.n ELSE 0 END) AS BIGINT) AS train_orders,
       CAST(sum(CASE WHEN t.role = 'train' THEN b.dc ELSE 0 END) AS BIGINT) AS train_cents,
       min(CASE WHEN t.role = 'train' THEN t.day END) AS train_start,
       max(CASE WHEN t.role = 'train' THEN t.day END) AS train_end,
       CAST(sum(CASE WHEN t.role = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS test_days,
       CAST(sum(CASE WHEN t.role = 'test' THEN b.n ELSE 0 END) AS BIGINT) AS test_orders,
       CAST(sum(CASE WHEN t.role = 'test' THEN b.dc ELSE 0 END) AS BIGINT) AS test_cents,
       min(CASE WHEN t.role = 'test' THEN t.day END) AS test_start,
       max(CASE WHEN t.role = 'test' THEN t.day END) AS test_end
FROM per_day b JOIN tagged t USING (day)
WHERE t.role IS NOT NULL
GROUP BY t.fold
ORDER BY t.fold
"""


def customer_ipw_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED INVERSE-PROPENSITY-WEIGHTED effect estimate — the
    causal-inference primitive for observational data: "treatment" =
    the customer ever placed a 1-URGENT order, outcome = lifetime
    spend cents, strata = market segment (the confounder proxy).
    Per stratum: n, treated count, exact propensity p̂ = t/n, treated
    and control mean spend, and the stratum effect; plus one OVERALL
    row whose ATE is the n-weighted combination Σ (n_s/N)·(μ̂₁ₛ − μ̂₀ₛ)
    — algebraically the IPW/Horvitz-Thompson estimator with stratum
    propensities.

    Exactness: per-stratum sums are exact cents/counts; each mean is
    one float division; the cross-stratum combination folds in fixed
    ascending-segment order via a running window (the CUSUM
    discipline). Degenerate strata (no treated or no control) are
    excluded identically on both engines. Customers without orders
    count as untreated with zero spend (left join + coalesce).

    Scale shape: orders collapse per-customer map-side; one broadcast
    join against the customer dim; everything after runs on the
    bounded segment domain."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("tr"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y"),
        )
    )
    base = cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left").select(
        "c_mktsegment",
        F.coalesce("tr", F.lit(0)).alias("tr"),
        F.coalesce("y", F.lit(0)).alias("y"),
    )
    s = base.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("tr").cast("long").alias("t"),
        F.sum(F.when(F.col("tr") == 1, F.col("y")).otherwise(0)).alias("y1"),
        F.sum(F.when(F.col("tr") == 0, F.col("y")).otherwise(0)).alias("y0"),
    ).filter((F.col("t") > 0) & (F.col("t") < F.col("n")))
    mu1 = F.col("y1").cast("double") / F.col("t")
    mu0 = F.col("y0").cast("double") / (F.col("n") - F.col("t"))
    strata = s.select(
        F.col("c_mktsegment").alias("stratum"),
        "n",
        F.col("t").alias("n_treated"),
        F.round(F.col("t").cast("double") / F.col("n"), 4).alias("p_hat"),
        F.round(mu1, 2).alias("mean_treated_cents"),
        F.round(mu0, 2).alias("mean_control_cents"),
        F.round(mu1 - mu0, 2).alias("effect_cents"),
    )
    tot = s.agg(F.sum("n").alias("nn"))
    w = Window.orderBy("c_mktsegment").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wn = Window.orderBy("c_mktsegment").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    overall = (
        s.crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            "n",
            "t",
            (F.col("n").cast("double") / F.col("nn") * (mu1 - mu0)).alias("wdiff"),
            F.col("nn"),
        )
        .select(
            F.lit("OVERALL").alias("stratum"),
            F.col("nn").cast("long").alias("n"),
            F.sum("t").over(wn).cast("long").alias("n_treated"),
            F.sum("wdiff").over(w).alias("ate"),
            F.row_number().over(Window.orderBy("c_mktsegment")).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("ns"),
        )
        .filter(F.col("rn") == F.col("ns"))
        .select(
            "stratum",
            "n",
            "n_treated",
            F.lit(None).cast("double").alias("p_hat"),
            F.lit(None).cast("double").alias("mean_treated_cents"),
            F.lit(None).cast("double").alias("mean_control_cents"),
            F.round("ate", 2).alias("effect_cents"),
        )
    )
    return strata.unionByName(overall).orderBy("stratum")


IPW_SPEND_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS tr,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders GROUP BY 1
), base AS (
  SELECT c.c_mktsegment,
         coalesce(p.tr, 0) AS tr,
         coalesce(p.y, 0) AS y
  FROM customer c LEFT JOIN per_cust p ON p.o_custkey = c.c_custkey
), s AS (
  SELECT c_mktsegment,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(tr) AS BIGINT) AS t,
         sum(CASE WHEN tr = 1 THEN y ELSE 0 END) AS y1,
         sum(CASE WHEN tr = 0 THEN y ELSE 0 END) AS y0
  FROM base GROUP BY 1
  HAVING sum(tr) > 0 AND sum(tr) < count(*)
), strata AS (
  SELECT c_mktsegment AS stratum, n, t AS n_treated,
         round(CAST(t AS DOUBLE) / n, 4) AS p_hat,
         round(CAST(y1 AS DOUBLE) / t, 2) AS mean_treated_cents,
         round(CAST(y0 AS DOUBLE) / (n - t), 2) AS mean_control_cents,
         round(CAST(y1 AS DOUBLE) / t - CAST(y0 AS DOUBLE) / (n - t), 2) AS effect_cents
  FROM s
), tot AS (SELECT sum(n) AS nn FROM s), wdiffs AS (
  SELECT c_mktsegment, n, t,
         (CAST(n AS DOUBLE) / nn) * (CAST(y1 AS DOUBLE) / t - CAST(y0 AS DOUBLE) / (n - t)) AS wdiff,
         nn
  FROM s CROSS JOIN tot
), ovr AS (
  -- the running sum's LAST row (rn = ns), not max(cum): a stratum
  -- with negative effect makes the running sum non-monotone
  SELECT 'OVERALL' AS stratum,
         CAST(max(nn) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS n_treated,
         CAST(NULL AS DOUBLE) AS p_hat,
         CAST(NULL AS DOUBLE) AS mean_treated_cents,
         CAST(NULL AS DOUBLE) AS mean_control_cents,
         round(max(CASE WHEN rn = ns THEN cum END), 2) AS effect_cents
  FROM (SELECT t, nn,
               sum(wdiff) OVER (ORDER BY c_mktsegment ROWS UNBOUNDED PRECEDING) AS cum,
               row_number() OVER (ORDER BY c_mktsegment) AS rn,
               count(*) OVER () AS ns
        FROM wdiffs)
)
SELECT * FROM strata
UNION ALL
SELECT * FROM ovr
ORDER BY stratum
"""


def orders_conformal_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL PREDICTION INTERVAL for a seasonal-naive daily
    revenue forecast — distribution-free uncertainty quantification
    (the guarantee: a 90% interval calibrated on exchangeable
    residuals covers ≥90% of future points): forecast ŷ_d = y_{d−7}
    (lag-7 seasonal naive), absolute residuals on the first 80% of
    days calibrate q = the ⌈(n_cal+1)·0.9⌉-th smallest residual
    (finite-sample-corrected exact order statistic), and the held-out
    last 20% reports empirical coverage of ŷ ± q.

    Exact throughout: cents residuals are integers, the quantile is an
    explicit row_number order statistic (no quantile-definition
    ambiguity), coverage is a count ratio with one float entry.

    Scale shape: facts collapse to the day domain first; the lag, the
    calibration ranking, and the coverage check all run on day rows
    (bounded at any corpus size — allowlisted unpartitioned windows).
    The day frame persists once for its four consumers (cal/test/
    count/quantile branches) so the fact scan runs exactly once."""
    from medical_examination_data_etl_system_spark.operators.cache import persist_tracked

    orders = load(spark, sf_dir, "orders")
    daily = persist_tracked(
        orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
        )
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "cents",
        F.lag("cents", 7).over(w).alias("yhat"),
        F.row_number().over(w).alias("i"),
    )
    dd = lagged.agg(F.max("i").alias("d"))
    base = (
        lagged.crossJoin(F.broadcast(dd))
        .filter(F.col("yhat").isNotNull())
        .select(
            "day",
            F.abs(F.col("cents") - F.col("yhat")).alias("r"),
            (F.col("i") <= F.ceil(F.col("d") * 0.8)).alias("is_cal"),
        )
    )
    cal = base.filter(F.col("is_cal"))
    n_cal = cal.agg(F.count(F.lit(1)).alias("n_cal"))
    wr = Window.orderBy("r", "day")
    q = (
        cal.select(F.row_number().over(wr).alias("rn"), "r")
        .crossJoin(F.broadcast(n_cal))
        .filter(F.col("rn") == F.ceil((F.col("n_cal") + 1) * 0.9))
        .select(F.col("r").alias("q_cents"), "n_cal")
    )
    test = base.filter(~F.col("is_cal"))
    return (
        test.crossJoin(F.broadcast(q))
        .agg(
            F.max("n_cal").cast("long").alias("n_cal"),
            F.count(F.lit(1)).alias("n_test"),
            F.max("q_cents").alias("q_cents"),
            F.sum(F.when(F.col("r") <= F.col("q_cents"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
            F.round(
                F.sum(F.when(F.col("r") <= F.col("q_cents"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("coverage"),
        )
    )


CONFORMAL_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), lagged AS (
  SELECT day, cents,
         lag(cents, 7) OVER (ORDER BY day) AS yhat,
         row_number() OVER (ORDER BY day) AS i
  FROM daily
), dd AS (SELECT max(i) AS d FROM lagged), base AS (
  SELECT day, abs(cents - yhat) AS r, i <= ceil(d * 0.8) AS is_cal
  FROM lagged CROSS JOIN dd
  WHERE yhat IS NOT NULL
), cal AS (SELECT * FROM base WHERE is_cal),
n_cal AS (SELECT count(*) AS n_cal FROM cal),
q AS (
  SELECT r AS q_cents, n_cal
  FROM (SELECT r, row_number() OVER (ORDER BY r, day) AS rn FROM cal)
  CROSS JOIN n_cal
  WHERE rn = ceil((n_cal + 1) * 0.9)
)
SELECT CAST(max(n_cal) AS BIGINT) AS n_cal,
       count(*) AS n_test,
       CAST(max(q_cents) AS BIGINT) AS q_cents,
       CAST(sum(CASE WHEN r <= q_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       round(CAST(sum(CASE WHEN r <= q_cents THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
         AS coverage
FROM (SELECT * FROM base WHERE NOT is_cal) CROSS JOIN q
"""


def lineitem_itemcf_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITEM-ITEM COLLABORATIVE FILTERING — the classic recsys
    candidate generator (Amazon-style "bought together"): cosine
    similarity between parts over the order-basket incidence,
    sim(i,j) = cooc(i,j)/√(deg(i)·deg(j)), min support 2, global
    top-10 pairs.

    Cross-engine determinism: the RANKING key is the exact integer
    ⌊cooc²·10¹² / (degᵢ·degⱼ)⌋ (decimal/HUGEINT intermediates, value
    ≤ 10¹² since cooc ≤ min(deg)) with (i, j) tie-break — float cosine
    never decides order (two near-equal cosines could rank differently
    per engine at 1e-16); the displayed cosine is one float entry,
    rounded 4.

    Two scale guards, both part of the query's DEFINITION so the
    oracle replays them exactly (the graph_link_prediction degree-cap
    discipline, VERDICT r8 #5): baskets larger than 64 distinct parts
    are DROPPED before pair enumeration — in the order-part bipartite
    graph the order node's degree is the basket size and per-basket
    fan-out is deg², so the cap bounds it at 64² under any skew (a
    10k-item institutional basket would otherwise emit 5·10⁷ pairs
    from one row) — and part degrees are counted on the capped
    incidence, so cosine stays consistent with the pairs it scores.
    TPC-H baskets hold ≤7 distinct parts, so at this data the cap
    trims nothing and results are identical to the uncapped form.

    Scale shape: ONE wide shuffle builds the per-order basket — an
    EXPLICIT repartition by order key feeds the collect_set so the
    whole aggregation runs clustered in one stage (letting the planner
    insert the exchange instead puts a partial collect_set BEFORE it:
    every mapper builds a basket map over its whole split and ships
    serialized set buffers — measured 2.3× slower at 100× than
    shuffling raw 16-byte rows and aggregating once). The basket frame
    is persisted for its two consumers (pairs + degrees). Pair
    enumeration is a JVM-side higher-order-function projection over
    the sorted basket array (no self-join reshuffle of the full
    incidence) — an idiom that wins BECAUSE the cap is 64: with ≤2016
    pair structs per array it beats the self-join 3×, while the same
    rewrite measured 1.4× WORSE on graph_link_prediction's 256-cap
    centers (up-to-32k-struct arrays; see _link_prediction) — then
    one (i,j)-keyed count with map-side partials, two
    explicitly broadcast degree joins (parts-sized frame; falls back
    to a parts-vs-pairs shuffle join only past the broadcast budget),
    and the global top-10 is TakeOrderedAndProject."""
    from medical_examination_data_etl_system_spark.operators.cache import persist_tracked

    baskets = persist_tracked(
        load(spark, sf_dir, "lineitem")
        .repartition(F.col("l_orderkey"))
        .groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") <= 64)
        .select("ps")
    )
    # per-basket i<j pairs without a self-join: for the k-th element x
    # of the sorted basket, pair it with every later element.
    pair_array = F.flatten(
        F.transform(
            "ps",
            lambda x, k: F.transform(
                F.slice(F.col("ps"), k + 2, F.size("ps")),
                lambda y: F.struct(x.alias("i"), y.alias("j")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_array).alias("pr"))
        .select(F.col("pr.i").alias("i"), F.col("pr.j").alias("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("cooc"))
        .filter(F.col("cooc") >= 2)
    )
    deg = (
        baskets.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    scored = (
        pairs.join(F.broadcast(deg.select(F.col("p").alias("i"), F.col("deg").alias("di"))), "i")
        .join(F.broadcast(deg.select(F.col("p").alias("j"), F.col("deg").alias("dj"))), "j")
        .select(
            F.col("i").alias("part_a"),
            F.col("j").alias("part_b"),
            "cooc",
            F.col("di").alias("deg_a"),
            F.col("dj").alias("deg_b"),
            F.expr(
                "(CAST(cooc AS DECIMAL(38,0)) * cooc * 1000000000000)"
                " div (CAST(di AS DECIMAL(38,0)) * dj)"
            ).alias("score_key"),
            F.round(
                F.col("cooc").cast("double")
                / F.sqrt(F.col("di").cast("double") * F.col("dj")),
                4,
            ).alias("cosine"),
        )
    )
    return (
        scored.orderBy(F.desc("score_key"), "part_a", "part_b")
        .limit(10)
        .select("part_a", "part_b", "cooc", "deg_a", "deg_b", "cosine")
    )


ITEMCF_SQL = """
WITH li0 AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), keep AS (
  SELECT o FROM li0 GROUP BY o HAVING count(*) <= 64
), li AS (
  SELECT li0.o, li0.p FROM li0 JOIN keep USING (o)
), pairs AS (
  SELECT a.p AS i, b.p AS j, CAST(count(*) AS BIGINT) AS cooc
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
  HAVING count(*) >= 2
), deg AS (
  SELECT p, CAST(count(*) AS BIGINT) AS deg FROM li GROUP BY 1
), scored AS (
  SELECT pr.i AS part_a, pr.j AS part_b, pr.cooc,
         da.deg AS deg_a, db.deg AS deg_b,
         CAST((CAST(pr.cooc AS HUGEINT) * pr.cooc * 1000000000000)
              // (CAST(da.deg AS HUGEINT) * db.deg) AS BIGINT) AS score_key,
         round(CAST(pr.cooc AS DOUBLE)
               / sqrt(CAST(da.deg AS DOUBLE) * db.deg), 4) AS cosine
  FROM pairs pr
  JOIN deg da ON da.p = pr.i
  JOIN deg db ON db.p = pr.j
)
SELECT part_a, part_b, cooc, deg_a, deg_b, cosine
FROM scored
ORDER BY score_key DESC, part_a, part_b
LIMIT 10
"""


def orders_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U rank-sum test — the nonparametric two-sample
    test (does URGENT-priority order value stochastically dominate the
    rest?), the distribution-free companion to the CUPED/IPW
    parametric readouts: tie-corrected U, its null mean, and the
    normal-approximation z, with |z| > 1.96 as the significance flag.

    The 100 TB trick: rank sums NEVER rank rows — they come from the
    VALUE DOMAIN (per distinct cents: group counts + one cumulative
    window), using doubled midranks (2·midrank = 2·cum_before + t + 1)
    so every accumulation is an exact decimal/HUGEINT integer; U, μ
    and the tie-corrected σ² enter float once each in the identical
    closed form on both engines; zero-variance (all values tied)
    yields NULL z identically.

    Scale shape: one map-side value-domain collapse, one bounded-domain
    cumulative window (allowlisted), one global algebraic aggregate."""
    orders = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("g"),
    )
    vals = orders.groupBy("v").agg(
        F.sum("g").cast("long").alias("n1v"),
        F.count(F.lit(1)).alias("ntv"),
    )
    # cum-before = inclusive running total − own tie count; adapts to
    # the value-domain size under the orders-rowcount hint (r11
    # continuous-value hardening).
    from medical_examination_data_etl_system_spark.operators.ranking import with_global_prefix

    cum = with_global_prefix(
        vals,
        [F.col("v")],
        rank_col=None,
        running_sums={"_cumt": "ntv"},
        n_rows_hint=table_rowcount(spark, sf_dir, "orders"),
        small_frame_rows=VALUE_DOMAIN_SMALL_FRAME_ROWS,
    ).select(
        "v",
        "n1v",
        "ntv",
        (F.col("_cumt") - F.col("ntv")).alias("cb"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = cum.agg(
        F.sum("n1v").alias("n1"),
        F.sum("ntv").alias("nt"),
        F.sum(dec(F.col("n1v")) * (2 * F.col("cb") + F.col("ntv") + 1)).alias("r1d"),
        F.sum(dec(F.col("ntv")) * F.col("ntv") * F.col("ntv") - F.col("ntv")).alias("tie"),
    )
    n1 = F.col("n1")
    n0 = F.col("nt") - n1
    u1 = (F.col("r1d") - dec(n1) * (n1 + 1)).cast("double") / 2.0
    mu = (dec(n1) * n0).cast("double") / 2.0
    sig2 = ((dec(n1) * n0).cast("double") / 12.0) * (
        (F.col("nt") + 1).cast("double")
        - F.col("tie").cast("double") / (dec(F.col("nt")) * (F.col("nt") - 1)).cast("double")
    )
    z = F.when(sig2 > 0, F.round((u1 - mu) / F.sqrt(sig2), 4))
    return m.select(
        n1.alias("n_urgent"),
        n0.cast("long").alias("n_other"),
        F.round(u1, 1).alias("u_stat"),
        F.round(mu, 1).alias("u_null_mean"),
        z.alias("z"),
        (F.abs(z) > 1.96).alias("significant"),
    )


MANN_WHITNEY_SQL = """
WITH base AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
  FROM orders
), vals AS (
  SELECT v, CAST(sum(g) AS BIGINT) AS n1v, CAST(count(*) AS BIGINT) AS ntv
  FROM base GROUP BY 1
), cum AS (
  SELECT v, n1v, ntv,
         sum(ntv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - ntv AS cb
  FROM vals
), m AS (
  SELECT CAST(sum(n1v) AS BIGINT) AS n1,
         CAST(sum(ntv) AS BIGINT) AS nt,
         sum(CAST(n1v AS HUGEINT) * (2 * cb + ntv + 1)) AS r1d,
         sum(CAST(ntv AS HUGEINT) * ntv * ntv - ntv) AS tie
  FROM cum
)
SELECT n1 AS n_urgent,
       CAST(nt - n1 AS BIGINT) AS n_other,
       round(CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0, 1) AS u_stat,
       round(CAST(CAST(n1 AS HUGEINT) * (nt - n1) AS DOUBLE) / 2.0, 1) AS u_null_mean,
       CASE WHEN (CAST(CAST(n1 AS HUGEINT) * (nt - n1) AS DOUBLE) / 12.0)
                 * (CAST(nt + 1 AS DOUBLE)
                    - CAST(tie AS DOUBLE) / CAST(CAST(nt AS HUGEINT) * (nt - 1) AS DOUBLE)) > 0
            THEN round((CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0
                        - CAST(CAST(n1 AS HUGEINT) * (nt - n1) AS DOUBLE) / 2.0)
                       / sqrt((CAST(CAST(n1 AS HUGEINT) * (nt - n1) AS DOUBLE) / 12.0)
                              * (CAST(nt + 1 AS DOUBLE)
                                 - CAST(tie AS DOUBLE)
                                   / CAST(CAST(nt AS HUGEINT) * (nt - 1) AS DOUBLE))), 4)
       END AS z,
       abs(CASE WHEN (CAST(CAST(n1 AS HUGEINT) * (nt - n1) AS DOUBLE) / 12.0)
                     * (CAST(nt + 1 AS DOUBLE)
                        - CAST(tie AS DOUBLE) / CAST(CAST(nt AS HUGEINT) * (nt - 1) AS DOUBLE)) > 0
                THEN round((CAST(r1d - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0
                            - CAST(CAST(n1 AS HUGEINT) * (nt - n1) AS DOUBLE) / 2.0)
                           / sqrt((CAST(CAST(n1 AS HUGEINT) * (nt - n1) AS DOUBLE) / 12.0)
                                  * (CAST(nt + 1 AS DOUBLE)
                                     - CAST(tie AS DOUBLE)
                                       / CAST(CAST(nt AS HUGEINT) * (nt - 1) AS DOUBLE))), 4)
           END) > 1.96 AS significant
FROM m
"""


def events_offpolicy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFF-POLICY EVALUATION (IPS and SNIPS) — counterfactual policy
    value from logged interaction data, the estimator a recommender
    team runs over petabyte click logs before an online test: the
    logging policy is a uniform random 4-arm assignment (arm =
    md5('ope#'||event_id) mod 4, so the propensity is EXACTLY 1/4 and
    known — the md5 convention makes the "randomization" replayable on
    both engines), reward = event value cents, and two deterministic
    target policies are scored (personalized: arm ≡ user_id mod 4;
    constant: always arm 0). Per policy: the inverse-propensity-scored
    value Σr·w/N (w = 4·1[match]), the self-normalized SNIPS value
    Σr·w/Σw, match rate, and the effective sample size (Σw)²/Σw² —
    the diagnostics that tell you whether the estimate is usable.

    Exactness: with a uniform logger every sum collapses to exact
    integers (Σr·w = 4·Σ matching cents; Σw = 4·n_match; ESS =
    n_match), so the three ratios are the only float entries, each in
    the identical closed form both engines.

    Scale shape: one map-side policy fan-out (×2), one algebraic
    aggregate per policy — log-volume-linear, no shuffle before the
    2-row result."""
    from medical_examination_data_etl_system_spark.operators.curation import hash_bucket

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("r"),
    )
    logged = ev.select(
        "user_id",
        "r",
        hash_bucket(F.concat(F.lit("ope#"), F.col("event_id").cast("string")), 4).alias("a"),
    )
    pol = logged.select(
        "r",
        "a",
        F.explode(
            F.array(
                F.struct(
                    F.lit("personalized_mod4").alias("policy"),
                    (F.col("user_id") % 4).alias("pi"),
                ),
                F.struct(F.lit("always_arm0").alias("policy"), F.lit(0).cast("long").alias("pi")),
            )
        ).alias("p"),
    ).select("r", "a", F.col("p.policy").alias("policy"), F.col("p.pi").alias("pi"))
    agg = pol.groupBy("policy").agg(
        F.count(F.lit(1)).alias("n_logged"),
        F.sum(F.when(F.col("a") == F.col("pi"), 1).otherwise(0)).cast("long").alias("n_matched"),
        F.sum(F.when(F.col("a") == F.col("pi"), F.col("r")).otherwise(0)).alias("s_match"),
    )
    return (
        agg.select(
            "policy",
            "n_logged",
            "n_matched",
            F.round(F.col("n_matched").cast("double") / F.col("n_logged"), 4).alias("match_rate"),
            F.round(
                4.0 * F.col("s_match").cast("double") / F.col("n_logged"), 2
            ).alias("ips_value_cents"),
            F.when(
                F.col("n_matched") > 0,
                F.round(F.col("s_match").cast("double") / F.col("n_matched"), 2),
            ).alias("snips_value_cents"),
            F.col("n_matched").alias("effective_sample_size"),
        )
        .orderBy("policy")
    )


OFFPOLICY_SQL = """
WITH logged AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS r,
         (('0x' || substr(md5('ope#' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 4) AS a
  FROM events
), pol AS (
  SELECT r, a, 'personalized_mod4' AS policy, user_id % 4 AS pi FROM logged
  UNION ALL
  SELECT r, a, 'always_arm0' AS policy, CAST(0 AS BIGINT) AS pi FROM logged
), agg AS (
  SELECT policy,
         CAST(count(*) AS BIGINT) AS n_logged,
         CAST(sum(CASE WHEN a = pi THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
         CAST(sum(CASE WHEN a = pi THEN r ELSE 0 END) AS BIGINT) AS s_match
  FROM pol GROUP BY 1
)
SELECT policy, n_logged, n_matched,
       round(CAST(n_matched AS DOUBLE) / n_logged, 4) AS match_rate,
       round(4.0 * CAST(s_match AS DOUBLE) / n_logged, 2) AS ips_value_cents,
       CASE WHEN n_matched > 0
            THEN round(CAST(s_match AS DOUBLE) / n_matched, 2) END AS snips_value_cents,
       n_matched AS effective_sample_size
FROM agg
ORDER BY policy
"""


QUERIES = {
    "events_psi_drift": QueryDef(events_psi_drift, PSI_DRIFT_SQL),
    "events_offpolicy_eval": QueryDef(events_offpolicy_eval, OFFPOLICY_SQL),
    "orders_mann_whitney": QueryDef(orders_mann_whitney, MANN_WHITNEY_SQL),
    "lineitem_itemcf_recommend": QueryDef(lineitem_itemcf_recommend, ITEMCF_SQL),
    "orders_conformal_forecast": QueryDef(orders_conformal_forecast, CONFORMAL_SQL),
    "orders_purged_cv_folds": QueryDef(orders_purged_cv_folds, PURGED_CV_SQL),
    "customer_ipw_spend": QueryDef(customer_ipw_spend, IPW_SPEND_SQL),
    "lineitem_winsorize_prices": QueryDef(lineitem_winsorize_prices, WINSORIZE_SQL),
    "orders_churn_training_set": QueryDef(orders_churn_training_set, CHURN_TRAINING_SQL),
    "events_cusum_changepoint": QueryDef(events_cusum_changepoint, CUSUM_SQL),
    "orders_benford_audit": QueryDef(orders_benford_audit, BENFORD_SQL),
    "orders_bootstrap_ci": QueryDef(orders_bootstrap_ci, BOOTSTRAP_CI_SQL),
    "graph_link_prediction": QueryDef(graph_link_prediction, LINK_PREDICTION_SQL),
    "events_bot_detection": QueryDef(events_bot_detection, BOT_DETECTION_SQL),
    "customer_survival_km": QueryDef(customer_survival_km, SURVIVAL_KM_SQL),
    "customer_k_anonymity": QueryDef(customer_k_anonymity, K_ANONYMITY_SQL),
    "orders_revenue_acf": QueryDef(orders_revenue_acf, REVENUE_ACF_SQL),
    "graph_bfs_depths": QueryDef(graph_bfs_depths, BFS_SQL),
    "customer_abc_classes": QueryDef(customer_abc_classes, ABC_SQL),
    "lineitem_weighted_median": QueryDef(lineitem_weighted_median, WEIGHTED_MEDIAN_SQL),
    "customer_gini_revenue": QueryDef(customer_gini_revenue, GINI_SQL),
    "events_sessionized_funnel": QueryDef(events_sessionized_funnel, SESSIONIZED_FUNNEL_SQL),
    "events_dau_wau_stickiness": QueryDef(events_dau_wau_stickiness, DAU_WAU_SQL),
    "orders_price_mad": QueryDef(orders_price_mad, MAD_SQL),
    "events_activity_streaks": QueryDef(events_activity_streaks, STREAKS_SQL),
    "lineitem_skyline_frontier": QueryDef(lineitem_skyline_frontier, SKYLINE_SQL),
    "events_session_length_stats": QueryDef(events_session_length_stats, SESSION_LENGTH_SQL),
    "orders_open_backlog_monthly": QueryDef(orders_open_backlog_monthly, BACKLOG_SQL),
    "customer_cohort_ltv": QueryDef(customer_cohort_ltv, COHORT_LTV_SQL),
    "lineitem_basket_lift": QueryDef(lineitem_basket_lift, BASKET_LIFT_SQL),
    "events_funnel_conversion": QueryDef(events_funnel_conversion, FUNNEL_SQL),
    "graph_triangle_stats": QueryDef(graph_triangle_stats, TRIANGLE_SQL),
    "events_top_paths": QueryDef(events_top_paths, TOP_PATHS_SQL),
    "orders_daily_anomaly": QueryDef(orders_daily_anomaly, DAILY_ANOMALY_SQL),
    "events_chi_square": QueryDef(events_chi_square, CHI_SQUARE_SQL),
    "lineitem_price_qty_corr": QueryDef(lineitem_price_qty_corr, CORR_SQL),
    "events_pmi_cooccurrence": QueryDef(events_pmi_cooccurrence, PMI_SQL),
    "customer_rfm_segments": QueryDef(customer_rfm_segments, RFM_SQL),
    "events_transition_matrix": QueryDef(events_transition_matrix, TRANSITION_SQL),
    "events_retention_cohorts": QueryDef(events_retention_cohorts, RETENTION_SQL),
    "events_gap_fill_hourly": QueryDef(events_gap_fill_hourly, GAP_FILL_SQL),
    "graph_pagerank_parts": QueryDef(graph_pagerank_parts, None),
    "graph_pagerank_int3": QueryDef(graph_pagerank_int3, PAGERANK_INT3_SQL),
    "events_cumulative_distinct": QueryDef(events_cumulative_distinct, CUMULATIVE_DISTINCT_SQL),
    "events_ewma_smoothing": QueryDef(events_ewma_smoothing, EWMA_SQL),
    "events_histogram_equidepth": QueryDef(events_histogram_equidepth, HISTOGRAM_EQUIDEPTH_SQL),
    "lineitem_spearman_corr": QueryDef(lineitem_spearman_corr, SPEARMAN_SQL),
    "events_linear_attribution": QueryDef(events_linear_attribution, LINEAR_ATTRIBUTION_SQL),
    "events_ushape_attribution": QueryDef(events_ushape_attribution, USHAPE_ATTRIBUTION_SQL),
    "events_conversion_latency": QueryDef(events_conversion_latency, CONVERSION_LATENCY_SQL),
    "events_holt_forecast": QueryDef(events_holt_forecast, HOLT_SQL),
    "customer_spend_trend": QueryDef(customer_spend_trend, SPEND_TREND_SQL),
    "orders_seasonality_index": QueryDef(orders_seasonality_index, SEASONALITY_SQL),
}
