"""Exact component assertions for connected_components, plus the
pairs→clusters→dedup integration over the real MinHash output."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators.clustering import (
    connected_components,
    dedup_by_components,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs(spark, edges):
    return spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])


def test_components_chain_triangle_isolated_pair(spark):
    # chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), pair 20-21
    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
    )
    got = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_long_chain_converges(spark):
    """A 20-node path is the worst case for neighbor propagation (the
    min label travels one hop per round) — must converge within the cap."""
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 20)])
    got = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert set(got.values()) == {1}
    assert len(got) == 20


def test_dedup_by_components_minhash_integration(spark):
    from medical_examination_data_etl_system_spark.operators.dedup import minhash_near_duplicates

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = minhash_near_duplicates(docs, threshold=0.5)
    kept = dedup_by_components(docs, pairs)

    n_docs = docs.count()
    n_losers = (
        connected_components(pairs).filter(F.col("node") != F.col("comp")).count()
    )
    assert kept.count() == n_docs - n_losers
    # every pair has at most one survivor
    k = kept.select("doc_id")
    both = (
        pairs.join(k.withColumnRenamed("doc_id", "id_a"), "id_a")
        .join(k.withColumnRenamed("doc_id", "id_b"), "id_b")
        .count()
    )
    assert both == 0


def test_alternating_matches_label_prop_on_mixed_graph(spark):
    from medical_examination_data_etl_system_spark.operators.clustering import (
        connected_components_alternating,
    )

    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
    )
    lp = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    alt = {r["node"]: r["comp"] for r in connected_components_alternating(pairs).collect()}
    assert alt == lp


def test_alternating_on_long_path_and_random_graph(spark):
    import random

    from medical_examination_data_etl_system_spark.operators.clustering import (
        connected_components_alternating,
    )

    # 60-node path: diameter 59 — label prop's worst case; alternating
    # must converge well inside the same round cap (O(log^2 n)).
    path = _pairs(spark, [(i, i + 1) for i in range(1, 60)])
    alt = {r["node"]: r["comp"] for r in connected_components_alternating(path).collect()}
    assert set(alt.values()) == {1} and len(alt) == 60

    rng = random.Random(7)
    nodes = list(range(100))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = _pairs(spark, edges)
    lp = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    alt = {r["node"]: r["comp"] for r in connected_components_alternating(pairs).collect()}
    assert alt == lp


def test_dedup_by_components_algorithms_agree_on_same_pairs(spark):
    """Both clustering algorithms must keep the identical surviving doc
    set when fed the SAME pair set (the queries themselves use different
    pair sources, so equivalence is pinned here)."""
    from medical_examination_data_etl_system_spark.operators.dedup import minhash_near_duplicates

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = minhash_near_duplicates(docs, threshold=0.5).localCheckpoint(eager=True)
    a = sorted(r["doc_id"] for r in dedup_by_components(docs, pairs).collect())
    b = sorted(
        r["doc_id"]
        for r in dedup_by_components(docs, pairs, algorithm="alternating").collect()
    )
    assert a == b and len(a) > 0


class TestPageRank:
    @staticmethod
    def _numpy_pagerank(edges, n_iter=15, d=0.85):
        import numpy as np

        nodes = sorted({x for e in edges for x in e})
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        out = {v: 0 for v in nodes}
        for s, _ in edges:
            out[s] += 1
        r = np.full(n, 1.0 / n)
        for _ in range(n_iter):
            nr = np.zeros(n)
            dangling = sum(r[idx[v]] for v in nodes if out[v] == 0)
            for s, t in edges:
                nr[idx[t]] += r[idx[s]] / out[s]
            r = (1 - d) / n + d * dangling / n + d * nr
        return {v: r[idx[v]] for v in nodes}

    def test_matches_numpy_power_iteration(self, spark):
        from pyspark.sql import Row

        from medical_examination_data_etl_system_spark.operators.clustering import pagerank

        # chain + hub + a dangling sink
        edges = [(1, 2), (2, 3), (3, 1), (1, 4), (2, 4), (3, 4)]
        df = spark.createDataFrame([Row(src=s, dst=t) for s, t in edges])
        got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=15).collect()}
        want = self._numpy_pagerank(edges, n_iter=15)
        assert set(got) == set(want)
        for v in want:
            assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_rank_mass_conserved_on_real_graph(self, spark):
        from medical_examination_data_etl_system_spark.queries import retired_queries

        top = retired_queries()["graph_pagerank_parts"].fn(spark, "/root/testdata/sf0.001").collect()
        assert len(top) == 20
        assert top == sorted(top, key=lambda r: r["rnk"])
        assert all(r["rank"] > 0 for r in top)


def test_components_adaptive_layout_matches_checkpoint_arm(spark):
    """r14: a loop still unconverged after `adapt_after` rounds switches
    the static edge frame to the persisted dst-clustered layout. The
    switch is layout-only: components on a long chain must be identical
    to the never-adapting arm, and the persist must be scope-released."""
    from medical_examination_data_etl_system_spark.operators.cache import (
        cache_scope,
        tracked_frames,
    )

    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 20)] + [(30, 31)])
    before = len(tracked_frames())
    with cache_scope():
        adaptive = {
            r["node"]: r["comp"]
            for r in connected_components(pairs, adapt_after=3).collect()
        }
        never = {
            r["node"]: r["comp"]
            for r in connected_components(pairs, adapt_after=10**9).collect()
        }
    assert adaptive == never
    assert set(adaptive.values()) == {1, 30}
    assert len(tracked_frames()) == before
