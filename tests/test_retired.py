"""Smoke coverage for the retired rows-only originals (VERDICT r8 #2).

Each retired query left the driver/bench registry because a
driver-green exact-oracle twin certifies the same distributed shape
(mapping in ``queries/__init__.py:RETIRED``). This module preserves the
rotation-equivalent rows-only check the driver used to run: every
retired query still executes end-to-end at sf0.001, returns rows, and
keeps a stable schema. Deeper semantic pins (recall floors, estimator
tolerances, rank ordering) live in their original test modules
(test_round7/8, test_clustering, test_similarity, test_dedup).
"""

from __future__ import annotations

import pytest

from medical_examination_data_etl_system_spark.queries import RETIRED, all_queries, retired_queries

# Retirement is an evidence decision, not a deletion: the schema each
# retired query shipped with when it was last driver-checked is pinned
# here so a refactor cannot silently change the surface.
EXPECTED_SCHEMAS = {
    "docs_near_dup_minhash": {"id_a", "id_b", "jaccard"},
    "docs_near_dup_simhash": {"id_a", "id_b", "hamming"},
    "emb_ivf_topk": {"query_id", "neighbor_id", "rank", "cos_sim"},
    "emb_lsh_topk": {"query_id", "neighbor_id", "rank", "cos_sim"},
    "graph_pagerank_parts": {"l_partkey", "rank", "rnk"},
    "emb_kmeans_clusters": {"cluster", "n_vecs", "avg_sq_dist"},
    "emb_pca_project": {"vec_id", "pc1", "pc2", "pc3", "pc4"},
    "agg_kmv_overlap": {
        "grp_a", "grp_b", "est_a", "est_b",
        "est_intersection", "est_union", "est_jaccard",
    },
    "agg_hll_rollup": {
        "level", "o_orderstatus", "o_orderpriority",
        "approx_customers", "n_orders",
    },
}


def test_retired_set_matches_expectations():
    assert set(EXPECTED_SCHEMAS) == set(RETIRED)
    reg = retired_queries()
    assert set(reg) == set(RETIRED)
    # retirement really removed them from the driver/bench surface
    assert not (set(all_queries()) & RETIRED)
    # rows-only by construction: none carries an oracle
    assert all(qd.oracle is None for qd in reg.values())


@pytest.mark.parametrize("name", sorted(RETIRED))
def test_retired_query_still_runs(spark, sf_smoke, name):
    df = retired_queries()[name].fn(spark, sf_smoke)
    cols = set(df.columns)
    assert cols == EXPECTED_SCHEMAS[name], (name, cols)
    assert df.count() > 0, name
