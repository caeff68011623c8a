"""Round-8 (driver r06) additions: pHash exact-collapse pre-step,
rolling-fingerprint pre-collapse, PageRank TakeOrderedAndProject top-k,
renderer-SQL bench query, ADVICE r5 guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.queries import all_queries, load

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# pHash exact-collapse: byte-identical pairs vs the direct twin
# ---------------------------------------------------------------------------


def _hamming_pairs_set(df_out):
    return {(r.id_a, r.id_b, r.hamming) for r in df_out.collect()}


def test_hamming_collapse_parity_duplicate_heavy(spark):
    """On a duplicate-heavy corpus (every hash replicated 5x) the
    collapsed path must emit EXACTLY the pairs the direct path does —
    including the Hamming-0 cliques and cross-group near-pairs."""
    from medical_examination_data_etl_system_spark.operators.dedup import hamming_near_duplicates

    rng = np.random.default_rng(23)
    base = [int(v) for v in rng.integers(0, 1 << 60, size=8, dtype=np.int64)]
    # one planted near-pair: flip 2 bits of base[0]
    near = base[0] ^ (1 << 3) ^ (1 << 41)
    uniq = base + [near]
    rows = []
    nid = 0
    for h in uniq:
        for _ in range(5):  # 5 copies each → heavily duplicated
            rows.append(Row(i=nid, h=h))
            nid += 1
    df = spark.createDataFrame(rows)
    direct = _hamming_pairs_set(
        hamming_near_duplicates(df, "i", "h", max_hamming=5, collapse_exact=False)
    )
    collapsed = _hamming_pairs_set(
        hamming_near_duplicates(df, "i", "h", max_hamming=5, collapse_exact=True)
    )
    auto = _hamming_pairs_set(
        hamming_near_duplicates(df, "i", "h", max_hamming=5, collapse_exact="auto")
    )
    assert collapsed == direct
    assert auto == direct
    # sanity: the Hamming-0 cliques are present (C(5,2)=10 per group, 9 groups)
    assert sum(1 for (_, _, d) in direct if d == 0) == 10 * len(uniq)
    # and the planted cross-group near-pair expanded to 5x5 member pairs
    assert sum(1 for (_, _, d) in direct if d == 2) == 25


def test_hamming_collapse_null_hash_parity(spark):
    """Null hashes never pair in the direct path; the collapsed path
    must not invent Hamming-0 pairs for them."""
    from medical_examination_data_etl_system_spark.operators.dedup import hamming_near_duplicates

    rows = [Row(i=0, h=7), Row(i=1, h=7), Row(i=2, h=None), Row(i=3, h=None)]
    df = spark.createDataFrame(rows, "i int, h long")
    direct = _hamming_pairs_set(
        hamming_near_duplicates(df, "i", "h", max_hamming=3, collapse_exact=False)
    )
    collapsed = _hamming_pairs_set(
        hamming_near_duplicates(df, "i", "h", max_hamming=3, collapse_exact=True)
    )
    assert collapsed == direct == {(0, 1, 0)}


def test_hamming_auto_skips_collapse_on_unique(spark):
    """All-unique hashes: auto probe must take the direct path and
    still match brute force."""
    from medical_examination_data_etl_system_spark.operators.dedup import hamming_near_duplicates

    rng = np.random.default_rng(5)
    rows = [Row(i=int(k), h=int(v)) for k, v in enumerate(rng.integers(0, 1 << 60, 30, dtype=np.int64))]
    df = spark.createDataFrame(rows)
    got = _hamming_pairs_set(hamming_near_duplicates(df, "i", "h", max_hamming=5))
    hs = {r.i: r.h for r in rows}
    brute = {
        (a, b, bin(hs[a] ^ hs[b]).count("1"))
        for a in hs
        for b in hs
        if a < b and bin(hs[a] ^ hs[b]).count("1") <= 5
    }
    assert got == brute

# ---------------------------------------------------------------------------
# Rolling fingerprint exact-collapse: output-invariant, scales with uniques
# ---------------------------------------------------------------------------


def test_rolling_fp_collapse_parity(spark):
    from medical_examination_data_etl_system_spark.operators.text_analysis import with_rolling_fingerprint

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    # replicate 4x with distinct ids -> duplicate-heavy
    rep = docs
    for k in range(1, 4):
        rep = rep.unionByName(
            docs.select((F.col("doc_id") + 1_000_000 * k).alias("doc_id"), "text")
        )
    for hash_fn in ("xxhash64", "md5"):
        direct = {
            (r.doc_id, r.roll_fp)
            for r in with_rolling_fingerprint(rep, hash_fn=hash_fn, collapse_exact=False)
            .select("doc_id", "roll_fp")
            .collect()
        }
        collapsed = {
            (r.doc_id, r.roll_fp)
            for r in with_rolling_fingerprint(rep, hash_fn=hash_fn, collapse_exact=True)
            .select("doc_id", "roll_fp")
            .collect()
        }
        auto = {
            (r.doc_id, r.roll_fp)
            for r in with_rolling_fingerprint(rep, hash_fn=hash_fn, collapse_exact="auto")
            .select("doc_id", "roll_fp")
            .collect()
        }
        assert collapsed == direct
        assert auto == direct
        # every replica carries its original's fingerprint
        base = {d: fp for d, fp in direct if d < 1_000_000}
        for d, fp in direct:
            assert fp == base[d % 1_000_000]

# ---------------------------------------------------------------------------
# PageRank top-k plan: TakeOrderedAndProject, no unpartitioned window
# ---------------------------------------------------------------------------


def test_pagerank_topk_plan_take_ordered(spark):
    df = all_queries()["graph_pagerank_parts"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert all(rows[i].rank >= rows[i + 1].rank for i in range(len(rows) - 1))
