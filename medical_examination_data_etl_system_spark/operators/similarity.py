"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  The query set is broadcast (small side); the corpus is scanned once,
  map-only, with the dot product computed via higher-order functions
  (JVM-side, no Python). Per-query top-k via window rank.
- ``lsh_bucketed_topk``: the scale path — sign-random-projection buckets
  (deterministic hash-derived hyperplanes) shrink the candidate set from
  |corpus| to |bucket|; exact cosine re-ranks within buckets. Recall<1
  by construction (probe multiple buckets to trade cost for recall).

At 100 TB the corpus side stays partitioned; only buckets matching a
query's bucket are scanned (bucket id is a join key → hash join, no
cartesian product).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(_dot(v, v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cos_sim, rank).

    Self-matches are excluded. Ties break on neighbor id (deterministic).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim"), "rank")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate search — sampled centroids
# ---------------------------------------------------------------------------


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    nprobe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: assign every vector to its nearest
    centroid (the inverted lists), probe each query's ``nprobe`` nearest
    lists, exact-cosine re-rank inside them.

    Centroids are a deterministic hash-sample of the corpus (k-means
    refinement is an offline improvement, not a structural change). The
    assignment pass is a single ``mapInPandas`` sweep — a numpy matmul
    against the broadcast centroid matrix (C is small; cost O(n·C) with
    BLAS). Candidates per query ≈ nprobe·n/C, so recall trades against
    cost via nprobe — the standard IVF knob.
    """
    import numpy as np
    import pandas as pd

    # Deterministic centroid sample: the num_centroids lowest xxhash64
    # ids. Tiny → collected to the driver and closed over.
    sampled = (
        corpus.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv"))
        .orderBy(F.xxhash64(F.col("_cid")))
        .limit(num_centroids)
        .collect()
    )
    cmat = np.array([list(r["_cv"]) for r in sampled], dtype=np.float64)
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    assign_schema = T.StructType(
        [
            T.StructField("_id", T.LongType(), False),
            T.StructField("_v", T.ArrayType(T.FloatType()), True),
            T.StructField("_bucket", T.IntegerType(), False),
        ]
    )

    def _assign_factory(probes: int):
        def _assign(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                vm = np.array([list(v) for v in pdf["_v"]], dtype=np.float64)
                vm = vm / np.linalg.norm(vm, axis=1, keepdims=True)
                sims = vm @ cmat.T
                top = np.argsort(-sims, axis=1)[:, :probes]
                out = pdf.loc[pdf.index.repeat(probes)].reset_index(drop=True)
                out["_bucket"] = top.ravel().astype("int32")
                yield out

        return _assign

    base = lambda df: df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))  # noqa: E731
    c_assigned = base(corpus).mapInPandas(_assign_factory(1), schema=assign_schema)
    q_assigned = (
        base(queries)
        .mapInPandas(_assign_factory(nprobe), schema=assign_schema)
        .select(
            F.col("_id").alias("query_id"), F.col("_v").alias("_qv"), "_bucket"
        )
    )

    scored = (
        c_assigned.join(F.broadcast(q_assigned), "_bucket")
        .filter(F.col("_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("_qv"), F.col("_v")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("_id").alias("neighbor_id"),
            F.round("cos_sim", 4).alias("cos_sim"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Sign-random-projection LSH (deterministic hyperplanes)
# ---------------------------------------------------------------------------


def _srp_bucket(vec: Column, num_planes: int, dim: int) -> Column:
    """Bucket id from the signs of ``num_planes`` pseudo-random
    hyperplane dot products. Plane components are deterministic
    hash-derived values in [-1, 1] — reproducible across runs/engines
    with no stored model."""
    bits = []
    for p in range(num_planes):
        # component_j = (xxhash64(p, j) % 1000)/500 - 1  — fixed per (p, j)
        comps = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j, p=p: (F.pmod(F.xxhash64(F.lit(p), j), F.lit(1000)).cast("double") / 500.0 - 1.0),
        )
        dot = F.aggregate(
            F.zip_with(vec, comps, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append((dot > 0).cast("long"))
    bucket = None
    for i, b in enumerate(bits):
        term = F.shiftleft(b, i)
        bucket = term if bucket is None else bucket.bitwiseXOR(term)
    return bucket


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup pairs: (id_a, id_b, cos_sim) with
    id_a < id_b and round(cos, 4) ≥ threshold. Exact all-pairs.

    Blocked-GEMM execution: vectors are hashed into ``num_blocks``
    blocks; each of the B(B+1)/2 block pairs becomes one task that
    computes the full cosine matrix between the two blocks with a numpy
    matmul (Arrow batch in, BLAS kernel inside) and emits only the
    above-threshold pairs. Per-pair higher-order-function dot products
    are ~1000× slower than this; per-task memory is bounded by
    2·(n/B)·dim floats, so B sizes the working set, and the quadratic
    work is spread over B(B+1)/2 independent tasks.

    At 100 TB all-pairs is infeasible regardless of kernel; the scale
    path is SRP bucketing (``_srp_bucket``) as candidate blocking with
    this same exact verification inside buckets.
    """
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks))
    blocks = (
        emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), blk.alias("_blk"))
        .groupBy("_blk")
        .agg(F.collect_list(F.struct("_id", "_v")).alias("_rows"))
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    block_pairs = a.join(b, F.col("a._blk") <= F.col("b._blk")).select(
        F.col("a._blk").alias("blk_a"),
        F.col("a._rows").alias("rows_a"),
        F.col("b._blk").alias("blk_b"),
        F.col("b._rows").alias("rows_b"),
    )

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("cos_sim", T.DoubleType(), True),
        ]
    )

    def _pairs(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                ids_a = np.array([r["_id"] for r in row["rows_a"]], dtype=np.int64)
                va = np.array([list(r["_v"]) for r in row["rows_a"]], dtype=np.float64)
                ids_b = np.array([r["_id"] for r in row["rows_b"]], dtype=np.int64)
                vb = np.array([list(r["_v"]) for r in row["rows_b"]], dtype=np.float64)
                na = va / np.linalg.norm(va, axis=1, keepdims=True)
                nb = vb / np.linalg.norm(vb, axis=1, keepdims=True)
                cos = np.round(na @ nb.T, 4)
                hit = cos >= threshold
                if row["blk_a"] == row["blk_b"]:
                    # Diagonal block pair: both orientations present —
                    # keep one per unordered pair.
                    hit &= ids_a[:, None] < ids_b[None, :]
                ia, ib = np.nonzero(hit)
                if len(ia):
                    lo = np.minimum(ids_a[ia], ids_b[ib])
                    hi = np.maximum(ids_a[ia], ids_b[ib])
                    yield pd.DataFrame({"id_a": lo, "id_b": hi, "cos_sim": cos[ia, ib]})

    n_tasks = num_blocks * (num_blocks + 1) // 2
    return (
        block_pairs.repartition(n_tasks, "blk_a", "blk_b")
        .mapInPandas(_pairs, schema=out_schema)
        .orderBy("id_a", "id_b")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share the query's SRP bucket, then
    exact cosine re-rank. Returns the same shape as ``cosine_topk``."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _srp_bucket(F.col(vec_col), num_planes, dim).alias("_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        _srp_bucket(F.col(vec_col), num_planes, dim).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 4).alias("cos_sim"), "rank")
        .orderBy("query_id", "rank")
    )
