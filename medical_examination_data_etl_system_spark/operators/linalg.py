"""Distributed exact linear algebra over embedding columns.

Two operators a 100 TB embedding pipeline needs ahead of any modeling:

- ``quantized_gram_matrix``: the d×d Gram (uncentered second-moment)
  matrix of an ``array<float>`` column, computed EXACTLY by quantizing
  each component to a fixed-point BIGINT (``round(v * scale)``) and
  summing int64 products. Floats are quantized JVM-side with the same
  ``CAST(v AS DOUBLE) * scale → round → BIGINT`` tree an ANSI oracle
  can mirror, so the result is engine-independent (no float summation
  order anywhere). Each Arrow batch contributes one ``XᵀX`` partial via
  a single BLAS-free integer matmul; only d(d+1)/2-row partials cross
  the shuffle (2 080 rows for d=64 per batch), never vectors — at any
  corpus size the reduce side is O(d²), not O(rows).
- ``pca_project``: principal-component projection. The covariance is
  assembled driver-side from the SAME single-sweep partials (Gram +
  column sums — d² + d values, fixed-size by construction, a legal
  driver materialization like the k-means centroids), eigen-solved with
  numpy (d×d, microseconds), and the top-k component matrix is
  broadcast back for a map-only Arrow-batched projection. One data
  sweep for the fit, one for the transform; nothing quadratic in rows.

The reference engine (682-line single-process pandas,
``/root/reference/db_to_dataframe.py``) has no vector analytics; these
extend the §2b mandate (SURVEY.md X77/X78).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GRAM_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType(), False),
        T.StructField("j", T.IntegerType(), False),
        T.StructField("s", T.LongType(), False),
    ]
)


def quantize_fixed_point(vec_col: str, scale: int):
    # Mirrors the oracle's CAST(v AS DOUBLE) * scale → round → BIGINT:
    # float→double widening is exact, the product is correctly rounded
    # (identical in any IEEE engine), and round() is half-away-from-zero
    # in both Spark (BigDecimal HALF_UP) and DuckDB.
    return F.transform(
        F.col(vec_col),
        lambda v: F.round(v.cast("double") * F.lit(float(scale))).cast("long"),
    )


def quantized_gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    with_col_sums: bool = False,
) -> DataFrame:
    """Upper-triangle Gram matrix rows ``(i, j, s)`` with
    ``s = Σ_rows q_i·q_j`` over quantized components ``q = round(v·scale)``
    (0-based ``i ≤ j``). With ``with_col_sums``, per-column sums ride
    along as ``(i, -1, Σ q_i)`` rows plus a single ``(-1, -1, n_rows)``
    sentinel, so mean-centering AND the row count need no second sweep
    (review finding: a separate count() was a second full corpus scan).

    int64 safety: |q| ≤ scale·|v|; at |v| ≤ 1, a pairwise product is
    ≤ scale² = 1e12 — overflow needs > 9·10⁶ rows per PARTIAL and
    > 9·10⁶ × #batches rows globally; the final sums for a 100 TB corpus
    (10¹¹ rows) fit by switching scale to 1e4. Callers own that knob —
    and the code now ENFORCES it (ADVICE r5): each Arrow batch asserts
    rows·max|q|² < 2⁶³ before the int64 matmul, and the cross-batch
    reduce sums in decimal(38,0) and raise_error()s if the total leaves
    int64 range, instead of wrapping silently. The decimal agg touches
    only the d(d+1)/2-per-batch partial rows, never the corpus.
    """
    # null vectors contribute nothing (np.stack would reject ragged
    # input); dropping them JVM-side keeps the kernel total.
    quantized = df.filter(F.col(vec_col).isNotNull()).select(
        quantize_fixed_point(vec_col, scale).alias("q")
    )
    emit_sums = with_col_sums

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            # int64-exactness precondition for the matmul below: the
            # worst-case accumulator is rows·max|q|² (Python ints — the
            # check itself cannot wrap).
            max_abs = int(np.abs(x).max()) if x.size else 0
            if x.shape[0] * max_abs * max_abs >= 2**63:
                raise OverflowError(
                    f"gram partial would overflow int64: rows={x.shape[0]} "
                    f"max|q|={max_abs}; lower `scale`"
                )
            g = x.T @ x  # int64-exact (guarded above)
            iu, ju = np.triu_indices(g.shape[1])
            out = {"i": iu.astype(np.int32), "j": ju.astype(np.int32), "s": g[iu, ju]}
            part = pd.DataFrame(out)
            if emit_sums:
                sums = pd.DataFrame(
                    {
                        "i": np.arange(x.shape[1], dtype=np.int32),
                        "j": np.full(x.shape[1], -1, dtype=np.int32),
                        "s": x.sum(axis=0),
                    }
                )
                sentinel = pd.DataFrame({"i": [-1], "j": [-1], "s": [x.shape[0]]})
                part = pd.concat([part, sums, sentinel], ignore_index=True)
            yield part

    # Cross-batch reduce in decimal(38,0): a too-large corpus/scale now
    # fails loudly at execution time instead of wrapping (ADVICE r5).
    # Only O(d² × batches) partial rows pay the decimal cost.
    dec_sum = F.sum(F.col("s").cast("decimal(38,0)"))
    int64_max = F.lit(str(2**63 - 1)).cast("decimal(38,0)")
    guarded = F.when(
        F.abs(dec_sum) > int64_max,
        F.raise_error(
            F.lit("gram sum overflows int64 — lower `scale` (see quantized_gram_matrix docstring)")
        ).cast("decimal(38,0)"),
    ).otherwise(dec_sum)
    return (
        quantized.mapInPandas(partials, schema=_GRAM_SCHEMA)
        .groupBy("i", "j")
        .agg(guarded.cast("long").alias("s"))
    )


def pca_components(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 4,
    scale: int = 1_000_000,
):
    """Fit: top-``k`` principal axes of the (mean-centered) covariance.

    Returns ``(components: ndarray (d, k), mean: ndarray (d,), explained:
    ndarray (k,))``. The d²-sized collect is fixed-cost (4 160 rows at
    d=64) regardless of corpus size — the one legitimate driver
    materialization in the whole fit.
    """
    import numpy as np

    rows = quantized_gram_matrix(df, vec_col, scale, with_col_sums=True).collect()
    # the (-1, -1) sentinel carries the non-null row count through the
    # SAME sweep — no separate count() scan. On an empty/all-null input
    # the sentinel is absent: fall through to the n-too-small error
    # rather than leaking StopIteration (ADVICE r5).
    n = next((r.s for r in rows if r.i == -1 and r.j == -1), 0)
    if n < 2:
        raise ValueError("pca needs at least 2 rows")
    d = max(r.i for r in rows) + 1
    gram = np.zeros((d, d), dtype=np.float64)
    sums = np.zeros(d, dtype=np.float64)
    for r in rows:
        if r.i == -1:
            continue
        if r.j == -1:
            sums[r.i] = r.s
        else:
            gram[r.i, r.j] = r.s
            gram[r.j, r.i] = r.s
    mean = sums / (n * scale)
    cov = gram / (scale * scale * n) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    components = evecs[:, order]
    # Deterministic sign: make the largest-|.| coordinate positive so the
    # projection is reproducible across LAPACK builds.
    for c in range(components.shape[1]):
        pivot = np.argmax(np.abs(components[:, c]))
        if components[pivot, c] < 0:
            components[:, c] = -components[:, c]
    return components, mean, evals[order]


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    scale: int = 1_000_000,
    decimals: int = 6,
) -> DataFrame:
    """Transform: ``(id, proj array<double>[k])`` — map-only Arrow
    projection against the broadcast (d×k) component matrix. Rounded to
    ``decimals`` so downstream comparisons aren't chasing LAPACK ulps.
    """
    components, mean, _ = pca_components(df, vec_col, k, scale)
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((components, mean))
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("proj", T.ArrayType(T.DoubleType(), False), False),
        ]
    )

    src = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("v")
    )

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        comp, mu = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf["v"].to_numpy()).astype(np.float64) - mu
            p = np.round(x @ comp, decimals)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(), "proj": list(p)})

    return src.mapInPandas(project, schema=out_schema)
