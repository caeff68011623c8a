"""As-of (time-travel) join — an operator Spark lacks natively.

Implemented as the scalable union + carry-forward-window composition
(SURVEY.md §2 "custom operators", option (a) — pure DataFrame ops):

1. Tag both sides and union them by name (right side first at equal
   timestamps so an inclusive match sees it).
2. One window over (key) ordered by (ts, side): ``last(right_payload,
   ignorenulls)`` carries the most recent right row forward.
3. Keep left rows; the carried struct is the as-of match.

Cost shape: ONE shuffle of |left| + |right| rows keyed by the join key —
no range-condition nested loop, no per-row probe. This is the standard
distributed as-of strategy (the same shape engines use for
point-in-time correctness joins); skewed keys split via AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same key (backward, inclusive
    — DuckDB ``ASOF JOIN``'s default semantics).

    Right-side columns (except key/ts) are returned with a ``right_``
    prefix plus ``right_<ts>``. ``how``: "inner" drops left rows with no
    match; "left" keeps them with NULLs.
    """
    r_payload = [c for c in right.columns if c not in key_cols]
    l_tagged = left.select(
        *key_cols,
        F.col(left_ts).alias("_asof_t"),
        F.lit(1).alias("_is_l"),
        F.struct(*[c for c in left.columns if c not in key_cols]).alias("_l"),
    )
    r_tagged = right.select(
        *key_cols,
        F.col(right_ts).alias("_asof_t"),
        F.lit(0).alias("_is_l"),
        F.struct(*r_payload).alias("_r"),
    )
    combined = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts → inclusive match.
    w = (
        W.partitionBy(*key_cols)
        .orderBy("_asof_t", "_is_l")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        combined.withColumn("_rm", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_l") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("_rm").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    out_cols = (
        [F.col(k) for k in key_cols]
        + [F.col(f"_l.{c}").alias(c) for c in left.columns if c not in key_cols]
        + [F.col(f"_rm.{c}").alias(f"right_{c}") for c in r_payload]
    )
    return matched.select(*out_cols)
