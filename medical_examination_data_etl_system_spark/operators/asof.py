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


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the right row whose ``right_ts`` is
    NEAREST to ``left_ts`` in either direction within the same key
    (ties at equal absolute distance resolve to the earlier right row
    — the backward match).

    Same single-shuffle shape as :func:`asof_join_backward`: one union
    keyed by ``key_cols``, then TWO *running* frames —
    ``last(ignorenulls)`` over the ascending order carries the latest
    right row at-or-before each left row, and ``last(ignorenulls)``
    over the REVERSED order carries the earliest right row after it.
    Both frames are (unboundedPreceding → currentRow), which Spark
    evaluates incrementally; the naive alternative — ``first`` over a
    (currentRow → unboundedFollowing) frame — plans an
    ``UnboundedFollowingWindowFunctionFrame`` that rescans the rest of
    the partition for EVERY row, O(rows²) per key (measured 6× the
    backward join at 100×; the reversed running frame restores parity).
    One exchange, two intra-partition sorts — no |left|×|right| range
    probe at any scale.

    Precondition for determinism: (key, right_ts) unique on the right
    side — callers dedup (e.g. ``row_number`` keep-min) first, exactly
    as the backward variant's callers order equal timestamps.
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

    # Right rows sort before left at equal ts (ascending) → the
    # backward frame sees an equal-ts right row (inclusive, diff 0);
    # in the reversed order that same right row falls AFTER the left
    # row, so the forward frame starts strictly later — an equal-ts
    # match is never counted twice with conflicting tie-breaks.
    wb = (
        W.partitionBy(*key_cols)
        .orderBy(F.asc("_asof_t"), F.asc("_is_l"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(*key_cols)
        .orderBy(F.desc("_asof_t"), F.desc("_is_l"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ts_field = right_ts if right_ts in r_payload else None
    if ts_field is None:
        raise ValueError("right ts column must survive outside key_cols")
    matched = (
        combined.withColumn("_rb", F.last("_r", ignorenulls=True).over(wb))
        .withColumn("_rf", F.last("_r", ignorenulls=True).over(wf))
        .filter(F.col("_is_l") == 1)
    )
    # Microsecond distances: a timestamp→long cast truncates to whole
    # seconds, which would resolve sub-second ties wrongly.
    db = F.unix_micros("_asof_t") - F.unix_micros(F.col(f"_rb.{ts_field}"))
    df_ = F.unix_micros(F.col(f"_rf.{ts_field}")) - F.unix_micros("_asof_t")
    nearest = (
        F.when(F.col("_rb").isNull(), F.col("_rf"))
        .when(F.col("_rf").isNull(), F.col("_rb"))
        .when(db <= df_, F.col("_rb"))
        .otherwise(F.col("_rf"))
    )
    matched = matched.withColumn("_rm", nearest)
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
