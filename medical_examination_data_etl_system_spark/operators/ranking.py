"""Distributed global ranking / prefix aggregates.

A single unpartitioned ``Window.orderBy(...)`` funnels the whole frame
through ONE task — acceptable for genuinely bounded frames (a few
hundred distinct days, a top-k), a scale wall for dimension-sized ones
(ranks over per-customer aggregates: 1.39M rows on the adversarial
100× customers corpus, 10⁹ on a real cluster — 16 GB through one
sort task). :func:`with_global_prefix` computes the same 1-based
global row number and inclusive running sums with the classic
range-partition + per-partition-offset idiom instead:

1. ``repartitionByRange`` on the caller's order (a PARALLEL range
   shuffle; Spark samples split boundaries);
2. one bounded driver collect of per-partition ``(count, sum…)``
   partials — one row per shuffle partition, the same scalar-state
   discipline as the k-means centroid / CC-digest collects;
3. a per-partition window (partitioned by ``spark_partition_id``)
   plus broadcast exclusive offsets.

The order MUST be total (the callers append the entity key as the
final tie-break — they already did for engine-determinism). With a
total order no two rows compare equal, so ranks are invariant to
where the sampled range boundaries happen to fall; a NON-total order
would let equal rows straddle a boundary and pick up
boundary-dependent ranks. Results are bit-identical to the
single-task window (row_number / running sums are exact integer
arithmetic either way).

The range-shuffled frame feeds TWO actions (the partials collect and
the caller's result), so it is persisted via the tracked-cache
discipline (``operators.cache``) — callers running inside a
``cache_scope`` (bench, driver, API) release it after their action.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .cache import persist_tracked


def with_global_prefix(
    df: DataFrame,
    order_exprs: Sequence[Column],
    rank_col: str | None = "_rank",
    running_sums: dict[str, str] | None = None,
    running_mins_excl: dict[str, str] | None = None,
    total_count_col: str | None = None,
    num_partitions: int | None = None,
    small_frame_rows: int = 1_000_000,
    n_rows_hint: int | None = None,
) -> DataFrame:
    """``df`` plus a global 1-based ``rank_col`` over ``order_exprs``
    (which must form a TOTAL order) and, per ``running_sums`` entry
    ``{out: src}``, the inclusive running total of ``src`` in that
    order — without an unbounded single-task global window.
    ``rank_col=None`` skips the rank entirely (value-domain callers
    need only the running sums; on the small branch this reproduces
    their pre-existing single-window plan expression-for-expression).
    ``running_mins_excl`` entries ``{out: src}`` compute the EXCLUSIVE
    running minimum (``min(src) OVER (... ROWS UNBOUNDED PRECEDING TO
    1 PRECEDING)`` — NULL on each partition-order first row), the
    skyline/frontier shape: min is associative, so the distributed
    branch takes ``least`` of the within-partition exclusive cummin
    and the prior partitions' min (``F.least`` skips NULLs, which
    makes the first-row/first-partition semantics line up exactly).
    ``running_sums`` sources must be integral AND effectively non-null
    (coalesce upstream): the integral check below raises on the former;
    the latter is a documented contract because schema nullability
    cannot distinguish a genuinely nullable column from an F.sum
    aggregate (see the branch-divergence note at the guard).

    ``total_count_col`` additionally attaches the frame's total row
    count as a column (free: already on the driver either way) —
    replacing the ``count().over(Window.partitionBy())`` idiom, which
    is itself an unpartitioned window.

    ADAPTIVE (the SRP-sizing / itemCF-boundary discipline): frames at
    or under ``small_frame_rows`` use the plain single-task window —
    at 15k rows (sf0.1 per-customer frames) the parallel machinery
    measures 3-10× SLOWER than one tiny sort, while at 1.39M rows
    (the adversarial customers corpus) the distributed path wins
    1.35-2.5× and at 10⁹ a single sort task is a wall, not a
    slowdown. Sizing: ``n_rows_hint`` when the caller has a cheap
    upper bound (the customer-family queries pass the customer
    table's metadata-only parquet count — distinct keys in a fact
    can't exceed the dimension; a small over-estimate just switches
    to the distributed branch early, never changes results),
    otherwise a count of the pinned input. On the small branch with a
    hint the operator adds ZERO extra jobs over the plain window it
    replaces; both branches are bit-identical (pinned in tests across
    partition counts).
    """
    sums = running_sums or {}
    spark = df.sparkSession
    # Offsets cross the driver as exact longs; a fractional sum column
    # would silently round there. Integral inputs only (the callers
    # sum cents / counts — the repo-wide exact-integer discipline).
    #
    # NON-NULL inputs only, by CONTRACT (ADVICE r10 #1): with a null in
    # the first range partition, the plain window carries NULL for the
    # prefix before the first non-null while the distributed branch's
    # null-prefix-plus-long-offset arithmetic also yields NULL *per
    # partition* — rows in a LATER partition before its first non-null
    # would get NULL where the plain window would carry the prior
    # partitions' running total, silently breaking the bit-identical
    # branch contract. A schema-level nullability rejection would ban
    # every F.sum-derived column (aggregates are nullable-by-schema even
    # when values never are), so the requirement is documented here and
    # in the docstring instead: coalesce nullable sources to 0 upstream.
    # Current callers pass groupBy sums over non-null fact columns,
    # which cannot be null on non-empty groups.
    mins = running_mins_excl or {}
    dtypes = dict(df.dtypes)
    for kind, mapping in (("running_sums", sums), ("running_mins_excl", mins)):
        for out, src in mapping.items():
            if dtypes.get(src) not in ("bigint", "int", "smallint", "tinyint", "long"):
                raise TypeError(
                    f"{kind}[{out!r}] over non-integral column {src!r} "
                    f"({dtypes.get(src)}): partition offsets are carried as exact "
                    "longs; cast to cents/ticks first or aggregate doubles downstream"
                )
    if num_partitions is None:
        try:
            # Non-numeric on some AQE-coupled runtimes (e.g. "auto") —
            # same fallback as operators.similarity.cosine_topk.
            num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            num_partitions = spark.sparkContext.defaultParallelism
    pin = None
    if n_rows_hint is not None:
        n_rows = n_rows_hint
    else:
        pin = persist_tracked(df)
        n_rows = pin.count()
    if n_rows <= small_frame_rows:
        w = Window.orderBy(*order_exprs)
        out_df = pin if pin is not None else df
        if rank_col is not None:
            out_df = out_df.withColumn(rank_col, F.row_number().over(w))
        for out, src in sums.items():
            out_df = out_df.withColumn(
                out,
                F.sum(src).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
        for out, src in mins.items():
            out_df = out_df.withColumn(
                out,
                F.min(src).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            )
        if total_count_col is not None:
            # With a hint the exact count may differ from the bound —
            # attach the true window count, not the hint.
            out_df = out_df.withColumn(
                total_count_col,
                F.lit(n_rows) if n_rows_hint is None
                else F.count(F.lit(1)).over(Window.partitionBy()),
            )
        return out_df
    # Tracked persists: the INPUT (range partitioning SAMPLES its
    # child before shuffling, so an unpinned upstream aggregation
    # would run twice) and the SHUFFLED frame (it feeds two actions —
    # the partials collect and the caller's result; separate actions
    # do not reuse each other's exchanges).
    if pin is None:
        pin = persist_tracked(df)
    part = persist_tracked(
        pin.repartitionByRange(num_partitions, *order_exprs).withColumn(
            "_gp_pid", F.spark_partition_id()
        )
    )
    partials = sorted(
        part.groupBy("_gp_pid")
        .agg(
            F.count(F.lit(1)).alias("_gp_n"),
            *[F.sum(src).alias(f"_gp_s_{out}") for out, src in sums.items()],
            *[F.min(src).alias(f"_gp_m_{out}") for out, src in mins.items()],
        )
        .collect(),
        key=lambda r: r["_gp_pid"],
    )
    total_rows = sum(r["_gp_n"] for r in partials)
    offsets, run_n = [], 0
    run_s = {out: 0 for out in sums}
    run_m: dict[str, int | None] = {out: None for out in mins}
    for r in partials:
        offsets.append(
            (
                r["_gp_pid"],
                run_n,
                *[run_s[out] for out in sums],
                *[run_m[out] for out in mins],
            )
        )
        run_n += r["_gp_n"]
        for out in sums:
            run_s[out] += r[f"_gp_s_{out}"] or 0
        for out in mins:
            m = r[f"_gp_m_{out}"]
            if m is not None and (run_m[out] is None or m < run_m[out]):
                run_m[out] = m
    off_schema = (
        "_gp_pid int, _gp_off_n long"
        + "".join(f", _gp_off_{out} long" for out in sums)
        + "".join(f", _gp_min_{out} long" for out in mins)
    )
    off = spark.createDataFrame(
        offsets or [(0, 0, *[0] * len(sums), *[None] * len(mins))], off_schema
    )
    w = Window.partitionBy("_gp_pid").orderBy(*order_exprs)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out_df = part.join(F.broadcast(off), "_gp_pid", "left")
    if rank_col is not None:
        out_df = out_df.withColumn(
            rank_col, F.row_number().over(w) + F.coalesce("_gp_off_n", F.lit(0))
        )
    for out, src in sums.items():
        out_df = out_df.withColumn(
            out, F.sum(src).over(cum) + F.coalesce(f"_gp_off_{out}", F.lit(0))
        )
    for out, src in mins.items():
        out_df = out_df.withColumn(
            out,
            # F.least skips NULLs: first row of a partition has a NULL
            # within-partition exclusive min, the first PARTITION has a
            # NULL prior-partition offset, and both-NULL (global first
            # row) stays NULL — exactly the plain exclusive window.
            F.least(
                F.min(src).over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.col(f"_gp_min_{out}"),
            ),
        )
    if total_count_col is not None:
        out_df = out_df.withColumn(total_count_col, F.lit(total_rows))
    return out_df.drop(
        "_gp_pid",
        "_gp_off_n",
        *[f"_gp_off_{out}" for out in sums],
        *[f"_gp_min_{out}" for out in mins],
    )


def with_partitioned_prefix(
    df: DataFrame,
    part_cols: Sequence[str],
    order_exprs: Sequence[Column],
    running_sums: dict[str, str],
    part_total_cols: dict[str, str] | None = None,
    num_partitions: int | None = None,
    small_frame_rows: int = 1_000_000,
    n_rows_hint: int | None = None,
) -> DataFrame:
    """Per-``part_cols`` inclusive running totals of ``running_sums``
    sources in ``order_exprs`` order, plus (``part_total_cols``) the
    per-partition grand totals as columns — the PARTITIONED sibling of
    :func:`with_global_prefix` for windows like
    ``sum(c) OVER (PARTITION BY flag ORDER BY value)`` whose partition
    count is tiny (a handful of flags) while each partition's frame can
    be ~n rows (the continuous-value-domain regime): partitioning by
    flag bounds the TASK count at the flag count, not the task SIZE.

    Small frames (≤ ``small_frame_rows``) keep the plain partitioned
    window — expression-for-expression today's plan, zero added jobs
    when ``n_rows_hint`` is given. Past the threshold the frame takes
    ONE global range shuffle on (part, order) via
    :func:`with_global_prefix` (rank skipped), and per-part sums are
    recovered as ``global_cum − exclusive_part_offset`` with the
    offsets/totals coming from a bounded ``groupBy(part)`` aggregate
    (rows = distinct parts, window over THAT frame is domain-bounded
    by construction). Bit-identical branches: exact integer arithmetic
    either way (``running_sums`` inherits the integral + non-null
    contract of :func:`with_global_prefix`).

    ``part_cols`` must be NON-NULL (the offset join is an equi-join on
    them) and (part_cols + order_exprs) must form a total order —
    callers pass distinct-value frames keyed by (part, value), which
    satisfies both.
    """
    sums = running_sums or {}
    totals = part_total_cols or {}
    parts = [F.col(p) for p in part_cols]
    if n_rows_hint is not None:
        n_rows = n_rows_hint
        pin = None
    else:
        pin = persist_tracked(df)
        n_rows = pin.count()
    if n_rows <= small_frame_rows:
        base = pin if pin is not None else df
        wo = Window.partitionBy(*part_cols).orderBy(*order_exprs)
        cum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wp = Window.partitionBy(*part_cols)
        out_df = base
        for out, src in sums.items():
            out_df = out_df.withColumn(out, F.sum(src).over(cum))
        for out, src in totals.items():
            out_df = out_df.withColumn(out, F.sum(src).over(wp))
        return out_df
    # Large branch: the frame feeds TWO consumers (the totals aggregate
    # and the range-shuffled prefix) — pin it even when a hint skipped
    # the sizing count, or the upstream aggregation would run twice.
    if pin is None:
        pin = persist_tracked(df)
    src_needed = {src for src in sums.values()} | {src for src in totals.values()}
    tot = pin.groupBy(*part_cols).agg(
        *[F.sum(src).alias(f"_pp_t_{src}") for src in sorted(src_needed)]
    )
    # Exclusive per-part offsets: a window over the DISTINCT-part frame
    # — bounded by the part domain (a handful of flags), never by n.
    w_exc = Window.orderBy(*part_cols).rowsBetween(Window.unboundedPreceding, -1)
    off = tot.select(
        *part_cols,
        *[F.col(f"_pp_t_{src}") for src in sorted(src_needed)],
        *[
            F.coalesce(F.sum(f"_pp_t_{src}").over(w_exc), F.lit(0)).alias(f"_pp_e_{src}")
            for src in sorted(src_needed)
        ],
    )
    glob = with_global_prefix(
        pin,
        [*parts, *order_exprs],
        rank_col=None,
        running_sums={f"_pp_g_{out}": src for out, src in sums.items()},
        num_partitions=num_partitions,
        small_frame_rows=0,  # sized here; always the distributed branch
        n_rows_hint=n_rows,
    )
    out_df = glob.join(F.broadcast(off), list(part_cols))
    for out, src in sums.items():
        out_df = out_df.withColumn(
            out, F.col(f"_pp_g_{out}") - F.col(f"_pp_e_{src}")
        )
    for out, src in totals.items():
        out_df = out_df.withColumn(out, F.col(f"_pp_t_{src}"))
    return out_df.drop(
        *[f"_pp_g_{out}" for out in sums],
        *[f"_pp_t_{src}" for src in sorted(src_needed)],
        *[f"_pp_e_{src}" for src in sorted(src_needed)],
    )


def with_global_ntile(
    df: DataFrame,
    order_exprs: Sequence[Column],
    tiles: int,
    out_col: str,
    num_partitions: int | None = None,
    small_frame_rows: int = 1_000_000,
    n_rows_hint: int | None = None,
) -> DataFrame:
    """``ntile(tiles) OVER (ORDER BY order_exprs)`` as ``out_col`` —
    native ``F.ntile`` over the plain window on the small branch (the
    exact pre-existing plan, zero added jobs when ``n_rows_hint`` is
    given), :func:`ntile_from_rank` over a :func:`with_global_prefix`
    distributed rank past ``small_frame_rows``. Bit-identical branches
    (the reconstruction is pinned against ``F.ntile`` in tests)."""
    if n_rows_hint is not None and n_rows_hint <= small_frame_rows:
        w = Window.orderBy(*order_exprs)
        return df.withColumn(out_col, F.ntile(tiles).over(w))
    ranked = with_global_prefix(
        df,
        order_exprs,
        rank_col="_gn_rank",
        total_count_col="_gn_n",
        num_partitions=num_partitions,
        small_frame_rows=small_frame_rows,
        n_rows_hint=n_rows_hint,
    )
    return ranked.withColumn(
        out_col, ntile_from_rank(F.col("_gn_rank"), F.col("_gn_n"), tiles)
    ).drop("_gn_rank", "_gn_n")


def ntile_from_rank(rank: Column, n: Column, tiles: int) -> Column:
    """``ntile(tiles) OVER (ORDER BY …)`` reconstructed from a global
    rank and the total count — Spark/ANSI semantics: with n rows the
    buckets hold ``n div tiles`` rows and the first ``n mod tiles``
    buckets hold one extra. Lets a distributed rank replace an
    unpartitioned-ntile window bit-identically (pinned against
    ``F.ntile`` in tests)."""
    base = F.floor(n / tiles)
    rem = n % tiles
    big = rem * (base + 1)  # rows covered by the first `rem` fat buckets
    return (
        F.when(rank <= big, F.ceil(rank / (base + 1)))
        .otherwise(rem + F.ceil((rank - big) / F.greatest(base, F.lit(1))))
        .cast("int")
    )
