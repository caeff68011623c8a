"""Distributed global rank / prefix-sum operator
(``operators/ranking.py``): bit-equivalence to the single-task
unpartitioned window it replaces, across partition counts, plus the
exact Spark ntile reconstruction."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators.cache import cache_scope
from medical_examination_data_etl_system_spark.operators.ranking import (
    ntile_from_rank,
    with_global_prefix,
)


def _seeded(spark, n=500):
    # Values with heavy ties (mod 7) force the tie-break column to
    # matter; ids are a total order suffix.
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(7)).alias("v"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1000)).alias("x"),
    )


@pytest.mark.parametrize("parts", [1, 3, 32])
def test_global_prefix_matches_single_task_window(spark, parts):
    df = _seeded(spark)
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    expected = {
        r["k"]: (r["rnk"], r["run"], r["n"])
        for r in df.select(
            "k",
            F.row_number().over(w).alias("rnk"),
            F.sum("x").over(cum).alias("run"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        ).collect()
    }
    with cache_scope():
        got = {
            r["k"]: (r["rnk"], r["run"], r["n"])
            for r in with_global_prefix(
                df,
                [F.desc("v"), F.asc("k")],
                rank_col="rnk",
                running_sums={"run": "x"},
                total_count_col="n",
                num_partitions=parts,
                small_frame_rows=0,  # force the distributed branch
            ).collect()
        }
    assert got == expected
    # the adaptive small-frame branch must agree too (default threshold)
    with cache_scope():
        small = {
            r["k"]: (r["rnk"], r["run"], r["n"])
            for r in with_global_prefix(
                df,
                [F.desc("v"), F.asc("k")],
                rank_col="rnk",
                running_sums={"run": "x"},
                total_count_col="n",
            ).collect()
        }
    assert small == expected


def test_adaptive_branch_selection(spark):
    """Under the threshold the plan is a plain window (no range
    exchange); over it (forced) the range partitioning appears."""
    df = _seeded(spark, 100)
    with cache_scope():
        small_plan = with_global_prefix(
            df, [F.asc("v"), F.asc("k")]
        )._jdf.queryExecution().executedPlan().toString()
        big_plan = with_global_prefix(
            df, [F.asc("v"), F.asc("k")], small_frame_rows=0
        )._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in small_plan.lower()
    assert "rangepartitioning" in big_plan.lower()


def test_global_prefix_empty_frame(spark):
    df = _seeded(spark).filter(F.lit(False))
    with cache_scope():
        out = with_global_prefix(
            df, [F.asc("k")], rank_col="rnk", running_sums={"run": "x"},
            total_count_col="n",
        )
        assert out.count() == 0
        assert set(out.columns) >= {"k", "v", "x", "rnk", "run", "n"}


def test_global_prefix_deterministic(spark):
    df = _seeded(spark, 300)
    with cache_scope():
        a = with_global_prefix(
            df, [F.asc("v"), F.asc("k")], num_partitions=8, small_frame_rows=0
        ).collect()
    with cache_scope():
        b = with_global_prefix(
            df, [F.asc("v"), F.asc("k")], num_partitions=8, small_frame_rows=0
        ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_global_prefix_rejects_fractional_sum(spark):
    """Partition offsets cross the driver as exact longs — a double
    source column must be rejected loudly, not silently rounded."""
    df = _seeded(spark).withColumn("xf", F.col("x").cast("double"))
    with pytest.raises(TypeError, match="non-integral"):
        with_global_prefix(df, [F.asc("k")], running_sums={"run": "xf"})


def test_global_prefix_property_random_frames(spark):
    """Hypothesis-style sweep without fixture interplay: random sizes,
    duplicate-heavy keys, random partition counts — the distributed
    branch must agree with the single-task window on every draw."""
    import random

    rnd = random.Random(41)
    for _ in range(5):
        n = rnd.randint(0, 120)
        parts = rnd.choice([1, 2, 7, 32])
        rows = [
            (i, rnd.randint(0, 5), rnd.randint(-100, 100)) for i in range(n)
        ]
        df = spark.createDataFrame(rows, "k long, v long, x long") if rows else (
            _seeded(spark).filter(F.lit(False))
        )
        w = Window.orderBy(F.desc("v"), F.asc("k"))
        cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        expected = {
            r["k"]: (r["rnk"], r["run"])
            for r in df.select(
                "k", F.row_number().over(w).alias("rnk"), F.sum("x").over(cum).alias("run")
            ).collect()
        }
        with cache_scope():
            got = {
                r["k"]: (r["rnk"], r["run"])
                for r in with_global_prefix(
                    df,
                    [F.desc("v"), F.asc("k")],
                    rank_col="rnk",
                    running_sums={"run": "x"},
                    num_partitions=parts,
                    small_frame_rows=0,
                ).collect()
            }
        assert got == expected, (n, parts)


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (7, 4), (100, 4), (101, 7), (6, 10)])
def test_ntile_from_rank_matches_spark_ntile(spark, n, k):
    df = spark.range(n).select(F.col("id").alias("i"))
    w = Window.orderBy("i")
    expected = [
        (r["i"], r["t"])
        for r in df.select("i", F.ntile(k).over(w).alias("t")).collect()
    ]
    got = [
        (r["i"], r["t"])
        for r in df.select(
            "i",
            ntile_from_rank(
                F.row_number().over(w), F.lit(n).cast("long"), k
            ).alias("t"),
        ).collect()
    ]
    assert got == expected


@pytest.mark.parametrize("parts", [1, 3, 32])
def test_partitioned_prefix_matches_partitioned_window(spark, parts):
    """with_partitioned_prefix (r11 continuous-value hardening) must be
    bit-identical to the plain flag-partitioned cumulative window on
    both branches, across partition counts."""
    from medical_examination_data_etl_system_spark.operators.ranking import with_partitioned_prefix

    df = spark.range(600).select(
        F.pmod(F.xxhash64("id"), F.lit(3)).cast("string").alias("flag"),
        F.pmod(F.xxhash64("id", F.lit(5)), F.lit(50)).alias("v"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(100)) + 1).alias("c"),
    ).groupBy("flag", "v").agg(F.sum("c").alias("c"))  # unique (flag, v)
    wo = Window.partitionBy("flag").orderBy("v")
    expected = {
        (r["flag"], r["v"]): (r["cum"], r["n"])
        for r in df.select(
            "flag",
            "v",
            F.sum("c").over(
                wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("cum"),
            F.sum("c").over(Window.partitionBy("flag")).alias("n"),
        ).collect()
    }
    for kwargs in (
        {"small_frame_rows": 0, "num_partitions": parts},  # distributed
        {"n_rows_hint": 10},                               # small w/ hint
        {},                                                # small, sized
    ):
        with cache_scope():
            got = {
                (r["flag"], r["v"]): (r["cum"], r["n"])
                for r in with_partitioned_prefix(
                    df,
                    ["flag"],
                    [F.col("v")],
                    running_sums={"cum": "c"},
                    part_total_cols={"n": "c"},
                    **kwargs,
                ).collect()
            }
        assert got == expected, f"branch mismatch for {kwargs}"


def test_global_prefix_rank_none_skips_rank(spark):
    """rank_col=None returns only the running sums — no rank column on
    either branch, sums identical to the ranked variant."""
    df = _seeded(spark)
    order = [F.asc("v"), F.asc("k")]
    for kwargs in ({"small_frame_rows": 0}, {"n_rows_hint": 10}):
        with cache_scope():
            out = with_global_prefix(
                df, order, rank_col=None, running_sums={"run": "x"}, **kwargs
            )
            assert "_rank" not in out.columns and "rnk" not in out.columns
            got = {r["k"]: r["run"] for r in out.collect()}
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want = {r["k"]: r["run"] for r in df.select("k", F.sum("x").over(w).alias("run")).collect()}
        assert got == want, f"sums diverged for {kwargs}"


@pytest.mark.parametrize("parts", [1, 3, 32])
def test_global_prefix_exclusive_running_min(spark, parts):
    """running_mins_excl (the r11 skyline hardening) must be
    bit-identical to min(src) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING TO 1 PRECEDING) on both branches — including the NULL
    first row and ties."""
    from medical_examination_data_etl_system_spark.operators.ranking import with_global_prefix

    df = spark.range(400).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(97)).alias("m"),
    )
    w = Window.orderBy(F.asc("k")).rowsBetween(Window.unboundedPreceding, -1)
    expected = {
        r["k"]: r["prev"]
        for r in df.select("k", F.min("m").over(w).alias("prev")).collect()
    }
    for kwargs in (
        {"small_frame_rows": 0, "num_partitions": parts},
        {"n_rows_hint": 10},
    ):
        with cache_scope():
            got = {
                r["k"]: r["prev"]
                for r in with_global_prefix(
                    df, [F.asc("k")], rank_col=None,
                    running_mins_excl={"prev": "m"}, **kwargs
                ).collect()
            }
        assert got == expected, f"branch mismatch for {kwargs}"


def test_p90_outlier_branches_agree(spark, monkeypatch):
    """agg_p90_outlier_orders' adaptive split (row-form below 20M,
    value-domain distributed prefix above) must produce identical rows
    — the span lookup picks exactly the row_number ranks' values."""
    from medical_examination_data_etl_system_spark.queries import relational

    sf = "/root/testdata/sf0.01"
    base = sorted(map(tuple, relational.agg_p90_outlier_orders(spark, sf).collect()))
    monkeypatch.setattr(relational, "table_rowcount", lambda *a, **k: 30_000_000)
    with cache_scope():
        big = sorted(map(tuple, relational.agg_p90_outlier_orders(spark, sf).collect()))
    assert base and big == base
