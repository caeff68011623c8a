"""Unit semantics for the as-of join operator (backward, inclusive)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from medical_examination_data_etl_system_spark.operators.asof import asof_join_backward


def _ts(s: str):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", lt=_ts("2024-01-01T10:00:00"), lv=1),
            Row(k="a", lt=_ts("2024-01-01T12:00:00"), lv=2),
            Row(k="b", lt=_ts("2024-01-01T09:00:00"), lv=3),  # before any right
            Row(k="c", lt=_ts("2024-01-01T09:00:00"), lv=4),  # key absent on right
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rt=_ts("2024-01-01T10:00:00"), rv="x"),  # ties left @10 → inclusive
            Row(k="a", rt=_ts("2024-01-01T11:00:00"), rv="y"),
            Row(k="b", rt=_ts("2024-01-01T11:00:00"), rv="z"),
        ]
    )
    return left, right


def test_asof_inner(spark):
    left, right = _frames(spark)
    got = {
        (r["k"], r["lv"]): (r["right_rv"], r["right_rt"])
        for r in asof_join_backward(left, right, ["k"], "lt", "rt").collect()
    }
    # inclusive: left a@10 matches right a@10; a@12 takes the latest (11).
    assert got == {
        ("a", 1): ("x", _ts("2024-01-01T10:00:00")),
        ("a", 2): ("y", _ts("2024-01-01T11:00:00")),
    }


def test_asof_left(spark):
    left, right = _frames(spark)
    rows = asof_join_backward(left, right, ["k"], "lt", "rt", how="left").collect()
    assert len(rows) == 4
    unmatched = {r["lv"]: r["right_rv"] for r in rows if r["right_rv"] is None}
    assert set(unmatched) == {3, 4}
