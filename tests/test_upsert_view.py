"""Streaming incremental-upsert materialized view (streaming/upsert.py):
a CDC stream drained in MULTIPLE micro-batches must converge to the
same table as one batch MERGE over all changes — plus snapshot-commit
semantics (pointer, pruning, idempotent re-apply).
"""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators.merge import apply_changes
from medical_examination_data_etl_system_spark.streaming import (
    UpsertParquetView,
    run_upsert_stream,
)


def _write_cdc_files(spark, d: str) -> None:
    """Three single-file parquet dirs → three micro-batches with
    maxFilesPerTrigger=1 (file order = mtime order, seq makes the
    outcome order-independent anyway)."""
    batches = [
        [Row(k=1, v="a", seq=1, op="U"), Row(k=2, v="b", seq=2, op="U")],
        [Row(k=1, v="a2", seq=3, op="U"), Row(k=3, v="c", seq=4, op="U")],
        [Row(k=2, v=None, seq=5, op="D"), Row(k=4, v="d", seq=6, op="U")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows).coalesce(1).write.parquet(f"{d}/in/b{i}")
    # one flat dir of files for the stream source
    os.makedirs(f"{d}/stream", exist_ok=True)
    n = 0
    for i in range(len(batches)):
        for f in os.listdir(f"{d}/in/b{i}"):
            if f.endswith(".parquet"):
                os.rename(f"{d}/in/b{i}/{f}", f"{d}/stream/{i:03d}_{n}.parquet")
                n += 1


def test_upsert_view_converges_to_batch_merge(spark, tmp_path):
    d = str(tmp_path)
    _write_cdc_files(spark, d)
    schema = "k long, v string, seq long, op string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/stream")
    )
    view = UpsertParquetView(f"{d}/view", key_cols="k", seq_col="seq")
    run_upsert_stream(stream, view, checkpoint=f"{d}/ckpt")

    got = {(r.k, r.v) for r in view.read(spark).select("k", "v").collect()}
    # batch twin over ALL changes at once
    all_changes = spark.read.schema(schema).parquet(f"{d}/stream")
    empty = spark.createDataFrame([], "k long, v string, seq long")
    expect = {
        (r.k, r.v)
        for r in apply_changes(empty, all_changes, "k", "seq").select("k", "v").collect()
    }
    assert got == expect == {(1, "a2"), (3, "c"), (4, "d")}
    # multiple micro-batches actually ran (snapshot id advanced past 0)
    assert view.current_snapshot() is not None and view.current_snapshot() >= 2


def test_upsert_view_prunes_and_is_idempotent(spark, tmp_path):
    d = str(tmp_path)
    _write_cdc_files(spark, d)
    schema = "k long, v string, seq long, op string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/stream")
    )
    view = UpsertParquetView(f"{d}/view", key_cols="k", seq_col="seq", keep_snapshots=2)
    run_upsert_stream(stream, view, checkpoint=f"{d}/ckpt")

    snaps = sorted(e for e in os.listdir(f"{d}/view") if e.startswith("snapshot="))
    assert len(snaps) <= 2  # pruned to the retention window
    before = {(r.k, r.v) for r in view.read(spark).select("k", "v").collect()}
    committed = view.current_snapshot()

    # re-applying the last batch (restart replay) rewrites the same
    # snapshot and leaves the view unchanged
    last_batch = spark.createDataFrame(
        [Row(k=2, v=None, seq=5, op="D"), Row(k=4, v="d", seq=6, op="U")],
        schema,
    )
    view.apply_batch(last_batch, committed)
    after = {(r.k, r.v) for r in view.read(spark).select("k", "v").collect()}
    assert after == before
