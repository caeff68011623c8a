"""Batch/stream parity for the Structured Streaming surface.

Every streaming operator is checked against the batch implementation of
the same semantics on the same data (sf0.001 events), drained with an
availableNow trigger.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.queries import load
from medical_examination_data_etl_system_spark.queries.events import (
    events_session_windows,
    events_tumbling_hourly,
)
from medical_examination_data_etl_system_spark.streaming import (
    read_events_stream,
    run_available_now,
    sessionize_stateful,
    stream_session_counts,
    stream_tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"
EVENTS = f"{SF_DIR}/events.parquet"


def _sorted_pdf(df, cols):
    return (
        df.orderBy(*cols)
        .toPandas()
        .reset_index(drop=True)
    )


def test_stream_tumbling_matches_batch(spark):
    stream = read_events_stream(spark, EVENTS)
    got = run_available_now(
        stream_tumbling_counts(stream), "tumbling_test", output_mode="complete"
    )
    want = events_tumbling_hourly(spark, SF_DIR)
    pd.testing.assert_frame_equal(
        _sorted_pdf(got, ["window_start", "event_type"]),
        _sorted_pdf(want, ["window_start", "event_type"]),
        check_dtype=False,
    )


def test_watermark_append_semantics(spark):
    """Append mode emits only windows finalized by the watermark: with
    delay D, windows ending after max(ts) − D stay in state (unemitted)
    when the availableNow drain finishes."""
    delay = "2 hours"
    stream = read_events_stream(spark, EVENTS)
    got = run_available_now(
        stream_tumbling_counts(stream, watermark=delay), "tumbling_append", output_mode="append"
    )
    batch = load(spark, SF_DIR, "events")
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    want = (
        events_tumbling_hourly(spark, SF_DIR)
        .filter(F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(max_ts) - F.expr(f"INTERVAL {delay}"))
    )
    assert got.count() > 0, "watermark drained everything — append emitted nothing"
    pd.testing.assert_frame_equal(
        _sorted_pdf(got, ["window_start", "event_type"]),
        _sorted_pdf(want, ["window_start", "event_type"]),
        check_dtype=False,
    )


def test_stream_session_native_matches_batch(spark):
    """Complete-mode drain of native streaming session windows equals the
    batch session_window aggregation."""
    stream = read_events_stream(spark, EVENTS)
    got = run_available_now(
        stream_session_counts(stream), "session_native", output_mode="complete"
    )
    want = events_session_windows(spark, SF_DIR)
    pd.testing.assert_frame_equal(
        _sorted_pdf(got, ["user_id", "session_start"]),
        _sorted_pdf(want, ["user_id", "session_start"]),
        check_dtype=False,
    )


def _expected_closed_sessions(spark, gap_minutes: int):
    """Batch ground truth: gap-based sessions per user, excluding each
    user's trailing (still-open) session."""
    from pyspark.sql import Window as W

    ev = load(spark, SF_DIR, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= gap_minutes * 60_000_000
            ),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(w))
    sess = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    last = W.partitionBy("user_id")
    return (
        sess.withColumn("_max_sid", F.max("session_id").over(last))
        .filter(F.col("session_id") < F.col("_max_sid"))
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    )


def test_stateful_sessionizer_single_batch(spark):
    stream = read_events_stream(spark, EVENTS)
    got = run_available_now(sessionize_stateful(stream, gap_minutes=15), "sess_stateful")
    want = _expected_closed_sessions(spark, 15)
    pd.testing.assert_frame_equal(
        _sorted_pdf(got, ["user_id", "session_start"]),
        _sorted_pdf(want, ["user_id", "session_start"]),
        check_dtype=False,
    )


def test_stateful_sessionizer_across_batches(spark, tmp_path):
    """State must carry sessions across micro-batches: the same events
    split into 4 time-ordered files, one file per trigger, must produce
    exactly the single-batch result."""
    ev = load(spark, SF_DIR, "events").orderBy("ts").toPandas()
    n = len(ev)
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    bounds = [0, n // 4, n // 2, 3 * n // 4, n]
    for i in range(4):
        part = ev.iloc[bounds[i] : bounds[i + 1]].copy()
        # Plain int64 nanos, matching EVENTS_SCHEMA's raw long ts.
        part["ts"] = part["ts"].astype("datetime64[ns]").astype("int64")
        path = stream_dir / f"part-{i}.parquet"
        part.to_parquet(path, index=False)
        # Strictly increasing mtimes: the file source orders by mod time.
        os.utime(path, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = read_events_stream(spark, str(stream_dir), max_files_per_trigger=1)
    got = run_available_now(sessionize_stateful(stream, gap_minutes=15), "sess_multi")
    want = _expected_closed_sessions(spark, 15)
    pd.testing.assert_frame_equal(
        _sorted_pdf(got, ["user_id", "session_start"]),
        _sorted_pdf(want, ["user_id", "session_start"]),
        check_dtype=False,
    )


def test_stateful_sessionizer_multi_chunk_keys(spark, tmp_path):
    """r12 adversarial-drain regression: a key's micro-batch rows arrive
    as SEVERAL Arrow chunks whose order follows the SOURCE FILE, not
    event time, and the fold must sort across chunks, not per chunk
    (found as a 260-row session diff vs the exact oracle at the
    10M-event drain, whose jittered part files are not ts-ordered).
    Reproduced at test scale by streaming a ts-SHUFFLED copy of the
    events file with tiny Arrow batches so every key spans chunks —
    this test fails on the per-chunk-sort fold."""
    ev = load(spark, SF_DIR, "events").toPandas()
    ev = ev.sample(frac=1.0, random_state=7)  # destroy ts order
    ev["ts"] = ev["ts"].astype("datetime64[ns]").astype("int64")
    stream_dir = tmp_path / "events_shuffled"
    stream_dir.mkdir()
    ev.to_parquet(stream_dir / "part-0.parquet", index=False)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        stream = read_events_stream(spark, str(stream_dir))
        got = run_available_now(
            sessionize_stateful(stream, gap_minutes=15), "sess_chunked"
        )
        want = _expected_closed_sessions(spark, 15)
        pd.testing.assert_frame_equal(
            _sorted_pdf(got, ["user_id", "session_start"]),
            _sorted_pdf(want, ["user_id", "session_start"]),
            check_dtype=False,
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
