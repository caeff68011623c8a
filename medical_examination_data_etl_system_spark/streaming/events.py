"""Streaming event-time operators over the events table.

Design notes (100 TB posture):
- File-source streams read incrementally (``maxFilesPerTrigger`` bounds
  per-batch volume); state stores are per-key and RocksDB-backed on a
  real cluster (``spark.sql.streaming.stateStore.providerClass``).
- Watermarks bound state: windowed aggregations drop state for windows
  older than the watermark; late events beyond the delay are dropped —
  tested in ``tests/test_streaming.py::test_watermark_append_semantics``.
- The stateful sessionizer keeps O(1) state per user (open session
  accumulator), not the event list — state size is #active-users, not
  #events.
"""

from __future__ import annotations

import time
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Raw file schema, parameterized on the physical ts type: testdata
# generators have emitted events.ts both as TIMESTAMP(NANOS) — which
# Spark's reader rejects as a timestamp, so it is read as raw nano longs
# (legacy.parquet.nanosAsLong) and converted — and as plain
# TIMESTAMP(MICROS), which reads directly. ``read_events_stream`` probes
# the footer via a batch read (streams can't infer) and picks the right
# variant; mirrors ``queries.load``'s conditional batch-side handling.
def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


EVENTS_SCHEMA = _events_schema(T.LongType())


_TS_PROBE_CACHE: dict = {}


def _ts_is_nanos(spark: SparkSession, path: str) -> bool:
    import os

    mtime = os.path.getmtime(path) if os.path.exists(path) else 0
    key = (os.path.realpath(path), mtime)
    if key not in _TS_PROBE_CACHE:
        from medical_examination_data_etl_system_spark.queries import _read_with_nanos_as_long

        _TS_PROBE_CACHE[key] = (
            dict(_read_with_nanos_as_long(spark, path).dtypes).get("ts") == "bigint"
        )
    return _TS_PROBE_CACHE[key]


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over event parquet (a file, directory, or glob).

    Explicit schema — streaming sources cannot infer (and the engine
    never relies on inference, SURVEY.md §1.2).
    """
    import os

    # Probe the physical ts type with a scoped batch read (cheap: footer
    # only; on the pre-glob path — batch reads take files directly).
    # TIMESTAMP(NANOS) resolves to bigint under nanosAsLong;
    # TIMESTAMP(MICROS) resolves to timestamp[_ntz] and needs no
    # conversion. Memoized per (path, mtime): the probe costs a footer
    # read per stream CONSTRUCTION, which the bench builds per rep —
    # mtime in the key keeps regenerated files honest.
    ts_is_nanos = _ts_is_nanos(spark, path)
    # FileStreamSource requires a directory or glob; turn a plain file
    # path into a glob matching exactly that file ("x.parquet" →
    # "x.parque[t]") so the source's basePath resolves to its directory.
    if os.path.isfile(path):
        path = f"{path[:-1]}[{path[-1]}]"
    if ts_is_nanos:
        # Session-wide by necessity for the STREAM's lifetime: each
        # microbatch re-reads parquet footers at trigger time, so the
        # conf must hold while the query runs (there is no per-read
        # nanosAsLong option — verified: .option("nanosAsLong") still
        # throws PARQUET_TYPE_ILLEGAL). Batch reads scope it instead
        # (queries._read_with_nanos_as_long).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = _events_schema(T.LongType() if ts_is_nanos else T.TimestampType())
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if ts_is_nanos:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


# ---------------------------------------------------------------------------
# Windowed aggregations — streaming twins of queries/events.py
# ---------------------------------------------------------------------------


def stream_tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows per event type (streaming twin of
    ``events_tumbling_hourly``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def stream_sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time windows (streaming twin of
    ``events_sliding_windows``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def stream_session_counts(
    events: DataFrame, gap: str = "15 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows per user (streaming twin of
    ``events_session_windows``). Streaming session windows REQUIRE a
    watermark (state must be boundable)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "sum_value")
    )


def dedup_within_watermark(
    events: DataFrame,
    subset: list[str],
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exactly-once dedup: drop rows whose ``subset`` key was
    already seen within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``):
    state for a key is EVICTED once the watermark passes its event
    time, so state size is bounded by the key arrival rate × watermark
    horizon instead of growing forever — the only dedup formulation
    that survives an unbounded stream. At-least-once sources (Kafka
    redelivery, file-source reprocessing) become exactly-once for any
    downstream agg as long as redelivery happens inside the horizon.

    ``subset`` must include the event-time column (here duplicates
    carry the same ``ts``, so redeliveries always land inside the
    horizon of the first copy).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(subset)


# ---------------------------------------------------------------------------
# Stream-stream join
# ---------------------------------------------------------------------------


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: attribute each purchase to
    every click by the same user within ``horizon_minutes`` before it.

    Both sides carry watermarks and the join has a two-sided time bound
    — the two conditions Spark needs to evict join state (a click older
    than watermark + horizon can never match again). Without them, a
    stream-stream join's state grows without bound.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        "value",
    ).withWatermark("purchase_ts", watermark)
    cond = F.expr(
        f"user_id = c_user AND purchase_ts >= click_ts "
        f"AND purchase_ts < click_ts + INTERVAL {horizon_minutes} MINUTES"
    )
    return p.join(c, cond, "inner").select(
        "user_id",
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        F.round("value", 2).alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: gap-based sessionizer via applyInPandasWithState
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)

# Open-session accumulator: start/last as epoch microseconds. O(1) per user.
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("last_us", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)

_US_PER_MIN = 60_000_000


def _make_sessionizer(gap_minutes: int):
    gap_us = gap_minutes * _US_PER_MIN

    def sessionize(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us = last_us = None
            n, sv = 0, 0.0

        closed: list[tuple[int, int, int, float]] = []
        # Concat the key's Arrow chunks BEFORE the sort (the EWMA
        # folder's pattern): a key's micro-batch rows arrive as several
        # chunks in arbitrary post-shuffle order, and sorting each chunk
        # individually folds chunk 2's earlier timestamps after chunk
        # 1's later ones — found as a 260-row session diff vs the exact
        # oracle on the 10M-event adversarial drain (r12), invisible at
        # driver scale where every key fits one chunk.
        frames = [pdf for pdf in pdfs]
        if frames:
            pdf = pd.concat(frames).sort_values("ts")
            # Force microsecond resolution: Arrow may deliver ns or us.
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            vals = pdf["value"].to_numpy()
            for t_us, v in zip(ts_us, vals):
                if start_us is None:
                    start_us, last_us, n, sv = int(t_us), int(t_us), 1, float(v)
                elif t_us - last_us >= gap_us:
                    closed.append((start_us, last_us, n, sv))
                    start_us, last_us, n, sv = int(t_us), int(t_us), 1, float(v)
                else:
                    last_us, n, sv = int(t_us), n + 1, sv + float(v)

        state.update((start_us, last_us, n, sv))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [round(c[3], 2) for c in closed],
                }
            )

    return sessionize


def sessionize_stateful(events: DataFrame, gap_minutes: int = 15) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator.

    Emits a session row when a subsequent event from the same user
    arrives ≥ gap after the session's last event (i.e. CLOSED sessions;
    each user's open trailing session stays in state awaiting more
    events — correct unbounded-stream semantics). A new session starts
    when the inter-event gap is ≥ gap. NOTE: this custom operator
    deliberately keeps the ≥-split convention — the OPPOSITE boundary
    to Spark's native ``session_window``, which merges end-inclusively
    (splits only when the gap is STRICTLY greater; r12 finding) — and
    its DuckDB oracle uses the matching ``>=`` lag/cumsum rule.

    This is the engine's template for operators Spark lacks natively:
    per-key state via ``applyInPandasWithState`` with an explicit state
    schema, Arrow-batched, O(1) state per key.
    """
    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_minutes),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: per-key running EWMA via applyInPandasWithState
# ---------------------------------------------------------------------------

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ewma", T.DoubleType(), True),
    ]
)

_EWMA_STATE_SCHEMA = T.StructType([T.StructField("acc", T.DoubleType(), True)])


def _make_ewma_folder(alpha: float):
    decay = 1.0 - alpha

    def fold(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        # acc is None once a NULL value has entered the user's stream:
        # the batch oracle's list_reduce folds the NULL in, so every
        # subsequent prefix fold is NULL — mirror that poisoning
        # EXPLICITLY (None stays None) instead of letting float(None)
        # become NaN, which would diverge from the oracle's NULL and
        # hash-mismatch (ADVICE r5).
        acc = state.get[0] if state.exists else 0.0
        frames = [pdf for pdf in pdfs]
        pdf = pd.concat(frames).sort_values(["ts", "event_id"]) if frames else None
        ids: list[int] = []
        vals: list[float | None] = []
        if pdf is not None:
            for eid, v in zip(pdf["event_id"].to_numpy(), pdf["value"].to_numpy()):
                if acc is None or pd.isna(v):
                    acc = None
                else:
                    acc = acc * decay + float(v) * alpha
                ids.append(int(eid))
                vals.append(acc)
        state.update((acc,))
        if ids:
            yield pd.DataFrame(
                {"user_id": [user_id] * len(ids), "event_id": ids, "ewma": vals}
            )

    return fold


def running_ewma_stateful(events: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Per-user running EWMA over the UNBOUNDED stream — the numeric
    companion to the sessionizer: O(1) state (one double) per key,
    Arrow-batched, append-mode per-event emission.

    The fold is the identical correctly-rounded ``acc·(1−α) + x·α``
    sequence the batch oracle replays (α = 0.25, exactly representable),
    so drained output hash-matches an unbounded list_reduce per user —
    the batch/stream consistency the engine pins for every streaming
    operator. Events fold in (ts, event_id) order within and across
    micro-batches (state carries the accumulator forward).

    ORDER PRECONDITION (ADVICE r5): the sort is per MICRO-BATCH — the
    fold is bit-exact against the batch oracle only when events arrive
    in global (ts, event_id) order across batches, i.e. a single
    availableNow batch (this repo's drain path) or a source whose
    files/offsets are time-ordered. Do NOT set maxFilesPerTrigger over
    an unordered file directory for this operator: a later file folding
    before an earlier one reorders the recurrence. (Exact out-of-order
    folding needs event-time buffering + watermark eviction — a
    different operator contract.) NULL values poison the user's
    accumulator to NULL from that event onward, exactly matching the
    oracle's list_reduce-over-NULL semantics.
    """
    return events.select("user_id", "ts", "event_id", "value").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _make_ewma_folder(alpha),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Sinks
# ---------------------------------------------------------------------------


def run_available_now(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    timeout_sec: int = 300,
    state_partitions: int = 8,
) -> DataFrame:
    """Drain the stream's available data into an in-memory table and
    return it as a batch DataFrame (test/driver harness path).

    ``state_partitions`` sizes the stateful shuffle for the drain. A
    streaming query's state-store count is a per-query deployment knob
    (``spark.sql.shuffle.partitions`` at the FIRST checkpoint fixes it
    for the query's lifetime): a watermarked stream-stream join keeps
    four state stores per partition, so a count sized for batch
    analytics pays state-store maintenance per partition per microbatch
    regardless of volume. Production queries size it to peak key
    cardinality; the harness drains bounded test volumes, so a small
    fixed count is the honest setting. The session default is restored
    after the drain (the batch plans before/after are unaffected — the
    materialized result is what's returned).
    """
    spark = stream_df.sparkSession
    name = f"{name}_{int(time.time() * 1000) % 10_000_000}"  # unique per run
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_sec)
        finally:
            if q.isActive:
                q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def write_parquet_stream(
    stream_df: DataFrame, path: str, checkpoint: str, output_mode: str = "append"
):
    """Production sink: parquet files + checkpointed offsets/state, so a
    restarted query resumes exactly-once from the checkpoint."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .start()
    )
