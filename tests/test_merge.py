"""Semantics tests for operators/merge.py (CDC apply, SCD2 intervals)
and the round-5 curation/streaming additions (domain_mix, watermarked
dedup) on small constructed frames — every MERGE path exercised
explicitly, independent of the oracle battery.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators import curation, merge
from medical_examination_data_etl_system_spark.streaming import (
    dedup_within_watermark,
    run_available_now,
)


def _base(spark):
    return spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )


def test_apply_changes_all_paths(spark):
    changes = spark.createDataFrame(
        [
            # k=1: two updates, seq 2 wins
            Row(k=1, v="a1", seq=1, op="U"),
            Row(k=1, v="a2", seq=2, op="U"),
            # k=2: update then delete — delete wins
            Row(k=2, v="b1", seq=1, op="U"),
            Row(k=2, v="b2", seq=2, op="D"),
            # k=4: insert (not in base)
            Row(k=4, v="d", seq=1, op="U"),
            # k=3 untouched: pass-through
        ]
    )
    out = merge.apply_changes(_base(spark), changes, "k", "seq").orderBy("k")
    assert [(r.k, r.v) for r in out.collect()] == [(1, "a2"), (3, "c"), (4, "d")]


def test_apply_changes_delete_then_reinsert(spark):
    """A delete followed by a later upsert re-creates the key (latest
    wins regardless of op kind)."""
    changes = spark.createDataFrame(
        [Row(k=1, v="x", seq=1, op="D"), Row(k=1, v="y", seq=2, op="U")]
    )
    out = merge.apply_changes(_base(spark), changes, "k", "seq").orderBy("k")
    assert [(r.k, r.v) for r in out.collect()] == [(1, "y"), (2, "b"), (3, "c")]


def test_apply_changes_schema_is_base_schema(spark):
    changes = spark.createDataFrame([Row(k=9, v="z", seq=1, op="U")])
    out = merge.apply_changes(_base(spark), changes, "k", "seq")
    assert out.columns == ["k", "v"]


def test_scd2_collapse_folds_runs(spark):
    log = spark.createDataFrame(
        [
            Row(k=1, t=1, s="A"),
            Row(k=1, t=2, s="A"),  # same state — folds into t=1 interval
            Row(k=1, t=3, s="B"),
            Row(k=1, t=4, s="A"),  # A again LATER: new interval, not merged
            Row(k=2, t=1, s="X"),
        ]
    )
    out = merge.scd2_intervals(log, "k", "t", ["s"]).orderBy("k", "valid_from")
    rows = [(r.k, r.s, r.valid_from, r.valid_to, r.is_current) for r in out.collect()]
    assert rows == [
        (1, "A", 1, 3, False),
        (1, "B", 3, 4, False),
        (1, "A", 4, None, True),
        (2, "X", 1, None, True),
    ]


def test_scd2_no_collapse_keeps_every_row(spark):
    log = spark.createDataFrame([Row(k=1, t=1, s="A"), Row(k=1, t=2, s="A")])
    out = merge.scd2_intervals(log, "k", "t", ["s"], collapse=False)
    assert out.count() == 2


def test_scd2_null_state_is_a_state(spark):
    """Null attribute values collapse null-safely: null==null folds,
    null→value opens a new interval."""
    log = spark.createDataFrame(
        [Row(k=1, t=1, s=None), Row(k=1, t=2, s=None), Row(k=1, t=3, s="A")],
        "k int, t int, s string",
    )
    out = merge.scd2_intervals(log, "k", "t", ["s"]).orderBy("valid_from")
    rows = [(r.s, r.valid_from, r.valid_to) for r in out.collect()]
    assert rows == [(None, 1, 3), ("A", 3, None)]


def test_point_in_time_join_picks_valid_version(spark):
    history = spark.createDataFrame(
        [
            Row(k=1, state="A", valid_from=1, valid_to=5),
            Row(k=1, state="B", valid_from=5, valid_to=None),
            Row(k=2, state="X", valid_from=3, valid_to=None),
        ],
        "k int, state string, valid_from int, valid_to int",
    )
    facts = spark.createDataFrame(
        [
            Row(k=1, ts=1),   # boundary: valid_from inclusive → A
            Row(k=1, ts=4),   # inside A
            Row(k=1, ts=5),   # boundary: valid_to exclusive → B
            Row(k=1, ts=99),  # open interval → B
            Row(k=2, ts=1),   # before first version → dropped (inner)
        ]
    )
    out = merge.point_in_time_join(facts, history, "k", "ts").orderBy("k", "ts")
    assert [(r.k, r.ts, r.state) for r in out.collect()] == [
        (1, 1, "A"), (1, 4, "A"), (1, 5, "B"), (1, 99, "B")
    ]
    # left join keeps pre-history facts with null state
    left = merge.point_in_time_join(facts, history, "k", "ts", how="left")
    assert left.count() == 5
    assert left.filter(F.col("state").isNull()).count() == 1


def test_point_in_time_join_never_duplicates_facts(spark):
    """Non-overlapping intervals ⇒ at most one match per fact, even
    with many versions per key."""
    hist = merge.scd2_intervals(
        spark.createDataFrame([Row(k=1, t=i, s=f"s{i}") for i in range(10)]),
        "k", "t", ["s"],
    )
    facts = spark.createDataFrame([Row(k=1, ts=i) for i in range(10)])
    assert merge.point_in_time_join(facts, hist, "k", "ts").count() == 10


def test_domain_mix_rates_and_monotonicity(spark):
    df = spark.createDataFrame([Row(id=i, src="a" if i % 2 else "b") for i in range(400)])
    mixed = curation.domain_mix(df, "src", "id", {"a": 100, "b": 0})
    got = {r.src for r in mixed.select("src").distinct().collect()}
    assert got == {"a"}  # rate 100 keeps all, rate 0 keeps none
    # monotone: the 30% sample of a domain ⊆ its 70% sample
    lo = set(r.id for r in curation.domain_mix(df, "src", "id", {"a": 30}, default_pct=30).collect())
    hi = set(r.id for r in curation.domain_mix(df, "src", "id", {"a": 70}, default_pct=70).collect())
    assert lo <= hi


def test_domain_mix_default_rate_applies_to_unlisted(spark):
    df = spark.createDataFrame([Row(id=i, src="zzz") for i in range(200)])
    n = curation.domain_mix(df, "src", "id", {"a": 0}, default_pct=50).count()
    assert 0 < n < 200  # ~50%, binomial around 100


def test_domain_mix_null_semantics(spark):
    """Null id → null bucket → filtered out (a row that can't be
    deterministically re-derived has no place in a reproducible
    sample); null domain key → the default rate applies."""
    df = spark.createDataFrame(
        [Row(id=None, src="a"), Row(id=1, src=None), Row(id=2, src="a")],
        "id int, src string",
    )
    kept = curation.domain_mix(df, "src", "id", {"a": 100}, default_pct=100)
    assert [(r.id, r.src) for r in kept.orderBy("id").collect()] == [
        (1, None), (2, "a")
    ]
    none_kept = curation.domain_mix(df, "src", "id", {"a": 100}, default_pct=0)
    assert [r.src for r in none_kept.collect()] == ["a"]


def test_domain_mix_is_map_only(spark):
    df = spark.createDataFrame([Row(id=1, src="a")])
    plan = curation.domain_mix(df, "src", "id", {"a": 10})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stream_dedup_within_watermark_collapses_redelivery(spark, sf_smoke):
    """Union of two identical file streams (every row delivered twice)
    → dropDuplicatesWithinWatermark emits each key exactly once."""
    from medical_examination_data_etl_system_spark.queries import load
    from medical_examination_data_etl_system_spark.streaming import read_events_stream

    path = f"{sf_smoke}/events.parquet"
    cols = ["user_id", "event_type", "ts"]
    a = read_events_stream(spark, path).select(*cols)
    b = read_events_stream(spark, path).select(*cols)
    out = run_available_now(
        dedup_within_watermark(a.unionByName(b), cols), "t_dedup_wm"
    )
    batch = load(spark, sf_smoke, "events").select(*cols).distinct()
    assert out.count() == batch.count()
    assert out.exceptAll(batch).count() == 0
