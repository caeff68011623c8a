"""End-to-end streaming of the report pipeline: record files arriving in
micro-batches must yield exactly the batch pipeline's reports."""

from __future__ import annotations

import json

from medical_examination_data_etl_system_spark.pipeline import process_records
from medical_examination_data_etl_system_spark.streaming.pipeline import (
    read_records_stream,
    stream_reports,
)

from .fixtures import multilang_edge_batch, sample_request


def test_stream_reports_matches_batch(spark, tmp_path):
    batch1 = sample_request()
    batch2 = multilang_edge_batch()
    src = tmp_path / "records_in"
    src.mkdir()
    for i, batch in enumerate([batch1, batch2]):
        with open(src / f"batch-{i}.jsonl", "w", encoding="utf-8") as f:
            for r in batch:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")

    out = str(tmp_path / "reports_out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_records_stream(spark, str(src), max_files_per_trigger=1)
    q = stream_reports(stream, out, ckpt)
    q.awaitTermination(300)

    got = {
        r["record_id"]: r["report"] for r in spark.read.parquet(out).collect()
    }
    want = {}
    for batch in [batch1, batch2]:
        for r in process_records(spark, batch).collect():
            want[r["record_id"]] = r["report"]
    assert got == want
    assert len(got) == len(batch1) + len(batch2)


def test_stream_reports_releases_caches_per_batch(spark, tmp_path):
    """ADVICE r13: each foreachBatch invocation persists the cleaned
    fact inside its own cache_scope — nothing may leak onto the
    process-global tracked list across micro-batches."""
    import json

    from medical_examination_data_etl_system_spark.operators.cache import tracked_frames
    from medical_examination_data_etl_system_spark.streaming.pipeline import (
        read_records_stream,
        stream_reports,
    )

    from .fixtures import sample_request

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rec = dict(sample_request()[0])
    (in_dir / "r1.json").write_text(json.dumps(rec) + "\n")

    before = len(tracked_frames())
    q = stream_reports(
        read_records_stream(spark, str(in_dir), max_files_per_trigger=1),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    assert len(tracked_frames()) == before
