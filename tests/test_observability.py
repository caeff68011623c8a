"""Per-stage timing parity (reference utils.py:7-15): decorator +
context manager record wall-clock and log without changing results."""

from __future__ import annotations

import logging

from medical_examination_data_etl_system_spark import observability
from medical_examination_data_etl_system_spark.observability import log_execution_time, timed_stage
from medical_examination_data_etl_system_spark.pipeline import process_records


def test_decorator_records_and_logs(caplog):
    observability.reset_timings()

    @log_execution_time
    def stage_x():
        return 41 + 1

    with caplog.at_level(logging.INFO, logger="medical_examination_data_etl_system_spark.timing"):
        assert stage_x() == 42
    assert "stage_x executed in" in caplog.text
    recorded = observability.recorded_timings()
    assert len(recorded["stage_x"]) == 1
    assert recorded["stage_x"][0] >= 0


def test_pipeline_stages_timed_without_changing_results(spark, caplog):
    observability.reset_timings()
    records = [{"RECORD_ID": "R1", "ORG_ID": "O", "LANG_NO": "1",
                "ITEMS": [{"ITEM_CODE": "X", "FINDINGS": [
                    {"DIAG_CODE": "D", "COMMENT": "c", "SUMMARY_CODE": "S"}]}]}]
    with caplog.at_level(logging.INFO, logger="medical_examination_data_etl_system_spark.timing"):
        out = process_records(spark, records).collect()
    assert len(out) == 1 and out[0]["record_id"] == "R1"
    stages = observability.recorded_timings()
    for expected in ("ingest_flatten", "resolve_dims", "enrich", "clean", "llm_rewrite", "render"):
        assert expected in stages, f"missing timed stage {expected}"


def test_timed_stage_context_manager_nests():
    observability.reset_timings()
    with timed_stage("outer"):
        with timed_stage("inner"):
            pass
    t = observability.recorded_timings()
    assert set(t) == {"outer", "inner"}
    assert t["outer"][0] >= t["inner"][0]
