"""Degenerate-input robustness: the engine must degrade gracefully
(empty results), never throw, on inputs the reference would choke on."""

from __future__ import annotations

from medical_examination_data_etl_system_spark.pipeline import process_records

from .fixtures import sample_request


def test_empty_batch(spark):
    assert process_records(spark, []).collect() == []


def test_record_with_no_items(spark):
    rec = {"RECORD_ID": "R9", "LANG_NO": "1", "ORG_ID": "O1", "ITEMS": []}
    assert process_records(spark, rec).collect() == []


def test_record_with_empty_findings(spark):
    rec = {
        "RECORD_ID": "R8",
        "LANG_NO": "1",
        "ORG_ID": "O1",
        "ITEMS": [{"ITEM_CODE": "I001", "FINDINGS": []}],
    }
    # posexplode_outer keeps the item row; the empty-comment filter then
    # drops it — no report remains.
    assert process_records(spark, rec).collect() == []


def test_all_blank_comments_dropped(spark):
    rec = {
        "RECORD_ID": "R7",
        "LANG_NO": "1",
        "ORG_ID": "O1",
        "ITEMS": [
            {"ITEM_CODE": "I001", "FINDINGS": [{"DIAG_CODE": "D1", "COMMENT": "   "}]}
        ],
    }
    assert process_records(spark, rec).collect() == []


def test_mixed_valid_and_degenerate_records(spark):
    records = sample_request() + [
        {"RECORD_ID": "R9", "LANG_NO": "1", "ORG_ID": "O1", "ITEMS": []}
    ]
    out = process_records(spark, records).collect()
    assert [r["record_id"] for r in out] == [r["RECORD_ID"] for r in sample_request()]
