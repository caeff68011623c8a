"""Property tests (SURVEY.md §5.3): cleaning idempotence, language-
default totality, dedup stability, renderer determinism — over
hypothesis-generated record batches.

Example counts are small: every example round-trips through Spark.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.pipeline import process_records
from medical_examination_data_etl_system_spark.pipeline.clean import postprocess_multilang
from medical_examination_data_etl_system_spark.pipeline.dims import fallback_dims
from medical_examination_data_etl_system_spark.pipeline.enrich import enrich
from medical_examination_data_etl_system_spark.pipeline.ingest import flatten, records_to_df
from medical_examination_data_etl_system_spark.schemas import SUBSET

_TEXT = st.text(
    alphabet="abcXYZ 範例（）\r\n：，。", min_size=0, max_size=12
)

_FINDING = st.fixed_dictionaries(
    {"DIAG_CODE": st.sampled_from(["D1", "D2", " D1 "]), "COMMENT": _TEXT}
)
_ITEM = st.fixed_dictionaries(
    {
        "ITEM_CODE": st.sampled_from(["I001", "I002", "I003"]),
        "FINDINGS": st.lists(_FINDING, min_size=0, max_size=3),
    }
)
_RECORD = st.builds(
    lambda rid, lang, items: {
        "RECORD_ID": rid,
        "LANG_NO": lang,
        "ORG_ID": "OrgA",
        "ITEMS": items,
    },
    rid=st.sampled_from(["R1", "R2", "R3"]),
    lang=st.sampled_from(["1", "2", "3", "4"]),
    items=st.lists(_ITEM, min_size=1, max_size=3),
)
_BATCH = st.lists(_RECORD, min_size=1, max_size=3, unique_by=lambda r: r["RECORD_ID"])

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _cleaned(spark, records):
    flat = flatten(records_to_df(spark, records))
    return postprocess_multilang(enrich(flat, fallback_dims(flat)))


@given(records=_BATCH)
@_SETTINGS
def test_cleaning_idempotent_and_total(spark, records):
    cleaned = _cleaned(spark, records)
    once = cleaned.select(*SUBSET).orderBy("RECORD_ID", "ord")
    twice = postprocess_multilang(cleaned).select(*SUBSET).orderBy("RECORD_ID", "ord")
    assert once.collect() == twice.collect()

    # F6 totality: no empty SUMMARY/GROUP name columns survive cleaning.
    for col in (
        "TCNAME_SUMMARY", "ENNAME_SUMMARY", "JPNAME_SUMMARY", "SCNAME_SUMMARY",
        "TCNAME_GROUP", "ENNAME_GROUP", "JPNAME_GROUP", "SCNAME_GROUP",
    ):
        assert cleaned.filter(F.col(col) == "").count() == 0, col


@given(records=_BATCH)
@_SETTINGS
def test_renderer_deterministic(spark, records):
    a = {r["record_id"]: r["report"] for r in process_records(spark, records).collect()}
    b = {r["record_id"]: r["report"] for r in process_records(spark, records).collect()}
    assert a == b
