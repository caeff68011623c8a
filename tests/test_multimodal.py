"""Multimodal binary-column plumbing: geometry/payload rewrite on
resize, 1→N frame fan-out, and the explicit NotImplementedError gate
where a real codec would plug in (SURVEY.md §2b X5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medical_examination_data_etl_system_spark.operators import multimodal
from medical_examination_data_etl_system_spark.queries import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load(spark, SF_DIR, "documents")
    return multimodal.synthesize_media_from_documents(docs).cache()


def test_resize_caps_payload_and_rewrites_meta(media):
    resized = multimodal.resize_media(media, target_w=320, target_h=240)
    rows = resized.select(
        F.length("payload").alias("n"), "meta.width", "meta.height"
    ).collect()
    assert rows
    cap = 320 * 240 // 256
    assert all(r["n"] <= cap for r in rows)
    assert all(r["width"] == 320 and r["height"] == 240 for r in rows)


def test_frame_sample_fanout_matches_duration(spark, media):
    frames = multimodal.sample_frames(media, every_ms=1000)
    got = {
        r["media_id"]: r["cnt"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("cnt")).collect()
    }
    want = {
        r["media_id"]: r["duration_ms"] // 1000 + 1
        for r in media.filter(F.col("meta.modality") == "video")
        .select("media_id", "meta.duration_ms")
        .collect()
    }
    assert got == want and got  # every video sampled, nothing else


def test_stub_gate_raises_where_codec_plugs_in(media):
    for op in (
        lambda m: multimodal.extract_features(m, decode_stub=False),
        lambda m: multimodal.resize_media(m, 64, 64, decode_stub=False),
        lambda m: multimodal.sample_frames(m, decode_stub=False),
    ):
        with pytest.raises(Exception) as exc:
            op(media).limit(1).collect()
        assert "NotImplementedError" in str(exc.value) or isinstance(
            exc.value, NotImplementedError
        )
