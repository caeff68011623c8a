"""Multimodal columns: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a
metadata struct (modality, mime, width/height/duration…), processed by
Arrow-batched pandas functions over ``mapInPandas``:

- the Spark-side plumbing (schema, batching, partitioning, UDF
  signatures) is real and tested;
- the actual codec step is STUBBED: the image/audio libraries are not in
  this container. ``decode_stub=True`` (default) runs a deterministic
  fake featurizer (hash-derived statistics of the bytes) so pipelines
  and tests execute end-to-end; ``decode_stub=False`` raises
  NotImplementedError at the exact point a real decoder (PIL/ffmpeg)
  would plug in.

At 100 TB: binary payloads dominate row size — the frame should be
repartitioned by size (``maxPartitionBytes`` effectively caps rows per
task) and metadata-only queries must never touch the binary column
(column pruning keeps the scan cheap; keep binary in its own parquet
column chunk).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType(), True),  # image|audio|video
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder's feature vector:
    bytes of the sha256 digest scaled to [0, 1)."""
    digest = hashlib.sha256(payload).digest()
    return [b / 256.0 for b in digest[:n]]


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """media frame (MEDIA_SCHEMA) → per-item feature rows (FEATURE_SCHEMA).

    ``mapInPandas``: whole Arrow batches cross the boundary; a real
    decoder would process ``payload`` per row inside the batch loop.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this image; "
                    "plug the decoder in here"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["meta"].map(lambda m: m["modality"] if m else None),
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "digest": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "features": payloads.map(
                        lambda b: _fake_features(b) if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, target_w: int, target_h: int, decode_stub: bool = True
) -> DataFrame:
    """Resize pass: MEDIA_SCHEMA → MEDIA_SCHEMA with payload re-encoded
    at the target geometry. Real plumbing (Arrow batches in/out, same
    schema, metadata rewrite); stub codec: the 'resized' payload is the
    original truncated to ``target_w * target_h // 256`` bytes — a
    deterministic stand-in with the right shrinking behavior, so tests
    and oracles can check byte lengths end-to-end."""
    cap = max(target_w * target_h // 256, 1)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real resize requires an image codec (PIL) — plug it in here"
                )
            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(
                lambda b: bytes(b[:cap]) if b is not None else None
            )
            pdf["meta"] = pdf["meta"].map(
                lambda m: {**m, "width": target_w, "height": target_h} if m else None
            )
            yield pdf

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("offset_ms", T.IntegerType(), False),
        T.StructField("frame_digest", T.StringType(), True),
    ]
)


def sample_frames(
    media: DataFrame, every_ms: int = 5000, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (1→N fan-out
    inside ``mapInPandas`` — the batch shape a real ffmpeg seek loop
    would have). Frames at offsets 0, every_ms, … ≤ duration_ms, video
    rows only. Stub decode: frame_digest = md5(payload ++ '#' ++
    frame_no) — deterministic and reproducible by the SQL oracle."""
    videos = media.filter(F.col("meta.modality") == "video")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg — plug it in here"
                )
            out: dict[str, list] = {"media_id": [], "frame_no": [], "offset_ms": [], "frame_digest": []}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                duration = (meta or {}).get("duration_ms") or 0
                body = payload if payload is not None else b""
                for frame_no in range(duration // every_ms + 1):
                    out["media_id"].append(mid)
                    out["frame_no"].append(frame_no)
                    out["offset_ms"].append(frame_no * every_ms)
                    out["frame_digest"].append(
                        hashlib.md5(body + b"#" + str(frame_no).encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return videos.mapInPandas(_sample, schema=FRAME_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media frame derived from the documents table (the
    container ships no real media): payload = utf-8 text bytes, metadata
    from document stats. Exercises the full binary-column path."""
    mod = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            mod.alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            (F.col("n_chars") * 7).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
