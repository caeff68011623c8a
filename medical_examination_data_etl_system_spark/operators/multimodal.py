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
