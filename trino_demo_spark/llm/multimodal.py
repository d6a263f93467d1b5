"""Multimodal column plumbing (SURVEY.md §2.10 `llm_multimodal_cols`).

Modality payloads are opaque BinaryType columns with a typed metadata
struct alongside; decode / feature-extract run as Arrow-batched
mapInPandas over those columns. The decode kernels for real media need
image/audio libraries that are NOT in this container, so they are stubbed
behind NotImplementedError — but the Spark-side plumbing (schema, batch
iteration, partitioning, output contract) is real and tested, and a
deterministic byte-level feature extractor exercises the full path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_sig", T.LongType()),
    ]
)


def attach_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", mime: str = "text/plain"
) -> DataFrame:
    """Build a multimodal frame: opaque binary payload + typed metadata
    struct. For the testdata the payload is the utf-8 encoded text; for
    real media it would be the raw image/audio bytes read from object
    storage (binaryFile source)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"), F.octet_length(payload).cast("long").alias("n_bytes")
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":  # pragma: no cover - stub
    """Decode an image payload to HxWxC. Requires an imaging library not
    present in this container — STUB (SURVEY.md §2.10 contract)."""
    raise NotImplementedError("image decode requires PIL/opencv; not in container")


def decode_audio(payload: bytes) -> "object":  # pragma: no cover - stub
    """Decode audio to PCM samples. STUB — audio libs not in container."""
    raise NotImplementedError("audio decode requires soundfile/ffmpeg; not in container")


def frame_sample(payload: bytes, every_n: int = 30) -> "list":  # pragma: no cover
    """Sample video frames. STUB — video libs not in container."""
    raise NotImplementedError("video decode requires ffmpeg; not in container")


def byte_head_signature(payload: bytes, head: int = 16) -> int:
    """Deterministic stand-in feature: sum of the first `head` byte values
    mod 997. Exercises the real batch path end-to-end."""
    return sum(payload[:head]) % 997


def extract_features(media: DataFrame, head: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas: the exact shape a real image/audio featurizer would use
    (batch in, batch out; heavy decode inside the iterator; output schema
    declared up front). Partitioning and batch sizes are inherited from
    the scan — at scale, repartition by payload size bins first to even
    out skew from large media files."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "head_sig": payloads.map(
                        lambda p: byte_head_signature(bytes(p), head)
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)
