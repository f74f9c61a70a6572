"""Multimodal (binary-column) pipeline plumbing.

Design for image/audio/video at 100 TB: payloads are opaque
``binary`` columns with a typed metadata struct alongside; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each Python worker touches a whole batch
of payloads at once and the JVM never materializes decoded frames.

The decode step itself is STUBBED in this container (no
PIL/ffmpeg/librosa here): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (sha256-derived pseudo-dimensions)
stands in. Everything AROUND the stub — schema, batch iteration,
partition sizing, output contract — is real and tested, so swapping
in a real codec is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """Real decode is unavailable in this container — STUB.

    fake=True → deterministic pseudo-dimensions derived from the
    payload hash (stable across runs/engines), keeping the pipeline
    end-to-end testable."""
    if not fake:
        raise NotImplementedError(
            "image codec not available in this environment; pass fake=True "
            "or swap in PIL.Image.open at deployment"
        )
    h = hashlib.sha256(payload or b"").digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def decode_metadata(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode stage: binary payload → (size, sha256,
    dimensions). Arrow-batched; per-batch Python cost is one loop
    over payload bytes, no per-row serialization round trips."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode_image(p, fake=fake) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int64"),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                }
            )

    return media.mapInPandas(run, DECODED_SCHEMA)


def from_documents(documents: DataFrame) -> DataFrame:
    """Derive a media table from the text corpus (payload =
    UTF-8-encoded text) — the deterministic stand-in for real image
    bytes used by tests and the oracle-checked plan."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            F.length("text").cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )
