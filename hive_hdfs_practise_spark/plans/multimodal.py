"""Multimodal pipeline plan — binary-column decode via mapInPandas.

The payload here is UTF-8 text bytes standing in for image bytes
(no codecs in this container — see ``multimodal/binary_ops.py``);
what's REAL and oracle-checked is the Spark plumbing: binary column
construction, Arrow-batched mapInPandas with a typed output schema,
and deterministic per-payload metadata (sha256 digest + derived
pseudo-dimensions, identical bytes-in → values-out in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..multimodal.binary_ops import (
    FEATURE_DIM,
    decode_metadata,
    extract_features,
    from_documents,
    resize_stage,
    sample_frames,
)
from ..sources.catalog import table, wide_table
from .registry import register

# hex digit value via instr (shared cross-engine idiom, see
# functions/simhash.py): byte k of the digest = 16*nib(2k+1)+nib(2k+2)
_NIB = "(instr('0123456789abcdef', substring(sha256(text), {pos}, 1)) - 1)"
_B0 = f"(16 * {_NIB.format(pos=1)} + {_NIB.format(pos=2)})"
_B1 = f"(16 * {_NIB.format(pos=3)} + {_NIB.format(pos=4)})"


@register(
    "multimodal_decode_stub",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256,
           CAST(16 + {_B0} % 240 AS INTEGER) AS width,
           CAST(16 + {_B1} % 240 AS INTEGER) AS height
    FROM documents
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → binary payload table → Arrow-batched decode stage.
    The fake decoder derives dimensions from the payload digest, so
    the whole Python hop is value-checked against SQL."""
    media = from_documents(wide_table(spark, sf_dir, "documents"))
    return decode_metadata(media, fake=True)


RESIZE_W, RESIZE_H = 16, 16


@register(
    "multimodal_resize_stub",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST({RESIZE_W} AS INTEGER) AS width,
           CAST({RESIZE_H} AS INTEGER) AS height,
           sha256(sha256(text || '|{RESIZE_W}x{RESIZE_H}')) AS payload_sha256
    FROM documents
    """,
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage through mapInPandas: binary in, binary out (the
    fake resample emits the hex digest of payload+target as the new
    payload). The oracle re-derives the output digest with nested
    sha256 — the whole Arrow round trip is value-checked. The binary
    column itself is dropped only for the comparison (hashes stand
    for it)."""
    media = from_documents(wide_table(spark, sf_dir, "documents"))
    return resize_stage(media, RESIZE_W, RESIZE_H, fake=True).drop("payload")


FRAME_CHARS = 256
FRAME_EVERY = 2


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(i AS INTEGER) AS frame_idx,
           sha256(substring(text, i * {FRAME_CHARS} + 1, {FRAME_CHARS})) AS frame_sha256,
           CAST(length(substring(text, i * {FRAME_CHARS} + 1, {FRAME_CHARS})) AS INTEGER)
               AS n_frame_chars
    FROM (
        SELECT doc_id, text,
               unnest(generate_series(
                   0, CAST(ceil(length(text) / {FRAME_CHARS}.0) AS BIGINT) - 1,
                   {FRAME_EVERY})) AS i
        FROM documents
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampler (the video shape): every 2nd 256-char frame of
    each payload fans out to its own row through one mapInPandas hop
    — n inputs : m outputs through Arrow, each frame digested. The
    oracle rebuilds the sampled frames with a stepped
    generate_series."""
    media = from_documents(wide_table(spark, sf_dir, "documents"))
    return sample_frames(media, FRAME_CHARS, FRAME_EVERY)


_FEAT_BYTE = (
    "(16 * (instr('0123456789abcdef', substring(sha256(text), {p1}, 1)) - 1)"
    " + (instr('0123456789abcdef', substring(sha256(text), {p2}, 1)) - 1))"
)


@register(
    "multimodal_feature_extract",
    oracle="SELECT doc_id AS media_id, "
    + ", ".join(
        f"round({_FEAT_BYTE.format(p1=2 * k + 1, p2=2 * k + 2)} / 255.0, 6) AS f{k}"
        for k in range(FEATURE_DIM)
    )
    + " FROM documents",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extract stage: payload → 8-dim embedding
    (array<double> from the operator; projected to scalar columns
    for the value check). A real image encoder swap keeps the same
    mapInPandas signature and array<double> contract."""
    media = from_documents(wide_table(spark, sf_dir, "documents"))
    feats = extract_features(media, FEATURE_DIM)
    return feats.select(
        "media_id",
        *[
            F.round(F.element_at("feature", k + 1), 6).alias(f"f{k}")
            for k in range(FEATURE_DIM)
        ],
    )
