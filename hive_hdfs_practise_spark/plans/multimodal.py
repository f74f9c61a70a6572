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

from ..multimodal.binary_ops import decode_metadata, from_documents
from ..sources.catalog import table
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
    media = from_documents(table(spark, sf_dir, "documents"))
    return decode_metadata(media, fake=True)
