"""Arrow-vectorized cosine scoring — the SIMD/BLAS alternative to
the JVM higher-order-function fold in ``functions/vectors.py``.

Spark interprets higher-order array lambdas (``zip_with`` +
``aggregate``) row by row, so a full-corpus cosine scan pays an
interpreter visit per vector component. This path ships each
partition to Python as Arrow record batches (``mapInPandas``) and
scores a whole batch with one BLAS matrix-vector product — the
"GPU-ish" shape: swap ``numpy`` for ``cupy`` and the same operator
runs on an accelerator. Per-batch cost is one ``(batch × dim) @
(dim,)`` GEMV plus one norm pass, amortizing the Python boundary
over thousands of rows.

Trade-off vs the JVM fold: Arrow serialization per batch vs
interpreted lambda per row. Measured at sf0.1 (10k × 64-dim,
local[32]) the two are within noise (~0.6 s end to end); the
vectorized path wins as ``dim`` grows (the GEMV is O(dim) SIMD
flops per row vs O(dim) interpreter steps) and is the only shape
that extends to GPU execution. Results are identical after
``round(..., 6)`` — ulp-level differences between BLAS pairwise
summation and the sequential JVM fold sit ~10 orders of magnitude
below the rounding grain (unit-tested exactly equal vs
``knn_brute_cosine``).

The query vector is fetched driver-side (one row — the same
broadcast-a-scalar pattern as the JVM path) and closed over by the
batch function; the corpus never leaves executors.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cosine_scores_vectorized(
    emb: DataFrame, qv: list[float], vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id_col, cosine) for every row of ``emb``: one BLAS GEMV per
    Arrow batch. Zero-norm rows (and a zero-norm query) score 0.0,
    matching ``functions/vectors.py::cosine`` totality.

    The raw cosine leaves Python and the 6-dp rounding happens
    JVM-side with ``F.round`` — ``np.round`` is scaled-float
    half-even and can differ in the last digit from the BigDecimal
    HALF_UP semantics Spark and DuckDB share, so rounding in the
    plan keeps this path bit-identical to the JVM fold's output on
    adversarial values."""
    q = np.asarray(qv, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            norms = np.linalg.norm(m, axis=1)
            denom = norms * qn
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0, (m @ q) / denom, 0.0)
            yield pd.DataFrame({id_col: pdf[id_col], "cosine": cos})

    return emb.select(id_col, vec_col).mapInPandas(
        score, schema=f"{id_col} BIGINT, cosine DOUBLE"
    ).select(id_col, F.round("cosine", 6).alias("cosine"))


def brute_cosine_topk_vectorized(
    emb: DataFrame,
    query_vec_id: int,
    top_k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of a stored vector, scored with
    the vectorized path; TakeOrderedAndProject keeps k per partition
    (no global sort)."""
    qv = (
        emb.filter(F.col(id_col) == query_vec_id)
        .select(F.col(vec_col).cast("array<double>"))
        .head()[0]
    )
    scored = cosine_scores_vectorized(
        emb.filter(F.col(id_col) != query_vec_id), qv, vec_col, id_col
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(top_k)
