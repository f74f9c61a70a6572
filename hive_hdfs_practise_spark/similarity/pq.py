"""Arrow-vectorized product-quantization passes.

The declarative Lloyd assignment (component rows joined to broadcast
codebook components, two aggregates per round) shuffles
O(n * d * K) rows per round: measured 5.4 / 31.4 / 125.9 s at
1x/10x/40x for knn_pq_adc with the three assignment rounds dominant.
Each pass here replaces one round with a single ``mapInPandas`` scan
emitting per-partition per-centroid component sums (<= M * K * SUBDIM
rows per partition) — the same treeAggregate shape as
``similarity/comoment.py``, with the codebook carried in the closure
(it is M * K * SUBDIM = 1024 ints — driver-state, like IVF's
centroid table).

Exactness contract (what lets the SQL oracle stay unchanged):
components quantize HALF_UP to 1e6-scaled int64; distances are exact
int64 (expansion form, every term <= 8 * (2e6)^2); ``argmin`` takes
the FIRST minimum, which with centroid rows sorted by cid is exactly
the engines' ``min(struct(dist, cid))`` tie rule; centroid updates
divide with TRUNCATION toward zero (Spark ``div`` and DuckDB ``//``
both truncate; Python ``//`` floors and must NOT be used on the
possibly-negative sums)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

COMOMENT_SCALE = 1_000_000


def _quantize(col) -> "object":
    import numpy as np

    X = np.stack(col.to_numpy()).astype(np.float64) * COMOMENT_SCALE
    return np.where(X >= 0, np.floor(X + 0.5), np.ceil(X - 0.5)).astype(
        np.int64
    )


def trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — Spark ``div`` /
    DuckDB ``//`` semantics (Python ``//`` floors)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _assign(Xs, C):
    """(batch, k) exact int64 squared distances -> first-argmin
    codes. C rows MUST be sorted by cid ascending."""
    xn = (Xs * Xs).sum(axis=1)
    cn = (C * C).sum(axis=1)
    D = xn[:, None] - 2 * (Xs @ C.T) + cn[None, :]
    return D.argmin(axis=1), D


def _residualize(X, coarse):
    """Subtract each row's nearest coarse centroid (IVFPQ residual
    encoding). ``coarse``: (cids, C) over the FULL dimension; exact
    int64 (|x - c| <= 4e6, squared sums <= 64 * 1.6e13)."""
    cids, C = coarse
    a, _ = _assign(X, C)
    return X - C[a], a


def pq_update_pass(
    emb: DataFrame,
    cents: dict,
    m: int,
    sd: int,
    coarse: tuple | None = None,
    rot: "object | None" = None,
) -> DataFrame:
    """One Lloyd round: per-partition member-component sums + counts
    per (subspace, cid). ``cents``: {s: (cids int64[k], C int64[k,sd])}
    with cids ascending. With ``coarse``, the subspace codebooks
    train on coarse-quantizer RESIDUALS (IVFPQ). With ``rot`` (a
    d x d +-1 integer matrix), rows rotate X @ rot.T right after
    quantization (OPQ) — exact int64: |x| <= 2e6 per component, d=64
    signed terms, |y| <= 1.28e8."""

    def f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        sums: dict = {}
        cnts: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            X = _quantize(pdf["embedding"])
            if rot is not None:
                X = X @ rot.T
            if coarse is not None:
                X, _ = _residualize(X, coarse)
            for s in range(m):
                Xs = X[:, s * sd : (s + 1) * sd]
                cids, C = cents[s]
                a, _ = _assign(Xs, C)
                for idx in range(len(cids)):
                    mask = a == idx
                    c = int(mask.sum())
                    if not c:
                        continue
                    key = (s, int(cids[idx]))
                    sv = Xs[mask].sum(axis=0)
                    if key in sums:
                        sums[key] = sums[key] + sv
                        cnts[key] += c
                    else:
                        sums[key] = sv.copy()
                        cnts[key] = c
        if not sums:
            return
        rs, rc, ri, rsum, rcnt = [], [], [], [], []
        for (s, cid), sv in sums.items():
            for i in range(sd):
                rs.append(s)
                rc.append(cid)
                ri.append(i + 1)
                rsum.append(int(sv[i]))
                rcnt.append(cnts[(s, cid)])
        yield pd.DataFrame(
            {
                "s": pd.Series(rs, dtype="int32"),
                "cid": pd.Series(rc, dtype="int32"),
                "i": pd.Series(ri, dtype="int32"),
                "ssum": pd.Series(rsum, dtype="int64"),
                "cnt": pd.Series(rcnt, dtype="int64"),
            }
        )

    return emb.select("embedding").mapInPandas(
        f, "s int, cid int, i int, ssum long, cnt long"
    )


def pq_score_pass(
    emb: DataFrame,
    cents: dict,
    dq: dict,
    query_vec_id: int,
    m: int,
    sd: int,
    coarse: tuple | None = None,
    probe_lists: "set | None" = None,
    rot: "object | None" = None,
) -> DataFrame:
    """Final encode + ADC in one scan: per vector, the exact integer
    sum over subspaces of the query-to-centroid distance of its
    code. Plain PQ: ``dq`` = {(s, cid): dist}. IVFPQ (``coarse`` +
    ``probe_lists`` set): vectors encode as residuals, only rows in
    probed coarse lists survive (the inline form of the bucket-pruned
    index scan), and ``dq`` = {(list, s, cid): dist} — the query
    residual differs per list."""

    def f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            X = _quantize(pdf["embedding"])
            if rot is not None:
                X = X @ rot.T
            vids = pdf["vec_id"].to_numpy()
            if coarse is not None:
                X, ca = _residualize(X, coarse)
                clist = coarse[0][ca]
                keep0 = np.isin(clist, list(probe_lists))
                X, vids, clist = X[keep0], vids[keep0], clist[keep0]
                if not len(vids):
                    continue
            adc = np.zeros(len(vids), dtype=np.int64)
            for s in range(m):
                Xs = X[:, s * sd : (s + 1) * sd]
                cids, C = cents[s]
                a, _ = _assign(Xs, C)
                if coarse is None:
                    lut = np.array(
                        [dq[(s, int(cid))] for cid in cids], dtype=np.int64
                    )
                    adc += lut[a]
                else:
                    for L in probe_lists:
                        lut = np.array(
                            [dq[(L, s, int(cid))] for cid in cids],
                            dtype=np.int64,
                        )
                        mask = clist == L
                        adc[mask] += lut[a[mask]]
            keep = vids != query_vec_id
            yield pd.DataFrame(
                {
                    "vec_id": pd.Series(vids[keep], dtype="int64"),
                    "adc_fp": pd.Series(adc[keep], dtype="int64"),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        f, "vec_id long, adc_fp long"
    )


def opq_rotation(d: int) -> "object":
    """Deterministic structured rotation S = H_d · D: the Sylvester
    Hadamard (h_ij = (-1)^popcount(i & j), 0-indexed) times an
    md5-seeded ±1 sign diagonal (d_j = -1 iff the first hex nibble of
    md5("opq:<j>") is odd — the house portable hash family). Entries
    are ±1 and SᵀS = d·I, so rotating EXACT integer vectors preserves
    squared distances exactly, scaled by d: ‖S(a-b)‖² = d·‖a-b‖².
    This is the FJLT / FAISS-style structured random rotation that
    decorrelates subspaces for PQ without training (OPQ's cheap,
    deterministic cousin — Ge et al. CVPR'13 train R; HD sign-flip
    rotations are the standard drop-in at scale)."""
    import hashlib

    import numpy as np

    assert d & (d - 1) == 0, "Sylvester Hadamard needs a power of 2"
    H = np.array(
        [
            [-1 if bin(i & j).count("1") % 2 else 1 for j in range(d)]
            for i in range(d)
        ],
        dtype=np.int64,
    )
    sign = np.array(
        [
            -1
            if int(hashlib.md5(f"opq:{j}".encode()).hexdigest()[0], 16) % 2
            else 1
            for j in range(d)
        ],
        dtype=np.int64,
    )
    return H * sign[None, :]


def quantize_rows(vectors) -> "object":
    """Driver-side HALF_UP quantization of a list of float vectors —
    same formula as the per-batch `_quantize`."""
    import numpy as np

    X = np.array(vectors, dtype=np.float64) * COMOMENT_SCALE
    return np.where(X >= 0, np.floor(X + 0.5), np.ceil(X - 0.5)).astype(
        np.int64
    )


def vq_assign_pass(emb: DataFrame, cents: tuple) -> DataFrame:
    """Plain vector-quantizer assignment in ONE Arrow scan:
    (vec_id, cid, xi) where cid is the exact-integer-distance argmin
    (first minimum == lowest cid, cids ascending) and xi is the row's
    1e6-quantized int64 component vector (carried so consumers — e.g.
    the within-cluster pair join — never re-read or re-quantize the
    source). ``cents``: (cids int64[k], C int64[k, dim]). The GEMM
    shape: one (batch × dim) @ (dim × k) per Arrow batch — this is
    what lets nlist GROW with the corpus without the interpreted
    per-(row, centroid) fold a broadcast-join argmin would pay."""

    def f(batches):
        import numpy as np

        cids, C = cents
        for pdf in batches:
            if not len(pdf):
                continue
            X = _quantize(pdf["embedding"])
            a, _ = _assign(X, C)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cid": cids[a].astype("int32"),
                    "xi": list(X),
                    # per-ROW squared norm here, never per pair (and
                    # never as a downstream interpreted fold that
                    # CollapseProject would inline per reference)
                    "nrm": (X * X).sum(axis=1),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        f, "vec_id long, cid int, xi array<long>, nrm long"
    )


def vq_kmeans_unrolled_cte(
    iters: int, nlist_sql: str, dim: int = 64, shard_cap: int | None = None
) -> str:
    """DuckDB CTE chain restating the INTEGER-domain vector
    quantizer exactly (1e6 HALF_UP quantization, exact int squared
    distances, first-min == lowest-cid ties, ``//`` truncating
    centroid updates — the ``pq_update_pass``/``vq_assign_pass``
    semantics). ``nlist_sql``: a SQL scalar expression for the seed
    count, so nlist can DERIVE FROM THE DATA (e.g.
    ``least(greatest(8, (SELECT count(*) FROM e) // 640), 4096)``)
    and the same static unroll serves every corpus size. Produces
    ``e(vec_id, xi)`` and ``af(vec_id, xi, cid, nrm)`` (final
    assignment + per-row squared norm), af MATERIALIZED. With
    ``shard_cap`` set, af also carries ``shard`` — the in-cell
    md5-rank sub-split ((rank-1) // cap) that re-pins per-block pair
    mass once a capped nlist lets cells grow (plans/dedup.py's
    SEM_SHARD_CAP design note)."""

    def dist(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
        )

    parts = [
        f"""WITH e AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(round(x * {COMOMENT_SCALE}) AS BIGINT)) AS xi
        FROM embeddings
    )""",
        f"""seed AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, xi AS c
        FROM e QUALIFY row_number() OVER (ORDER BY vec_id) <= ({nlist_sql})
    )""",
    ]
    prev = "seed"
    for k in range(1, iters + 1):
        parts.append(
            f"""a{k} AS (
        SELECT e.vec_id, e.xi, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist('e.xi', 'c.c')}, c.cid) AS rn
        FROM e, {prev} AS c
    )"""
        )
        parts.append(
            f"""c{k} AS (
        SELECT cid, list(m ORDER BY i) AS c FROM (
            SELECT a.cid, t.i,
                   CAST(sum(a.xi[t.i]) // count(*) AS BIGINT) AS m
            FROM a{k} AS a, generate_series(1, {dim}) AS t(i)
            WHERE a.rn = 1
            GROUP BY a.cid, t.i
        ) GROUP BY cid
    )"""
        )
        prev = f"c{k}"
    shard_col = (
        f""",
               (row_number() OVER (PARTITION BY cid
                    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1)
                   // {shard_cap} AS shard"""
        if shard_cap is not None
        else ""
    )
    parts.append(
        f"""af AS MATERIALIZED (
        SELECT vec_id, xi, cid,
               list_sum(list_transform(xi, x -> x * x)) AS nrm{shard_col}
        FROM (
            SELECT e.vec_id, e.xi, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {dist('e.xi', 'c.c')}, c.cid)
                       AS rn
            FROM e, {prev} AS c
        ) WHERE rn = 1
    )"""
    )
    return ",\n    ".join(parts)
