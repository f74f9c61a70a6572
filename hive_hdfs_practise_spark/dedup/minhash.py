"""MinHash signatures + LSH banding.

Performance shape (the thing that matters at 100 TB): each shingle
string is hashed ONCE (xxhash64 → 32-bit residue); the k-permutation
hash family is pure integer arithmetic, h_i(x) = (a_i·x + b_i) mod P.
The signature is computed by EXPLODING shingles and taking k plain
``min()`` aggregates in one hash-aggregate pass — every operator
stays inside whole-stage codegen and partial (map-side) aggregation
collapses each doc to one row per partition before any shuffle.

Alternatives measured and rejected on local[32] @ sf0.1:
- k independent string-hash passes over the shingle array
  (``transform`` × ``array_min``): ~30 s — k× redundant string
  hashing;
- single-pass ``aggregate`` with a zip_with min-accumulator:
  ~40 s — allocates a k-length array per shingle step, no codegen;
- numpy mapInPandas (JVM hashes → vectorized per-partition mins):
  ~4.0 s — Arrow+shuffle overhead eats the vectorization win.
The explode+min form runs the same workload in ~4.4 s warm
(with whole-stage codegen enabled — see session.py's maxFields
note; measured with ALL 128 aggregate columns forced).

P is the largest 32-bit prime; a_i < 2^31 and x < 2^32 keep every
product inside signed-64 range. Coefficients come from a fixed seed
→ signatures are deterministic across runs and clusters.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P32 = 4_294_967_291  # largest prime < 2^32

_rng = random.Random(42)
_N_PERM_DEFAULT = 128
_COEFFS = [
    (_rng.randrange(1, 1 << 31), _rng.randrange(0, 1 << 31))
    for _ in range(_N_PERM_DEFAULT)
]


def minhash_signature_df(
    df: DataFrame,
    id_cols: list[str],
    shingles_col: str = "shingles",
    n_perm: int = _N_PERM_DEFAULT,
    downsample: int = 1,
) -> DataFrame:
    """(id_cols..., sig: array<bigint>[n_perm]) per input row.

    Documents with an empty shingle set keep an all-P32 sentinel
    signature (outer-join back) so they never band-collide.

    ``downsample=d`` keeps only shingles whose hash ≡ 0 (mod d)
    before the permutation mins — winnowing-style sketch-of-a-sketch
    that cuts the aggregate's input d× while preserving the Jaccard
    estimate (the sample is hash-uniform, so sampled-set Jaccard
    concentrates around the true value). Only sound when documents
    carry ≥ ~10·d shingles; high-similarity pairs survive intact
    because they share the same sampled subset. Candidates are
    exact-verified downstream either way."""
    h = F.pmod(F.xxhash64(F.col("_shingle")), F.lit(P32))
    exploded = df.select(
        *id_cols, F.explode_outer(F.col(shingles_col)).alias("_shingle")
    ).withColumn("_h", h)
    if downsample > 1:
        # keep the null marker rows (empty docs) so groupBy retains them
        exploded = exploded.filter(
            F.col("_h").isNull() | (F.pmod(F.col("_h"), F.lit(downsample)) == 0)
        )
    agg = exploded.groupBy(*id_cols).agg(*_perm_mins(n_perm))
    sig = F.array(
        *[F.coalesce(F.col(f"_m{i}"), F.lit(P32).cast("bigint")) for i in range(n_perm)]
    )
    return agg.select(*id_cols, sig.alias("sig"))


def _perm_mins(n_perm: int) -> list[Column]:
    """The k permutation-min aggregate slots over ``_h``.

    Deliberately minimal per-slot expression — this text is codegen'd
    128× into one generated method, so every redundant node multiplies
    compile time AND per-row cost:
    - no ``when(isNotNull, ...)`` guard: ``a*NULL+b`` propagates NULL
      and ``min()`` ignores NULLs natively, so empty-doc marker rows
      fall through to an all-NULL group → sentinel via coalesce;
    - ``%`` instead of ``pmod``: both operands are provably
      non-negative (a,b < 2^31, _h < 2^32), where pmod costs two
      remainders to fix a sign that can never be negative.
    Measured on the sf0.1 corpus (all slots forced): 3.6s cold /
    1.2s warm vs 8.1s / 3.8s for the guarded-pmod form — identical
    signatures (checksum-equal)."""
    return [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(P32)).alias(f"_m{i}")
        for i, (a, b) in enumerate(_COEFFS[:n_perm])
    ]


def minhash_signature_from_text(
    df: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    k: int = 5,
    n_perm: int = _N_PERM_DEFAULT,
    downsample: int = 1,
) -> DataFrame:
    """Signature straight from text — no shingle ARRAY is ever built.

    MinHash over a multiset equals MinHash over the set (duplicate
    shingles cannot change a minimum), so the array_distinct +
    array-materialization step of the array-input path is pure
    overhead for signatures. This path explodes shingle POSITIONS
    and keeps everything — substring, hash, permutations, mins —
    inside whole-stage codegen. Exact-Jaccard verification still
    needs distinct shingle arrays; it builds them only for candidate
    pairs.

    Cardinality contract: with ``downsample=1`` the signature table
    has EXACTLY one row per input doc (empty docs get a sentinel
    signature via the NULL marker; pinned in tests). With
    ``downsample>1`` a short doc whose every shingle hash fails the
    ``pmod(h, downsample)==0`` filter disappears from the table
    (~(1-1/d)^s chance for s shingles), silently excluding it from
    LSH candidate generation — acceptable under the probabilistic-
    recall contract, since downsampling already trades recall for
    throughput on long-doc corpora where s is large."""
    n = F.length(F.col(text_col)) - F.lit(k - 1)
    pos = F.explode_outer(
        F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(F.array().cast("array<int>"))
    )
    exploded = df.select(*id_cols, F.col(text_col), pos.alias("_i")).select(
        *id_cols,
        F.when(
            F.col("_i").isNotNull(),
            F.pmod(
                F.xxhash64(F.col(text_col).substr(F.col("_i"), F.lit(k))), F.lit(P32)
            ),
        ).alias("_h"),
    )
    # downsampling is a FILTER before the wide aggregate (NULL marker
    # rows for empty docs pass through so groupBy retains them). A
    # filter here beats folding the predicate into the 128 min()
    # updates on BOTH codegen settings (sf0.1, all agg columns
    # forced): 4.7s vs 6.7s interpreted (maxFields=100 — the skipped
    # 75% of rows otherwise still pay 128 when() evaluations each),
    # 4.4s vs 4.8s fused (maxFields≥129). An earlier measurement
    # claiming the fold was 10× faster was an artifact of Catalyst
    # pruning unread aggregate columns in the probe query.
    if downsample > 1:
        exploded = exploded.filter(
            F.col("_h").isNull() | (F.pmod(F.col("_h"), F.lit(downsample)) == 0)
        )
    agg = exploded.groupBy(*id_cols).agg(*_perm_mins(n_perm))
    sig = F.array(
        *[F.coalesce(F.col(f"_m{i}"), F.lit(P32).cast("bigint")) for i in range(n_perm)]
    )
    return agg.select(*id_cols, sig.alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame,
    n_bands: int,
    rows_per_band: int,
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distinct candidate (doc_a, doc_b) pairs (doc_a < doc_b) from a
    signature table: posexplode bands → one shuffle on (block, band,
    key) → per-bucket combinations.

    Pairs come from COMBINATIONS WITHIN each bucket's collected id
    set, not a self-join on the band key — a self-join would replay
    the signature pipeline per side and shuffle twice (measured 2×
    query time), while buckets are near-singleton by construction
    (r=8) so the combinations expression is tiny per group. Only
    (ids, band keys) ever shuffle, never text. ``block_cols``
    restricts pairs to equal blocking keys (e.g. lang) by folding
    them into the bucket key."""
    banded = sigs.select(
        id_col,
        *block_cols,
        F.posexplode(lsh_bands(F.col("sig"), n_bands, rows_per_band)).alias(
            "band", "band_key"
        ),
    )
    return pairs_within_buckets(banded, id_col, [*block_cols, "band", "band_key"])


def pairs_within_buckets(
    df: DataFrame, id_col: str, bucket_cols: list[str]
) -> DataFrame:
    """Distinct (doc_a, doc_b) pairs (doc_a < doc_b) of ids sharing a
    bucket: one shuffle on the bucket key, then combinations inside
    each collected id set — never a self-join (see
    lsh_candidate_pairs for why). Shared by MinHash banding and the
    hyperplane (cosine) LSH."""
    buckets = (
        df.groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_expr = F.explode(
        F.flatten(
            F.transform(
                F.col("ids"),
                lambda x, i: F.transform(
                    F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                    lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                ),
            )
        )
    )
    return (
        buckets.select(pair_expr.alias("p"))
        .select(F.col("p.doc_a"), F.col("p.doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def lsh_bands(sig: Column, n_bands: int, rows_per_band: int) -> Column:
    """array<bigint> of band keys: murmur hash of each signature
    slice. Explode + groupBy on (band index, key) gives the LSH
    buckets; only (doc_id, band_key) ever shuffles."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.hash(F.slice(sig, b * rows_per_band + 1, rows_per_band)).cast("bigint"),
    )
