"""Skew-mitigation operators.

AQE handles skewed JOINS automatically (split oversized partitions);
skewed AGGREGATION keys still funnel into one task when a single key
dominates. The classic fix is salting: spread each key over
``n_salt`` sub-keys, partially aggregate, then merge. Two shuffles,
but the first one is balanced — wall-clock wins whenever the hottest
key exceeds ~1/parallelism of the data.

Works for any algebraic aggregate (sum/count/min/max); avg is
decomposed as sum+count and recombined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: Column,
    n_salt: int = 16,
    sum_name: str = "total",
    count_name: str = "n",
) -> DataFrame:
    """groupBy(keys).agg(sum(value), count(*)) via a salted two-stage
    aggregation. Deterministic salt (hash of the full row's
    monotonically varying component would be ideal; spark_partition_id
    is used — any distribution works, correctness never depends on
    the salt)."""
    salted = df.withColumn("_salt", F.spark_partition_id() % n_salt)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(value).alias("_ps"), F.count(F.lit(1)).alias("_pc")
    )
    return partial.groupBy(*keys).agg(
        F.sum("_ps").alias(sum_name), F.sum("_pc").alias(count_name)
    )


# Join types where replicating the small side is semantics-preserving:
# the BIG side is the preserved/probed side, so each big row still
# matches exactly once per true match. right/full outer would emit
# every unmatched small row n_salt times (once per replica).
_SAFE_HOW = {
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti",
}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s key distribution is heavily skewed
    and ``small`` is too large to broadcast: salt the big side
    (random-free: partition id mod n_salt), REPLICATE the small side
    across all n_salt salt values, join on (key, salt). Each hot key
    spreads over n_salt tasks instead of funnelling into one. Costs
    an n_salt× blow-up of the small side's shuffle — the trade that
    wins when the hottest key exceeds ~1/parallelism of the big
    side. (AQE's skew-join split handles sort-merge cases
    automatically; this explicit form also covers aggregates-after-
    join pipelines and engines/settings without AQE.)

    Only big-side-preserving join types are accepted (see
    ``_SAFE_HOW``): a right/full outer join would duplicate every
    unmatched small-side key once per salt replica."""
    if how.replace("_", "").lower() not in {h.replace("_", "") for h in _SAFE_HOW}:
        raise ValueError(
            f"salted_join: how={how!r} would replicate unmatched small-side "
            f"rows {n_salt}x; supported: inner/left/left_semi/left_anti"
        )
    salted_big = big.withColumn("_salt", F.spark_partition_id() % n_salt)
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    joined = salted_big.join(replicated, [key, "_salt"], how)
    return joined.drop("_salt")
