"""Single-pass data-quality report (the Deequ-style validation
step of an ETL pipeline).

Completeness (non-null fraction) and value-range conformance are
algebraic, so they compute in ONE aggregate scan of the table with
map-side partial aggregation. Key-uniqueness is NOT reducible that
way — when the keys really are unique, no partial aggregate can
shrink anything, so an exact distinct count is Θ(distinct keys)
hash-aggregate work whatever the plan shape (measured: packing the
key struct into one long changes nothing; the cost is the hash
table, not key width). It therefore runs as its own sub-aggregate
over ONLY the key columns — the parquet scan prunes to the key
bytes and the metric scan avoids the Expand duplication a combined
count(DISTINCT) plan would pay — and the 1-row results cross-join
back. At 100 TB a validation pass that scans the wide row once
instead of once-per-constraint is the difference between a pipeline
stage and a pipeline stall; the uniqueness branch reads only keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_report(
    df: DataFrame,
    completeness: list[str] = (),
    unique: list[list[str]] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """(check_name, metric, passed) per constraint; passed ⇔ the
    (6-dp-rounded) metric is exactly 1.0. Metrics are fractions of
    rows satisfying the constraint."""
    ranges = ranges or {}
    n = F.count(F.lit(1)).alias("_n")
    aggs, rows = [n], []
    for c in completeness:
        aggs.append(F.count(F.col(c)).alias(f"_c_{c}"))
        rows.append((f"completeness:{c}", F.col(f"_c_{c}")))
    for c, (lo, hi) in sorted(ranges.items()):
        aggs.append(
            F.sum(
                F.when(F.col(c).between(lo, hi), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"_r_{c}")
        )
        rows.append((f"range:{c}", F.col(f"_r_{c}")))
    agg = df.agg(*aggs)
    for i, keys in enumerate(unique):
        # Distinct-count semantics mirror SQL count(DISTINCT ...):
        # single-column count(DISTINCT x) drops NULL x on both
        # engines, so filter them before the distinct; a multi-column
        # row value (a, b) is never NULL itself, so every tuple
        # counts. The sub-aggregate scans ONLY the key columns.
        keyed = df.select(*keys)
        if len(keys) == 1:
            keyed = keyed.filter(F.col(keys[0]).isNotNull())
        u = keyed.distinct().agg(F.count(F.lit(1)).alias(f"_u_{i}"))
        agg = agg.crossJoin(F.broadcast(u))
        rows.append((f"unique:{','.join(keys)}", F.col(f"_u_{i}")))
    # unpivot the ONE combined row with stack — a union of per-check
    # selects would replay the full scan per branch
    flat: list = []
    for name, cnt in rows:
        flat.append(F.lit(name))
        flat.append(F.round(cnt.cast("double") / F.col("_n"), 6))
    return agg.select(
        F.stack(F.lit(len(rows)), *flat).alias("check_name", "metric")
    ).withColumn("passed", F.col("metric") == 1.0)
