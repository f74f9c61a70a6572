"""Single-pass data-quality report (the Deequ-style validation
step of an ETL pipeline).

All requested constraints — completeness (non-null fraction), key
uniqueness, value-range conformance — compute in ONE aggregate scan
of the table (metrics are algebraic, so map-side partial
aggregation applies), then unpivot to one row per check. At 100 TB
a validation pass that scans once instead of once-per-constraint is
the difference between a pipeline stage and a pipeline stall.
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
    for i, keys in enumerate(unique):
        # Multi-column keys go through a struct: multi-arg
        # countDistinct drops rows where ANY component is NULL (so
        # duplicates among null-keyed rows pass unseen), while a
        # struct is never NULL and matches the SQL row-value form
        # count(DISTINCT (a, b)). Single-column keys keep plain
        # countDistinct — SQL count(DISTINCT x) null-dropping
        # semantics on both engines.
        expr = F.struct(*keys) if len(keys) > 1 else F.col(keys[0])
        aggs.append(F.countDistinct(expr).alias(f"_u_{i}"))
        rows.append((f"unique:{','.join(keys)}", F.col(f"_u_{i}")))
    for c, (lo, hi) in sorted(ranges.items()):
        aggs.append(
            F.sum(
                F.when(F.col(c).between(lo, hi), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"_r_{c}")
        )
        rows.append((f"range:{c}", F.col(f"_r_{c}")))
    agg = df.agg(*aggs)
    # unpivot the ONE aggregate row with stack — a union of
    # per-check selects would replay the full scan per branch
    flat: list = []
    for name, cnt in rows:
        flat.append(F.lit(name))
        flat.append(F.round(cnt.cast("double") / F.col("_n"), 6))
    return agg.select(
        F.stack(F.lit(len(rows)), *flat).alias("check_name", "metric")
    ).withColumn("passed", F.col("metric") == 1.0)
