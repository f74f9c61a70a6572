"""As-of join — a custom operator Spark's DataFrame API lacks
(SURVEY.md §2.3 lists range/as-of joins ABSENT in the reference;
pandas has merge_asof; Flink/kdb ship it natively).

Semantics: for each left row, attach the single most recent right
row with matching keys and right.ts <= left.ts (within an optional
tolerance).

Implementation is the UNION + carry-forward-window form, not a
range join:

  tag sides → union → window over (keys ORDER BY ts, side) →
  last(right_value, ignorenulls=true) → filter left side.

Why this shape at 100 TB: a naive inequality join explodes to
|L|×|R| pairs inside each key before picking the max; the union
form is one shuffle on the key (both sides co-partitioned), one
sort within partitions, zero row amplification. This is the same
plan Flink generates for event-time temporal joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left rows + most recent right values at or before each left
    timestamp. Right value columns come back as ``<name><suffix>``;
    rows with no prior right row (or outside tolerance) get NULLs.
    """
    right_values = right_values or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    lcols = left.columns

    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_rv_{c}") for c in right_values],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) if c not in on else F.col(c) for c in lcols],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_values],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows sort before left rows at equal ts (side 0 < 1) →
    # "at or before" semantics include same-instant right rows.
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_ts",
        "_side",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_values
        ],
        F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True)
        .over(w)
        .alias("_rts"),
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        stale = (
            F.col("_ts").cast("long") - F.col("_rts").cast("long")
        ) > tolerance_seconds
        out = out.select(
            *lcols,
            *[
                F.when(stale | F.col("_rts").isNull(), None)
                .otherwise(F.col(f"{c}{suffix}"))
                .alias(f"{c}{suffix}")
                for c in right_values
            ],
            F.when(stale, None).otherwise(F.col("_rts")).alias(f"ts{suffix}"),
        )
    else:
        out = out.select(
            *lcols,
            *[F.col(f"{c}{suffix}") for c in right_values],
            F.col("_rts").alias(f"ts{suffix}"),
        )
    return out


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    before_seconds: int = 300,
    after_seconds: int = 0,
) -> DataFrame:
    """Interval/range join companion (count right rows within
    [left.ts - before, left.ts + after] per key) — implemented as a
    banded equi-join: both sides bucket their timestamps into
    ``before+after``-wide bands, join on (key, band±1), then apply
    the exact range predicate. Banding turns an unbounded theta join
    into an equi-join with bounded fan-out — the standard trick when
    the engine would otherwise nested-loop."""
    width = before_seconds + after_seconds or 1
    l = left.select(
        *on, F.col(left_ts).alias("_lts"), (F.col(left_ts).cast("long") / width).cast("long").alias("_band")
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("_rts"),
        F.explode(
            F.array(
                (F.col(right_ts).cast("long") / width).cast("long") - 1,
                (F.col(right_ts).cast("long") / width).cast("long"),
                (F.col(right_ts).cast("long") / width).cast("long") + 1,
            )
        ).alias("_band"),
    )
    joined = l.join(r, [*on, "_band"]).filter(
        (F.col("_rts").cast("long") >= F.col("_lts").cast("long") - before_seconds)
        & (F.col("_rts").cast("long") <= F.col("_lts").cast("long") + after_seconds)
    )
    return joined.groupBy(*on, "_lts").agg(F.count(F.lit(1)).alias("n_in_range"))
