"""Distributed prefix sum (two-level sharded cumulative sum).

An ordered-window cumulative sum partitioned only by a low-cardinality
key pushes the whole table through |key| tasks — the low-cardinality
window trap (CLAUDE.md). The classic fix is the two-level prefix sum:

1. shard the order axis by a MONOTONE function of the order column;
2. run the ordered window per (partition, shard) — parallelism grows
   with the data;
3. add each shard's offset — the running total of all PRIOR shards —
   computed on the partitions×shards metadata-scale table and
   broadcast back.

Monotone shards mean (shard, order_col) sorts identically to
order_col, so offset + in-shard-cum IS the global cumulative sum,
exactly (integer sums merge bit-exactly; float callers inherit the
usual merge-order caveats). Used by lineitem_weighted_median,
orders_ks_statistic, customer_spend_gini.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sharded_cumsum(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    val_col: str,
    shard: Column,
    cum_name: str = "cum",
    tot_name: str = "tot",
) -> DataFrame:
    """Append ``cum_name`` (cumulative sum of ``val_col`` over rows
    ordered by ``order_col`` within ``part_cols``) and ``tot_name``
    (the partition total) without a low-parallelism global window.

    ``shard`` must be monotone non-decreasing in ``order_col`` and is
    evaluated once into an internal column. ``order_col`` must be
    unique per (partition, shard) — callers aggregate to a grid
    first, which is also what keeps the shard-offset table
    metadata-scale.
    """
    g = df.withColumn("_shard", shard)
    ws = Window.partitionBy(*part_cols, "_shard").orderBy(order_col)
    st = g.groupBy(*part_cols, "_shard").agg(F.sum(val_col).alias("_sw"))
    # The offset window below runs on the partitions×shards table —
    # METADATA-scale by construction (it is the output of the
    # aggregate above). With empty part_cols Spark logs the
    # single-partition WindowExec warning here; that is this design's
    # intended shape, not a corpus-sized window — don't re-audit.
    wf = Window.partitionBy(*part_cols) if part_cols else Window.partitionBy()
    off = st.select(
        *part_cols,
        "_shard",
        F.coalesce(
            F.sum("_sw").over(
                wf.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_off"),
        F.sum("_sw").over(wf).alias(tot_name),
    )
    return (
        g.withColumn("_cum_in", F.sum(val_col).over(ws))
        .join(F.broadcast(off), [*part_cols, "_shard"])
        .withColumn(cum_name, F.col("_off") + F.col("_cum_in"))
        .drop("_shard", "_off", "_cum_in")
    )
