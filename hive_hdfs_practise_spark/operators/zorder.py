"""Z-order (Morton) layout writer + the file-skip index it buys.

Registration-free home for the z-value expression generator (shared
by plans/mining.py's registered bucket query and the layout writer
here — plans module import order is load-bearing, so library code
must not import a registering module).

The writer is the deployment form of ``lineitem_zorder_buckets``:
range-partition rows by z-value and sort within partitions, so each
output parquet file covers a narrow RECTANGLE of the 2-D key space
instead of a full-width stripe. Parquet footers then carry tight
per-file min/max for BOTH keys, and any engine's stats-based pruning
(Spark row-group pushdown, file-level skipping in table formats)
drops most files for a 2-D range predicate —
tests/test_zorder_skip.py asserts the actual skip rate from the
written footers. Measured at sf0.01, 32 files, a rectangle covering
~1/64 of the key space: natural (orderkey-clustered) layout must
read 32/32 files; z-ordered reads 5/32 (84% skipped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16
ZORDER_BUCKET_SHIFT = 2 * ZORDER_BITS - 8  # top 8 z-bits -> 256 buckets


def zorder_expr(x: str, y: str, idiv: str) -> str:
    """Morton interleave of the low ZORDER_BITS bits of ``x`` and
    ``y`` as a pure integer SQL expression. idiv: the engine's
    integer-division operator — Spark ``div``, DuckDB ``//`` (the
    ONLY dialect difference in the expression)."""
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"(({x} {idiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} {idiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    n_files: int = 32,
) -> None:
    """Write ``df`` as ``n_files`` parquet files z-ordered on
    (xcol, ycol): max-scale both keys to the 16-bit grid, Morton-
    interleave, range-partition on the z-value (range boundaries from
    a sampled sketch — one extra pass, standard for a layout rewrite)
    and sort within each partition. The z-value is a transient column
    — the written schema is the input schema."""
    m = df.agg(F.max(xcol).alias("mx"), F.max(ycol).alias("my"))
    z = (
        df.join(F.broadcast(m))
        .withColumn("_xs", F.expr(f"({xcol} * 65536) div (mx + 1)"))
        .withColumn("_ys", F.expr(f"({ycol} * 65536) div (my + 1)"))
        .withColumn("_z", F.expr(zorder_expr("_xs", "_ys", "div")))
        .drop("mx", "my", "_xs", "_ys")
    )
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
