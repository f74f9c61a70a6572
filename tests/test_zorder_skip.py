"""Z-order layout write + file-skip demo (the r5 verdict's queued
'z-order write + file-skip demo — needs a plan-metric assertion
strategy'). The metric strategy: read back the PARQUET FOOTERS of the
written files with pyarrow and count, for a 2-D range predicate, how
many files' (min, max) stats intersect it — that count IS what any
stats-based pruner (Spark's row-group pushdown, file skipping in
table formats) gets to skip, independent of engine runtime metrics.

The assertion: a z-ordered layout confines the predicate to a small
fraction of files, while the natural (orderkey-clustered) layout
leaves BOTH keys full-range in every file, so nothing can be
skipped. Results must also be identical on both layouts."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from hive_hdfs_practise_spark.operators.zorder import write_zordered

SF = "/root/testdata/sf0.01"
N_FILES = 32
# a 2-D rectangle covering ~1/8 of each key domain (~1/64 of space)
PART_LO, PART_HI = 100, 350
SUPP_LO, SUPP_HI = 10, 25


def _files_intersecting(path: str) -> tuple[int, int]:
    """(n_files, n_files whose per-file [min,max] stats intersect the
    rectangle) — per-file stats = merged row-group stats."""
    files = sorted(glob.glob(f"{path}/*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        pmin = smin = None
        pmax = smax = None
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            cols = {
                row.column(c).path_in_schema: row.column(c).statistics
                for c in range(row.num_columns)
            }
            ps, ss = cols["l_partkey"], cols["l_suppkey"]
            pmin = ps.min if pmin is None else min(pmin, ps.min)
            pmax = ps.max if pmax is None else max(pmax, ps.max)
            smin = ss.min if smin is None else min(smin, ss.min)
            smax = ss.max if smax is None else max(smax, ss.max)
        if pmin <= PART_HI and pmax >= PART_LO and smin <= SUPP_HI and smax >= SUPP_LO:
            hit += 1
    return len(files), hit


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    natural = str(base / "natural")
    zordered = str(base / "zordered")
    # natural layout: clustered by orderkey (the ingest order) —
    # part/supp keys land full-range in every file
    li.repartitionByRange(N_FILES, "l_orderkey").write.mode(
        "overwrite"
    ).parquet(natural)
    write_zordered(li, zordered, "l_partkey", "l_suppkey", n_files=N_FILES)
    return natural, zordered


class TestZorderFileSkip:
    def test_zorder_prunes_natural_does_not(self, layouts):
        natural, zordered = layouts
        n_nat, hit_nat = _files_intersecting(natural)
        n_z, hit_z = _files_intersecting(zordered)
        assert n_nat >= N_FILES - 1 and n_z >= N_FILES - 1
        # natural layout: no skipping possible — every file spans the
        # full key range
        assert hit_nat >= n_nat - 1
        # z-ordered: the rectangle touches only the files whose
        # z-range crosses it — the skip the layout exists to buy
        assert hit_z <= n_z // 4
    def test_results_identical_across_layouts(self, spark, layouts):
        natural, zordered = layouts
        pred = (
            (F.col("l_partkey").between(PART_LO, PART_HI))
            & (F.col("l_suppkey").between(SUPP_LO, SUPP_HI))
        )

        def agg(path):
            return (
                spark.read.parquet(path)
                .filter(pred)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("l_quantity").alias("q"),
                )
                .collect()[0]
            )

        a, b = agg(natural), agg(zordered)
        assert (a.n, a.q) == (b.n, b.q) and a.n > 0

    def test_filter_reaches_scan(self, spark, layouts):
        _, zordered = layouts
        plan = (
            spark.read.parquet(zordered)
            .filter(
                (F.col("l_partkey") >= PART_LO)
                & (F.col("l_suppkey") <= SUPP_HI)
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters" in plan and "l_partkey" in plan.split(
            "PushedFilters"
        )[1][:200]
