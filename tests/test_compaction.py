"""Small-file compaction: plan shape (FFD bins, large files
untouched) and execution (row preservation, one file per bin)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from hive_hdfs_practise_spark.operators.compaction import (
    compact_parquet,
    plan_compaction,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def fragmented(spark, tmp_path_factory):
    """A deliberately fragmented table: 40 tiny files + 2 big ones."""
    base = str(tmp_path_factory.mktemp("frag") / "t")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    # deterministic disjoint split (subtract is a SET op and would
    # silently drop duplicate rows); repartition (not coalesce) keeps
    # the two big files evenly sized
    small = li.filter(F.col("l_orderkey") % 15 == 0)
    big = li.filter(F.col("l_orderkey") % 15 != 0)
    small.repartition(40).write.mode("overwrite").parquet(base)
    big.repartition(2).write.mode("append").parquet(base)
    return base, li.count()


class TestPlan:
    def test_ffd_plan_shape(self, fragmented):
        base, _ = fragmented
        sizes = {
            f: os.path.getsize(f) for f in glob.glob(f"{base}/*.parquet")
        }
        big_two = sorted(sizes, key=sizes.get)[-2:]
        target = int(max(sizes.values()) * 1.5)
        plan = plan_compaction(base, target_bytes=target)
        assert sorted(plan.untouched) == sorted(big_two)
        packed = [f for g in plan.bins for f in g]
        assert sorted(packed + plan.untouched) == sorted(sizes)
        # FFD: every bin fits the target, and no two bins could merge
        for g in plan.bins:
            assert sum(sizes[f] for f in g) <= target
        if len(plan.bins) >= 2:
            loads = sorted(sum(sizes[f] for f in g) for g in plan.bins)
            assert loads[-1] + loads[-2] > target

    def test_rewrite_cost_is_small_files_only(self, fragmented):
        base, _ = fragmented
        sizes = {
            f: os.path.getsize(f) for f in glob.glob(f"{base}/*.parquet")
        }
        target = int(max(sizes.values()) * 1.5)
        plan = plan_compaction(base, target_bytes=target)
        assert plan.small_bytes < plan.total_bytes / 2


class TestExecute:
    def test_rows_preserved_one_file_per_bin(
        self, spark, fragmented, tmp_path
    ):
        base, n_total = fragmented
        out = str(tmp_path / "compacted")
        sizes = [
            os.path.getsize(f) for f in glob.glob(f"{base}/*.parquet")
        ]
        target = int(max(sizes) * 1.5)
        plan = compact_parquet(spark, base, out, target_bytes=target)
        bin_dirs = sorted(glob.glob(f"{out}/bin-*"))
        assert len(bin_dirs) == len(plan.bins)
        for d in bin_dirs:
            assert len(glob.glob(f"{d}/*.parquet")) == 1
        compacted = spark.read.parquet(*bin_dirs)
        untouched = spark.read.parquet(*plan.untouched)
        assert compacted.count() + untouched.count() == n_total
        # value-level preservation: checksum both unions
        def chk(df):
            return (
                df.agg(
                    F.sum("l_orderkey").alias("a"),
                    F.sum("l_partkey").alias("b"),
                    F.sum("l_quantity").alias("c"),
                ).collect()[0]
            )
        before = chk(spark.read.parquet(base))
        after_df = compacted.unionByName(untouched)
        after = chk(after_df)
        assert (before.a, before.b, before.c) == (after.a, after.b, after.c)


class TestInprogressRecovery:
    """r12 (r11 advice): an interrupted publish must be mechanically
    recovered at the next maintenance entry — every crash window of
    publish_replacing either rolls back or finalizes exactly."""

    def _dir_with(self, tmp_path, names):
        d = tmp_path / "t"
        d.mkdir()
        for n, content in names.items():
            (d / n).write_bytes(content)
        return str(d)

    def test_finalize_deletes_survivors_no_duplication(self, tmp_path):
        import json

        from hive_hdfs_practise_spark.operators.compaction import (
            recover_inprogress,
        )

        # crash mid-step-3: one original already deleted, one survives
        d = self._dir_with(
            tmp_path,
            {
                "a.parquet": b"old-a",
                ".merged.parquet.inprogress": b"merged-union",
                ".merged.parquet.inprogress.manifest": json.dumps(
                    {
                        "dest": "merged.parquet",
                        "originals": ["a.parquet", "b.parquet"],
                    }
                ).encode(),
            },
        )
        assert recover_inprogress(d) == 1
        assert sorted(os.listdir(d)) == ["merged.parquet"]
        with open(os.path.join(d, "merged.parquet"), "rb") as f:
            assert f.read() == b"merged-union"

    def test_rollback_when_pending_never_placed(self, tmp_path):
        import json

        from hive_hdfs_practise_spark.operators.compaction import (
            recover_inprogress,
        )

        d = self._dir_with(
            tmp_path,
            {
                "a.parquet": b"old-a",
                "b.parquet": b"old-b",
                ".merged.parquet.inprogress.manifest": json.dumps(
                    {
                        "dest": "merged.parquet",
                        "originals": ["a.parquet", "b.parquet"],
                    }
                ).encode(),
            },
        )
        assert recover_inprogress(d) == 1
        assert sorted(os.listdir(d)) == ["a.parquet", "b.parquet"]

    def test_orphan_inprogress_raises(self, tmp_path):
        from hive_hdfs_practise_spark.operators.compaction import (
            recover_inprogress,
        )

        d = self._dir_with(
            tmp_path, {".x.parquet.inprogress": b"?", "a.parquet": b"a"}
        )
        with pytest.raises(RuntimeError, match="unattributable"):
            recover_inprogress(d)

    def test_roundtrip_publish_then_recover_noop(self, tmp_path):
        from hive_hdfs_practise_spark.operators.compaction import (
            publish_replacing,
            recover_inprogress,
        )

        d = self._dir_with(
            tmp_path, {"a.parquet": b"old-a", "b.parquet": b"old-b"}
        )
        src = tmp_path / "src.parquet"
        src.write_bytes(b"merged")
        publish_replacing(
            d,
            str(src),
            [os.path.join(d, "a.parquet"), os.path.join(d, "b.parquet")],
            "m.parquet",
        )
        assert sorted(os.listdir(d)) == ["m.parquet"]
        assert recover_inprogress(d) == 0

    def test_pre_publish_garbage_swept_and_unreadable_manifest(
        self, tmp_path
    ):
        from hive_hdfs_practise_spark.operators.compaction import (
            recover_inprogress,
        )

        # staged copies and interrupted manifest writes are garbage
        d = self._dir_with(
            tmp_path,
            {
                "a.parquet": b"a",
                ".m.parquet.inprogress.copying": b"partial",
                ".m.parquet.inprogress.manifest.tmp": b'{"trunc',
            },
        )
        assert recover_inprogress(d) == 0
        assert sorted(os.listdir(d)) == ["a.parquet"]
        # unreadable manifest with NO pending file ⇒ rollback
        p = tmp_path / "t2"
        p.mkdir()
        (p / "a.parquet").write_bytes(b"a")
        (p / ".x.parquet.inprogress.manifest").write_bytes(b'{"bad')
        assert recover_inprogress(str(p)) == 1
        assert sorted(os.listdir(str(p))) == ["a.parquet"]
        # unreadable manifest WITH a pending file ⇒ raise
        q = tmp_path / "t3"
        q.mkdir()
        (q / ".y.parquet.inprogress").write_bytes(b"pending")
        (q / ".y.parquet.inprogress.manifest").write_bytes(b'{"bad')
        with pytest.raises(RuntimeError, match="unreadable manifest"):
            recover_inprogress(str(q))
