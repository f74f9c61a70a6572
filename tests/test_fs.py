"""fs/ops command parity (SURVEY.md §2.9 H1-H7) on local FS via the
Hadoop FileSystem API — same code path works on hdfs:// / s3a://."""

from __future__ import annotations

from hive_hdfs_practise_spark.fs import ops


class TestFsOps:
    def test_mkdir_ls(self, spark, tmp_path):
        root = str(tmp_path / "fsroot")
        assert ops.mkdir(spark, f"{root}/a/b")
        names = {r.name for r in ops.ls(spark, f"{root}/a").collect()}
        assert names == {"b"}

    def test_write_read_round_trip(self, spark, tmp_path):
        p = str(tmp_path / "data" / "hello.txt")
        content = "GreilFS 模拟分布式文件系统\nline2"
        ops.mkdir(spark, str(tmp_path / "data"))
        ops.write_text(spark, p, content)
        assert ops.read_text(spark, p) == content

    def test_find_recursive_with_substring(self, spark, tmp_path):
        root = str(tmp_path / "tree")
        ops.mkdir(spark, f"{root}/x/y")
        ops.write_text(spark, f"{root}/x/report_jan.txt", "a")
        ops.write_text(spark, f"{root}/x/y/report_feb.txt", "b")
        ops.write_text(spark, f"{root}/x/y/other.txt", "c")
        found = {r.name for r in ops.find(spark, root, "report").collect()}
        assert found == {"report_jan.txt", "report_feb.txt"}

    def test_rm_recursive(self, spark, tmp_path):
        root = str(tmp_path / "doomed")
        ops.mkdir(spark, f"{root}/sub")
        ops.write_text(spark, f"{root}/sub/f.txt", "bye")
        assert ops.rm(spark, root)
        # parent listing no longer contains it
        names = {r.name for r in ops.ls(spark, str(tmp_path)).collect()}
        assert "doomed" not in names
