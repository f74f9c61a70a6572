"""GreilFS-analog property tests (SURVEY.md §5.4): write-then-read
round trip, ordered reassembly of out-of-order fragments,
replication invariant after simulated node death."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _chunk_fixture(spark, payload: bytes, n_nodes: int = 5, block: int = 128):
    """Split payload into 128-byte blocks × 3 replicas, delivered
    out of order (FIXTURES.md §4 file_chunks shape)."""
    chunks = [payload[i : i + block] for i in range(0, len(payload), block)]
    rows = []
    for pos, content in enumerate(chunks):
        for replica in range(3):
            rows.append(
                ("f1", pos, len(chunks), f"DataNode_{(pos + replica) % n_nodes}",
                 bytearray(content), replica)
            )
    random.Random(7).shuffle(rows)  # out-of-order delivery
    return spark.createDataFrame(
        rows,
        "file_id STRING, position INT, max_pos INT, node STRING, "
        "content BINARY, replica INT",
    )


class TestReassembly:
    def test_round_trip_equals_original(self, spark):
        payload = ("GreilFS block store 数据块 " * 40).encode("utf-8")
        df = _chunk_fixture(spark, payload)
        # H5 semantics: pick replica 0, order by position, concatenate
        out = (
            df.filter(F.col("replica") == 0)
            .groupBy("file_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("position", "content"))
                ).alias("frags")
            )
            .select(
                "file_id",
                F.aggregate(
                    F.col("frags"),
                    F.lit(b""),
                    lambda acc, s: F.concat(acc, s["content"]),
                ).alias("payload"),
            )
            .collect()[0]
        )
        assert bytes(out.payload) == payload

    def test_any_replica_reassembles_identically(self, spark):
        payload = bytes(range(256)) * 3
        df = _chunk_fixture(spark, payload)
        hashes = (
            df.groupBy("replica")
            .agg(
                F.md5(
                    F.aggregate(
                        F.transform(
                            F.array_sort(F.collect_list(F.struct("position", "content"))),
                            lambda s: s["content"],
                        ),
                        F.lit(b""),
                        lambda acc, c: F.concat(acc, c),
                    )
                ).alias("h")
            )
            .collect()
        )
        assert len({r.h for r in hashes}) == 1


class TestReplicationInvariant:
    def test_full_replication_before_failure(self, spark):
        df = _chunk_fixture(spark, b"x" * 1024)
        counts = (
            df.groupBy("file_id", "position")
            .agg(F.countDistinct("node").alias("n"))
            .collect()
        )
        assert all(r.n == 3 for r in counts)

    def test_node_death_flags_underreplicated(self, spark):
        # H9: kill DataNode_0 → blocks that held a replica there drop
        # to 2; the audit identifies exactly those (the rebuild queue)
        df = _chunk_fixture(spark, b"y" * 1024)
        alive = df.filter(F.col("node") != "DataNode_0")
        audit = (
            alive.groupBy("position")
            .agg(F.countDistinct("node").alias("n_live"))
            .collect()
        )
        lost = {r.position for r in audit if r.n_live < 3}
        had = {
            r.position
            for r in df.filter(F.col("node") == "DataNode_0")
            .select("position")
            .distinct()
            .collect()
        }
        assert lost == had
        assert all(r.n_live >= 2 for r in audit)  # still readable
