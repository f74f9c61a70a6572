"""Multimodal plumbing tests: mapInPandas decode stage semantics and
the stub gating."""

from __future__ import annotations

import hashlib

import pytest

from hive_hdfs_practise_spark.multimodal.binary_ops import (
    decode_image,
    decode_metadata,
    from_documents,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "en", "s", 11), (2, "另一个文档", "zh", "s", 5)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    return from_documents(docs)


class TestDecode:
    def test_stub_raises_without_fake(self):
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG")

    def test_fake_decode_deterministic(self):
        assert decode_image(b"abc", fake=True) == decode_image(b"abc", fake=True)
        w, h = decode_image(b"abc", fake=True)
        assert 16 <= w < 256 and 16 <= h < 256

    def test_metadata_matches_hashlib(self, media):
        rows = {r.media_id: r for r in decode_metadata(media, fake=True).collect()}
        assert rows[1].sha256 == hashlib.sha256(b"hello world").hexdigest()
        assert rows[1].n_bytes == 11
        assert rows[2].n_bytes == len("另一个文档".encode("utf-8"))  # bytes ≠ chars

    def test_payload_is_binary_with_typed_meta(self, media):
        schema = dict(media.dtypes)
        assert schema["payload"] == "binary"
        row = media.collect()[0]
        assert row.meta.n_bytes == row.meta.n_bytes  # struct accessible


class TestUdfRegistration:
    def test_pandas_udf_registered_for_sql(self, spark):
        # §2.11: the user-extensible function surface — register an
        # Arrow-batched UDF and call it from SQL text.
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import IntegerType

        # NB: lambda form — `from __future__ import annotations`
        # stringifies type hints, which pandas_udf cannot resolve.
        ws_token_count = pandas_udf(
            lambda s: s.fillna("").str.split().str.len().astype("int32"),
            IntegerType(),
        )
        spark.udf.register("ws_token_count", ws_token_count)
        spark.createDataFrame(
            [("a b  c",), ("",), ("单 词",)], "text STRING"
        ).createOrReplaceTempView("udf_probe")
        got = [
            r.n for r in spark.sql(
                "SELECT ws_token_count(text) AS n FROM udf_probe"
            ).collect()
        ]
        assert got == [3, 0, 2]
