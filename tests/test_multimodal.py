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


class TestResize:
    def test_stub_raises_without_fake(self):
        from hive_hdfs_practise_spark.multimodal.binary_ops import resize_image

        with pytest.raises(NotImplementedError):
            resize_image(b"\x89PNG", 16, 16)

    def test_resize_deterministic_and_target_dependent(self, media):
        from hive_hdfs_practise_spark.multimodal.binary_ops import resize_stage

        a = {r.media_id: r for r in resize_stage(media, 16, 16).collect()}
        b = {r.media_id: r for r in resize_stage(media, 32, 32).collect()}
        assert a[1].width == 16 and b[1].width == 32
        assert a[1].payload != b[1].payload  # target is part of the bytes
        want = hashlib.sha256(b"hello world|16x16").hexdigest().encode()
        assert bytes(a[1].payload) == want
        assert a[1].payload_sha256 == hashlib.sha256(want).hexdigest()


class TestFrameSample:
    def test_fanout_and_stride(self, spark):
        from hive_hdfs_practise_spark.multimodal.binary_ops import (
            from_documents,
            sample_frames,
        )

        # 10-char frames over 35 chars → frames 0..3, stride 2 → 0, 2
        docs = spark.createDataFrame(
            [(1, "a" * 35, "en", "s", 35), (2, "", "en", "s", 0)],
            "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
        )
        rows = sample_frames(from_documents(docs), frame_chars=10, every=2).collect()
        got = {(r.media_id, r.frame_idx): r.n_frame_chars for r in rows}
        # empty payload → no frames; last sampled frame is the 5-char tail? no:
        # frame 2 covers chars 20-29 (full 10), frame 3 (tail) is skipped by stride
        assert got == {(1, 0): 10, (1, 2): 10}

    def test_frame_hash_matches_hashlib(self, media):
        from hive_hdfs_practise_spark.multimodal.binary_ops import sample_frames

        rows = sample_frames(media, frame_chars=4, every=2).collect()
        by_key = {(r.media_id, r.frame_idx): r.frame_sha256 for r in rows}
        assert by_key[(1, 0)] == hashlib.sha256(b"hell").hexdigest()
        # CJK: frames slice CHARACTERS, hash their UTF-8 bytes
        assert by_key[(2, 0)] == hashlib.sha256("另一个文".encode()).hexdigest()


class TestFeatureExtract:
    def test_feature_values_from_digest(self, media):
        from hive_hdfs_practise_spark.multimodal.binary_ops import extract_features

        rows = {r.media_id: r.feature for r in extract_features(media).collect()}
        digest = hashlib.sha256(b"hello world").digest()
        assert rows[1] == [b / 255.0 for b in digest[:8]]
        assert len(rows[2]) == 8 and all(0.0 <= x <= 1.0 for x in rows[2])


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


class TestCodecSeam:
    """The pluggable-codec seam: a custom callable replaces the stub
    without touching the Spark plumbing, and a real codec (Pillow)
    is exercised automatically whenever the environment provides
    one."""

    def test_custom_decoder_callable(self, media):
        # runs everywhere: proves an injected decoder reaches the
        # Arrow workers and its output flows through DECODED_SCHEMA
        rows = {
            r.media_id: r
            for r in decode_metadata(
                media, decoder=lambda p: (len(p or b""), 7)
            ).collect()
        }
        assert rows[1].width == 11 and rows[1].height == 7
        assert rows[2].width == len("另一个文档".encode("utf-8"))
        # sha256/n_bytes plumbing unchanged by the decoder swap
        assert rows[1].sha256 == hashlib.sha256(b"hello world").hexdigest()

    def test_custom_resizer_and_encoder_callables(self, media):
        from hive_hdfs_practise_spark.multimodal.binary_ops import (
            extract_features,
            resize_stage,
        )

        resized = {
            r.media_id: r
            for r in resize_stage(
                media, 4, 3, resizer=lambda p, w, h: (p or b"")[: w * h]
            ).collect()
        }
        assert bytes(resized[1].payload) == b"hello world"[:12]
        assert resized[1].payload_sha256 == hashlib.sha256(
            b"hello world"[:12]
        ).hexdigest()

        feats = {
            r.media_id: r.feature
            for r in extract_features(
                media, encoder=lambda p: [float(len(p)), 0.5]
            ).collect()
        }
        assert feats[1] == [11.0, 0.5]

    def test_pil_decoder_roundtrip(self, spark):
        # real-codec integration: runs the moment Pillow exists in
        # the environment, skips in this container
        PIL = pytest.importorskip("PIL")  # noqa: F841
        import io

        from PIL import Image

        from hive_hdfs_practise_spark.multimodal.binary_ops import (
            pil_image_decoder,
            pil_image_resizer,
        )

        buf = io.BytesIO()
        Image.new("RGB", (31, 17)).save(buf, format="PNG")
        png = buf.getvalue()
        media = spark.createDataFrame(
            [(1, png, "image/png", (len(png), "t"))],
            "media_id LONG, payload BINARY, media_type STRING, "
            "meta STRUCT<n_bytes: LONG, source: STRING>",
        )
        rows = decode_metadata(media, decoder=pil_image_decoder()).collect()
        assert (rows[0].width, rows[0].height) == (31, 17)

        from hive_hdfs_practise_spark.multimodal.binary_ops import resize_stage

        out = resize_stage(media, 8, 6, resizer=pil_image_resizer()).collect()
        with Image.open(io.BytesIO(bytes(out[0].payload))) as im:
            assert (im.width, im.height) == (8, 6)

    def test_pil_helpers_none_without_pillow(self):
        from hive_hdfs_practise_spark.multimodal.binary_ops import (
            pil_image_decoder,
            pil_image_resizer,
        )

        try:
            import PIL  # noqa: F401

            pytest.skip("Pillow present; covered by roundtrip test")
        except ImportError:
            pass
        assert pil_image_decoder() is None
        assert pil_image_resizer() is None


class TestPhashNearDup:
    """r5: perceptual dHash near-dup join — planted-pair behavior and
    the pigeonhole exactness that lets the banded LSH plan match a
    quadratic oracle."""

    def _pairs(self, spark, docs):
        from hive_hdfs_practise_spark.plans.multimodal import (
            PHASH_HAM_K,
        )
        from hive_hdfs_practise_spark.multimodal.binary_ops import (
            from_documents,
            phash_signature,
        )
        from pyspark.sql import functions as F

        media = from_documents(docs)
        sig = phash_signature(media)
        bands = sig.select(
            "media_id",
            "sig",
            F.posexplode("sig").alias("band_idx", "band_val"),
        )
        a, b = bands.alias("a"), bands.alias("b")
        ham = sum(
            F.bit_count(F.col("a.sig")[k].bitwiseXOR(F.col("b.sig")[k])).cast(
                "int"
            )
            for k in range(8)
        ).cast("int")
        return {
            (r.ma, r.mb, r.hamming)
            for r in a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.media_id") < F.col("b.media_id")),
            )
            .select(
                F.col("a.media_id").alias("ma"),
                F.col("b.media_id").alias("mb"),
                ham.alias("hamming"),
            )
            .where(F.col("hamming") <= PHASH_HAM_K)
            .distinct()
            .collect()
        }

    @staticmethod
    def _brute(texts):
        """Reference dHash + full pairwise Hamming in plain Python."""
        from hive_hdfs_practise_spark.multimodal.binary_ops import (
            PHASH_BLOCKS,
        )

        def sig(text):
            bl = max(1, -(-len(text) // PHASH_BLOCKS))
            cnts = [
                sum(ord(ch) for ch in text[i * bl : (i + 1) * bl])
                for i in range(PHASH_BLOCKS)
            ]
            bits = [
                1 if cnts[i] > cnts[i + 1] else 0
                for i in range(PHASH_BLOCKS - 1)
            ]
            return [
                sum(bits[k * 8 + j] << j for j in range(8)) for k in range(8)
            ]

        sigs = {d: sig(t) for d, t in texts.items()}
        out = set()
        ids = sorted(sigs)
        for i, da in enumerate(ids):
            for db in ids[i + 1 :]:
                h = sum(
                    bin(x ^ y).count("1")
                    for x, y in zip(sigs[da], sigs[db])
                )
                if h <= 7:
                    out.add((da, db, h))
        return out

    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(d, t, "en", "s", len(t)) for d, t in sorted(texts.items())],
            "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
        )

    def test_planted_near_dup_found_control_not(self, spark):
        base = (
            "the quick brown fox jumps over the lazy dog while seventeen "
            "engineers review a partition plan and argue about shuffle "
            "boundaries in the afternoon standup before finally agreeing "
            "to broadcast the small dimension table instead of sorting"
        )
        texts = {
            1: base,
            # same-LENGTH word swap: dHash (like pHash on images) is
            # robust to local value changes, not to length-shifting
            # edits that re-align every downstream block (the crop
            # analog) — so the planted edit preserves length
            2: base.replace("afternoon", "overnight"),
            3: "completely different content " * 9,  # control
        }
        got = self._pairs(spark, self._docs(spark, texts))
        pairs = {(a, b) for a, b, _ in got}
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_banded_join_equals_brute_force(self, spark):
        """Pigeonhole exactness: ≤7 flipped bits over 8 bands leave a
        clean band, so the banded plan must equal the quadratic
        reference EXACTLY — including pairs engineered to sit right
        at the threshold and pairs spreading flips across bands."""
        import random

        rng = random.Random(7)
        words = ["alpha", "bravo", "carol", "delta", "echos", "fotox"]
        texts = {}
        for d in range(40):
            texts[d] = " ".join(rng.choice(words) for _ in range(60))
        # planted family: progressively mutated copies of doc 0
        base = texts[0]
        for k, d in enumerate(range(100, 106)):
            chars = list(base)
            for _ in range(k * 3):
                pos = rng.randrange(len(chars))
                chars[pos] = rng.choice("xyz")
            texts[d] = "".join(chars)
        got = self._pairs(spark, self._docs(spark, texts))
        assert got == self._brute(texts)
        assert any(a == 0 and b >= 100 for a, b, _ in got)  # non-vacuous
