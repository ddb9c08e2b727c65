"""Multimodal plumbing tests: binary schema, Arrow decode harness parity
with the native twin, frame-slice byte math, import-gated real decoder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from briefly_spark.catalog import load_table
from briefly_spark.operators.multimodal import (
    attach_media,
    decode_features,
    fake_features_expr,
    fake_features_py,
    sample_frames,
)


def _media(spark, sf_dir, n=20):
    return attach_media(load_table(spark, sf_dir, "documents").limit(n))


def test_media_schema_is_binary_plus_typed_meta(spark, sf_dir):
    media = _media(spark, sf_dir)
    assert isinstance(media.schema["content"].dataType, T.BinaryType)
    meta = media.schema["meta"].dataType
    assert isinstance(meta, T.StructType)
    assert [f.name for f in meta.fields] == [
        "media_type", "width", "height", "duration_ms", "n_bytes",
    ]
    row = media.first()
    assert row["meta"]["n_bytes"] == len(row["content"])


def test_arrow_decode_matches_native_twin(spark, sf_dir):
    media = _media(spark, sf_dir)
    native = media.select("media_id", fake_features_expr(F.col("content"), 8).alias("f"))
    arrow = decode_features(media, dims=8, backend="fake")
    n = {r["media_id"]: r["f"] for r in native.collect()}
    a = {r["media_id"]: r["features"] for r in arrow.collect()}
    assert n == a


def test_fake_features_py_twin(spark):
    df = spark.createDataFrame([("payload",)], ["t"])
    got = df.select(fake_features_expr(F.encode("t", "UTF-8"), 4).alias("f")).first()["f"]
    assert got == fake_features_py(b"payload", 4)


def test_frame_slices_are_real_byte_ranges(spark, sf_dir):
    media = _media(spark, sf_dir, n=5)
    blobs = {r["media_id"]: r["content"] for r in media.collect()}
    frames = sample_frames(media, n_frames=4, frame_bytes=32).collect()
    assert len(frames) == 20
    for r in frames:
        expected = blobs[r["media_id"]][r["off"] : r["off"] + 32]
        assert bytes(r["frame"]) == bytes(expected)


def test_pil_backend_is_import_gated(spark, sf_dir):
    media = _media(spark, sf_dir, n=2)
    out = decode_features(media, dims=4, backend="pil")
    with pytest.raises(Exception):
        out.collect()


def test_png_backend_decodes_real_blobs_through_spark(spark):
    """The non-stub decode path end-to-end: REAL PNG bytes (correct CRCs)
    ride a binary column into the Arrow-batched mapInPandas stage, worker
    processes run the genuine stdlib zlib decode (no mocks), and features
    come back pixel-exact."""
    import struct
    import zlib

    from briefly_spark.operators.multimodal import decode_features, png_features

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    def png(width, height, seed):
        px = [(x * seed + y * (seed + 3)) % 256 for y in range(height) for x in range(width)]
        raw = b"".join(
            b"\x00" + bytes(px[y * width : (y + 1) * width]) for y in range(height)
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    blobs = [(i, png(8, 8, 7 + i)) for i in range(6)]
    df = spark.createDataFrame(blobs, "media_id long, content binary")
    got = {
        r["media_id"]: r["features"]
        for r in decode_features(df.repartition(3), dims=4, backend="png").collect()
    }
    assert set(got) == set(range(6))
    for i, blob in blobs:
        assert got[i] == png_features(blob, 4)


def test_wav_backend_decodes_real_blobs_through_spark(spark):
    """The real audio decode path end-to-end: genuine RIFF/PCM bytes
    (written by the stdlib `wave` module) ride a binary column into the
    Arrow-batched mapInPandas stage and come back as sample-exact RMS
    features."""
    from tests.test_backend_seams import _wav_bytes

    from briefly_spark.operators.multimodal import decode_features, wav_features

    blobs = [
        (i, _wav_bytes([[((j * (97 + i)) % 1601) - 800 for j in range(48)]]))
        for i in range(6)
    ]
    df = spark.createDataFrame(blobs, "media_id long, content binary")
    got = {
        r["media_id"]: r["features"]
        for r in decode_features(df.repartition(3), dims=4, backend="wav").collect()
    }
    assert set(got) == set(range(6))
    for i, blob in blobs:
        assert got[i] == wav_features(blob, 4)
