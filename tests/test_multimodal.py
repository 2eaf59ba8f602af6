"""Multimodal binary-column plumbing: schema, Arrow batch path, stubs."""

import hashlib

import pytest

from flink_realtime_data_warehouse_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    extract_media_features,
)


def _media_rows():
    return [
        (1, b"\x89PNG\r\nfakebytes" * 10, "image", "png", 32, 32, None),
        (2, b"RIFFfakewav" * 100, "audio", "wav", None, None, 1500),
        (3, None, "video", "mp4", 640, 480, 10_000),  # payload lost upstream
    ]


def test_extract_media_features_batch_path(spark):
    df = spark.createDataFrame(_media_rows(), MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert set(out) == {1, 2, 3}
    payload1 = _media_rows()[0][1]
    assert out[1]["n_bytes"] == len(payload1)
    assert out[1]["payload_sha"] == hashlib.sha1(payload1).hexdigest()
    # null payload flows through without crashing the batch
    assert out[3]["n_bytes"] == 0
    assert out[3]["payload_sha"] is None
    assert all(r["feature_dim"] == 64 for r in out.values())


def test_media_schema_binary_column_survives_roundtrip(spark, tmp_path):
    """binary payloads must round-trip through the lake format intact."""
    path = str(tmp_path / "media")
    spark.createDataFrame(_media_rows(), MEDIA_SCHEMA).write.parquet(path)
    back = {r["media_id"]: r for r in spark.read.parquet(path).collect()}
    assert bytes(back[1]["payload"]) == _media_rows()[0][1]
    assert back[2]["duration_ms"] == 1500


def test_decode_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
