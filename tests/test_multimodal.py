"""Tests for the multimodal binary-column plumbing (decode is stubbed; the
Spark-side schema/batching/UDF path is real — operators/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flink_streaming_demo_spark.operators import multimodal as MM


def _media(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNG fake image bytes"), {"w": "64"}),
        (2, "audio", bytearray(b"RIFF fake wav"), {}),
        (3, "video", None, {}),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_extract_features_schema_and_values(spark):
    out = MM.extract_features(_media(spark))
    assert [f.name for f in out.schema.fields] == [
        "media_id", "media_type", "byte_len", "content_hash",
        "fake_width", "fake_height",
    ]
    rows = {r.media_id: r for r in out.collect()}
    payload = b"\x89PNG fake image bytes"
    assert rows[1].byte_len == len(payload)
    assert rows[1].content_hash == hashlib.md5(payload).hexdigest()
    assert rows[1].fake_width == len(payload) % 640
    # null payload -> treated as empty bytes
    assert rows[3].byte_len == 0


def test_decode_stubs_raise(spark):
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"")
    with pytest.raises(NotImplementedError):
        MM.decode_audio(b"")
    with pytest.raises(NotImplementedError):
        MM.sample_frames(b"")


def test_documents_as_media_adapter(spark, sf_dir):
    from flink_streaming_demo_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = MM.documents_as_media(docs)
    row = media.filter(F.col("media_id") == 0).first()
    assert row.media_type == "image"  # 0 % 3
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta["lang"] is not None


def test_frame_index_fanout_contract(spark, sf_dir):
    """1->N fan-out plumbing: only video rows fan out, the frame count
    per media is exactly the deterministic fake duration (1 + bytes%5),
    frame numbers are dense from 0, and frame hashes are unique."""
    from pyspark.sql import functions as F

    from flink_streaming_demo_spark.operators.multimodal import (
        documents_as_media,
        frame_index,
    )
    from flink_streaming_demo_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    frames = frame_index(media)
    per = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("frame_no").alias("lo"),
        F.max("frame_no").alias("hi"),
    )
    videos = media.filter(F.col("media_type") == "video").select(
        "media_id", F.length("payload").alias("n_bytes")
    )
    joined = per.join(videos, "media_id", "full").collect()
    assert joined, "corpus must contain video-typed media"
    for r in joined:
        assert r["n_bytes"] is not None, "fan-out emitted a non-video row"
        assert r["n"] == 1 + r["n_bytes"] % 5
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1
    total = frames.count()
    assert frames.select("frame_hash").distinct().count() == total
