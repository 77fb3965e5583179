"""Multimodal column plumbing: binary payloads, Arrow-batched feature
extraction, frame-sampling fan-out, and the decoder stub contract."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row

from etl_gcp_spark.functions.multimodal import (
    attach_binary_payload,
    decode_media,
    extract_features,
    sample_frames,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=i, text=t, source="s", n_chars=len(t))
            for i, t in enumerate(
                ["alpha beta gamma", "short", "0123456789" * 4]
            )
        ]
    )


def test_attach_binary_payload_schema(spark):
    mm = attach_binary_payload(_docs(spark))
    types = dict(mm.dtypes)
    assert types["payload"] == "binary"
    assert types["modality"] == "string"
    assert types["meta"].startswith("struct<")
    mods = {r.doc_id: r.modality for r in mm.collect()}
    assert set(mods.values()) <= {"image", "audio", "video"}


def test_extract_features_matches_local_md5(spark):
    mm = attach_binary_payload(_docs(spark))
    feats = {r.doc_id: r for r in extract_features(mm).collect()}
    assert feats[0].digest == hashlib.md5(b"alpha beta gamma").hexdigest()
    assert feats[0].byte_len == 16
    assert 0 <= feats[0].width < 64 and 0 <= feats[0].height < 64


def test_sample_frames_fanout_shape(spark):
    mm = attach_binary_payload(_docs(spark))
    videos = {r.doc_id for r in mm.filter("modality = 'video'").collect()}
    out = sample_frames(mm, every_nth=5).collect()
    assert {r.doc_id for r in out} == videos
    for r in out:
        assert r.frame_index >= 0 and len(r.frame_digest) == 32


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"bytes", "image")
    with pytest.raises(NotImplementedError):
        extract_features(None, fake_decode=False)


def test_resize_media_contract(spark):
    from etl_gcp_spark.functions.multimodal import resize_media

    mm = attach_binary_payload(_docs(spark))
    out = {r.doc_id: r for r in resize_media(mm, target_w=8, target_h=8).collect()}
    images = {r.doc_id for r in mm.filter("modality = 'image'").collect()}
    assert set(out) == images
    for r in out.values():
        assert (r.width, r.height) == (8, 8)
        assert r.resized_len <= 64 and len(r.resized_digest) == 32
    with pytest.raises(NotImplementedError):
        resize_media(mm, fake_decode=False)
