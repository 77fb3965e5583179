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


def _pil_available() -> bool:
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


def _wav_bytes(n_frames: int = 100, framerate: int = 8000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(b"\x00\x01" * n_frames)
    return buf.getvalue()


def test_decode_media_soft_import_boundary():
    # image decode either works (PIL installed) or raises the honest
    # NotImplementedError — never silently fakes
    if _pil_available():
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (2, 3)).save(buf, format="PNG")
        meta = decode_media(buf.getvalue(), "image")
        assert (meta["width"], meta["height"]) == (2, 3)
    else:
        with pytest.raises(NotImplementedError):
            decode_media(b"bytes", "image")
    with pytest.raises(ValueError):
        decode_media(b"x", "hologram")


def test_decode_media_wav_via_stdlib():
    # WAV decoding needs only the stdlib wave module — the real-codec
    # path is exercised in every environment
    meta = decode_media(_wav_bytes(n_frames=100, framerate=8000), "audio")
    assert meta["n_frames"] == 100
    assert meta["framerate"] == 8000
    assert meta["channels"] == 1


def test_extract_features_real_kernel_on_audio(spark):
    # fake_decode=False runs decode_media inside the Arrow kernel;
    # audio uses stdlib wave, so this needs no optional codec. Audio
    # has no spatial dims -> NULL width/height.
    wav = _wav_bytes()
    mm = spark.createDataFrame(
        [Row(doc_id=7, modality="audio", payload=bytearray(wav))],
        "doc_id long, modality string, payload binary",
    )
    feats = extract_features(mm, fake_decode=False).collect()
    assert len(feats) == 1
    r = feats[0]
    assert r.digest == hashlib.md5(wav).hexdigest()
    assert r.byte_len == len(wav)
    assert r.width is None and r.height is None


@pytest.mark.skipif(not _pil_available(), reason="PIL not installed")
def test_real_image_decode_and_resize(spark):
    import io

    from PIL import Image

    from etl_gcp_spark.functions.multimodal import resize_media

    buf = io.BytesIO()
    Image.new("RGB", (16, 9), color=(10, 20, 30)).save(buf, format="PNG")
    png = buf.getvalue()
    mm = spark.createDataFrame(
        [Row(doc_id=1, modality="image", payload=bytearray(png))],
        "doc_id long, modality string, payload binary",
    )
    feats = extract_features(mm, fake_decode=False).collect()[0]
    assert (feats.width, feats.height) == (16, 9)
    resized = resize_media(
        mm, target_w=4, target_h=4, fake_decode=False
    ).collect()[0]
    assert (resized.width, resized.height) == (4, 4)
    # round-trip: the emitted digest matches the PNG re-encode of the
    # LANCZOS resize
    with Image.open(io.BytesIO(png)) as im:
        out = io.BytesIO()
        im.resize((4, 4), Image.LANCZOS).save(out, format="PNG")
    assert resized.resized_digest == hashlib.md5(out.getvalue()).hexdigest()
    assert resized.resized_len == len(out.getvalue())


def test_resize_media_contract(spark):
    from etl_gcp_spark.functions.multimodal import resize_media

    mm = attach_binary_payload(_docs(spark))
    out = {r.doc_id: r for r in resize_media(mm, target_w=8, target_h=8).collect()}
    images = {r.doc_id for r in mm.filter("modality = 'image'").collect()}
    assert set(out) == images
    for r in out.values():
        assert (r.width, r.height) == (8, 8)
        assert r.resized_len <= 64 and len(r.resized_digest) == 32
    if not _pil_available():
        with pytest.raises(NotImplementedError):
            resize_media(mm, fake_decode=False)
    with pytest.raises(NotImplementedError):
        sample_frames(mm, fake_decode=False)


def test_payload_dedup_per_modality(spark):
    from pyspark.sql import functions as F

    from etl_gcp_spark.functions.multimodal import payload_dedup

    media = spark.createDataFrame(
        [
            (1, "image", bytearray(b"AA")),
            (2, "image", bytearray(b"AA")),   # dup of 1
            (3, "audio", bytearray(b"AA")),   # same bytes, other modality
            (4, "image", bytearray(b"BB")),
        ],
        "doc_id long, modality string, payload binary",
    )
    out = {(r.modality, r.doc_id): r.n_copies
           for r in payload_dedup(media).collect()}
    assert out == {("image", 1): 2, ("audio", 3): 1, ("image", 4): 1}


def test_ahash_near_dup_pairs(spark):
    import pytest

    from etl_gcp_spark.functions.multimodal import ahash_near_dup_pairs

    base = "the quick brown fox jumps over the lazy dog " * 4
    # length-preserving edit: the fake sampler reads positions
    # (i*n) div 64, so same-length payloads sample the same offsets;
    # a 20-char high-ASCII patch flips the ~3 bits it lands on
    # (measured hamming 6 of 64)
    tweaked = base[:60] + "z" * 20 + base[80:]
    different = "".join(chr(65 + (i * 7) % 26) for i in range(180))
    media = spark.createDataFrame(
        [
            (1, bytearray(base.encode())),
            (2, bytearray(base.encode())),       # identical -> hamming 0
            (3, bytearray(tweaked.encode())),    # near-dup -> small hamming
            (4, bytearray(different.encode())),  # unrelated
            (5, bytearray(b"")),                 # empty: excluded
        ],
        "doc_id long, payload binary",
    )
    out = {(r.id1, r.id2): r.hamming
           for r in ahash_near_dup_pairs(media, max_hamming=7).collect()}
    assert out[(1, 2)] == 0
    assert (1, 3) in out and 0 < out[(1, 3)] <= 7
    assert all(4 not in p and 5 not in p for p in out)

    with pytest.raises(ValueError):
        ahash_near_dup_pairs(media, max_hamming=8, n_bands=8)
    with pytest.raises(ValueError):
        ahash_near_dup_pairs(media, n_bands=7)


def test_ahash_banded_candidates_complete(spark):
    """Pigeonhole completeness: at max_hamming = n_bands-1 the banded
    candidate set must reproduce the brute-force pair set exactly."""
    from pyspark.sql import functions as F

    from etl_gcp_spark.functions.multimodal import ahash_near_dup_pairs

    # deterministic corpus with repeats and small perturbations
    texts = []
    for i in range(30):
        body = "".join(
            chr(97 + ((i // 6) * 5 + j * (1 + i % 3)) % 26)
            for j in range(120)
        )
        texts.append((i, bytearray(body.encode())))
    media = spark.createDataFrame(texts, "doc_id long, payload binary")
    banded = ahash_near_dup_pairs(media, max_hamming=7).collect()
    got = {(r.id1, r.id2): r.hamming for r in banded}

    # brute force from the same fingerprints: relax banding by using
    # a single 64-sample gray vector per doc computed in pure Python
    rows = media.collect()
    def grays(b):
        s = bytes(b).decode()
        n = len(s)
        return [ord(s[(i * n) // 64]) for i in range(64)]
    fps = {}
    for r in rows:
        g = grays(r.payload)
        tot = sum(g)
        fps[r.doc_id] = [1 if x * 64 > tot else 0 for x in g]
    want = {}
    ids = sorted(fps)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = sum(a != b for a, b in zip(fps[ids[i]], fps[ids[j]]))
            if h <= 7:
                want[(ids[i], ids[j])] = h
    assert got == want
