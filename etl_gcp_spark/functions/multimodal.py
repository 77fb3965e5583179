"""Multimodal columns: binary payloads + typed metadata + Pandas-UDF
feature extraction.

Design (system contract, not in the reference): image/audio/video are
opaque ``binary`` columns plus a typed metadata struct. Heavy per-item
work (decode, resize, frame-sample, feature-extract) runs in
Arrow-batched ``mapInPandas`` so bytes cross the JVM↔Python boundary
once per batch, not per row, and the operator scales horizontally like
any other stage.

The actual media codecs are NOT available in this environment, so the
decode kernels are stubbed: :func:`decode_media` raises
``NotImplementedError`` by design, and the tested path uses a
deterministic fake decoder (md5-derived features) that keeps every
piece of Spark plumbing real — schema, batching, partitioning, UDF
signatures — while producing oracle-checkable output.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODALITIES = ("image", "audio", "video")

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def attach_binary_payload(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Model the documents table as a multimodal table.

    Payload = utf-8 bytes of the text (a deterministic stand-in for
    image/audio bytes); modality assigned round-robin by id; metadata
    struct carries source + declared length. At 100 TB the payload
    column lives in its own parquet column chunk — scans that don't
    touch it never read it (column pruning).
    """
    return documents.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").alias("declared_len"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, modality: str):  # pragma: no cover - stub
    """Real decoder entry point — requires PIL/ffmpeg/librosa.

    STUB: media codecs are not installed in this environment.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in "
        "this container; use extract_features(fake_decode=True)"
    )


def _fake_features(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a decoder: md5 digest + fake dims."""
    digest = hashlib.md5(payload).hexdigest()
    n = len(payload)
    return digest, n % 64, (n * 7) % 64


def extract_features(
    multimodal: DataFrame, *, fake_decode: bool = True
) -> DataFrame:
    """Per-item feature extraction via Arrow-batched ``mapInPandas``.

    The iterator-of-batches signature is the real contract a decoder
    would use (bounded memory per batch; no driver collect). With
    ``fake_decode`` the kernel computes md5-derived features so tests
    and the oracle can verify the plumbing end-to-end.
    """
    if not fake_decode:
        decode_media(b"", "image")  # raises NotImplementedError

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "modality": pdf["modality"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "digest": [f[0] for f in feats],
                    "width": pd.Series([f[1] for f in feats], dtype="int64"),
                    "height": pd.Series([f[2] for f in feats], dtype="int64"),
                }
            )

    return multimodal.mapInPandas(kernel, FEATURE_SCHEMA)


def sample_frames(
    multimodal: DataFrame, *, every_nth: int = 10, fake_decode: bool = True
) -> DataFrame:
    """Frame-sampling plumbing for video payloads.

    Real implementation would emit one row per sampled frame with
    frame bytes; the fake kernel emits one row per ``every_nth`` byte
    offset — same fan-out shape (1→N rows), same schema discipline.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_index", T.LongType()),
            T.StructField("frame_digest", T.StringType()),
        ]
    )
    if not fake_decode:
        decode_media(b"", "video")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_dig = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for i, off in enumerate(range(0, len(data), every_nth)):
                    out_ids.append(int(doc_id))
                    out_idx.append(i)
                    out_dig.append(hashlib.md5(data[off : off + every_nth]).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "frame_index": pd.Series(out_idx, dtype="int64"),
                    "frame_digest": pd.Series(out_dig, dtype="object"),
                }
            )

    video = multimodal.filter(F.col("modality") == "video")
    return video.mapInPandas(kernel, schema)


def resize_media(
    multimodal: DataFrame,
    *,
    target_w: int = 32,
    target_h: int = 32,
    fake_decode: bool = True,
) -> DataFrame:
    """Resize plumbing for image payloads (Arrow-batched).

    Real implementation decodes, resamples, re-encodes; the fake
    kernel emits a deterministic digest of (payload, target dims) and
    a byte-budget proportional to the target area — preserving the
    real operator's schema, batching, and size semantics so the
    pipeline around it is fully testable without codecs.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("resized_len", T.LongType()),
            T.StructField("resized_digest", T.StringType()),
        ]
    )
    if not fake_decode:
        decode_media(b"", "image")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [
                hashlib.md5(
                    bytes(p) + f"|{target_w}x{target_h}".encode()
                ).hexdigest()
                for p in pdf["payload"]
            ]
            out_len = [
                min(len(bytes(p)), target_w * target_h) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series([target_w] * len(pdf), dtype="int64"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int64"),
                    "resized_len": pd.Series(out_len, dtype="int64"),
                    "resized_digest": pd.Series(digests, dtype="object"),
                }
            )

    images = multimodal.filter(F.col("modality") == "image")
    return images.mapInPandas(kernel, schema)
