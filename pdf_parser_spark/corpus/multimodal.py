"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery is real — binary columns, Arrow-batched
`mapInPandas` with explicit schemas, deterministic partition-friendly
shapes; the *codec* step is stubbed because the container ships no
image/audio libraries. Each stub either raises a clearly-marked
``NotImplementedError`` (strict mode) or produces a deterministic fake
derived from the payload bytes (default), so pipelines and tests exercise
the full dataflow. Swapping a stub for Pillow/torchaudio/decord is a
one-function change with the same schema.

Layout of a multimodal record: ``(doc_id, kind, payload binary, meta map)``
— the binary analog of the transcript payload column, processed by the
same turn-local, shuffle-free map pattern as text extraction.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, kind string, n_bytes long, width long, height long, "
    "channels long, ok boolean")
RESIZE_SCHEMA = (
    "doc_id long, kind string, out_width long, out_height long, "
    "thumb binary")
FRAMES_SCHEMA = (
    "doc_id long, frame_idx long, frame_offset long, frame_md5 string")
FEATURE_DIM = 16
FEATURES_SCHEMA = "doc_id long, feature array<float>"


def attach_binary(df: DataFrame, text_col: str = "text",
                  kind: str = "image/fake") -> DataFrame:
    """Derive a deterministic binary payload column from a text column —
    the sandbox stand-in for reading real media bytes."""
    return df.select(
        "doc_id",
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def _fake_dims(n: int) -> tuple:
    return (n % 640) + 16, ((n * 7) % 480) + 16, 3


def decode_meta(df: DataFrame, strict: bool = False) -> DataFrame:
    """Decode header metadata from the binary payload.

    STUB: real decoding (PIL.Image.open / soundfile / PyAV) is unavailable
    in this container. strict=True raises NotImplementedError per batch —
    the marker for where the codec integrates; the default emits
    deterministic fake dims derived from the byte length, keeping the
    Arrow plumbing and downstream schema real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media codec not available in this container; "
                    "integrate PIL/soundfile here")
            # degrade-don't-fail (D1): a NULL payload (failed fetch,
            # tombstoned blob) emits a row with null metadata and
            # ok=False — it must never kill the task (found by the
            # hostile-gate suite; real media tables carry such rows)
            n = pdf["payload"].map(
                lambda p: len(p) if p is not None else None)
            dims = [_fake_dims(int(v)) if pd.notna(v) else (None,) * 3
                    for v in n]
            w, h, c = zip(*dims) if dims else ((), (), ())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "n_bytes": n,
                "width": w, "height": h, "channels": c,
                "ok": n.notna(),
            })

    return df.mapInPandas(run, schema=DECODE_SCHEMA)


def resize_stub(df: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Thumbnail 'resize': STUB producing a deterministic byte digest of
    the payload at the target size (real impl: vectorized PIL thumbnail
    per Arrow batch — same signature, same schema)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [
                bytes(bytearray((payload[i % len(payload)] if payload else 0)
                                for i in range(32)))
                for payload in pdf["payload"]
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "out_width": out_w, "out_height": out_h,
                "thumb": thumbs,
            })

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 4096,
                 max_frames: int = 8) -> DataFrame:
    """'Frame sampling' over a video-like byte stream: one row per sampled
    offset (STUB digesting the chunk; real impl: keyframe extraction with
    the same exploded output shape)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for doc_id, payload in pdf[["doc_id", "payload"]].itertuples(index=False):
                n = len(payload) if payload is not None else 0
                for i, off in enumerate(range(0, n, every_n_bytes)):
                    if i >= max_frames:
                        break
                    chunk = bytes(payload[off:off + every_n_bytes])
                    recs.append((doc_id, i, off,
                                 hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(
                recs, columns=["doc_id", "frame_idx", "frame_offset", "frame_md5"])

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def feature_extract(df: DataFrame) -> DataFrame:
    """Embedding-style feature vector per payload: STUB via a byte
    histogram folded to FEATURE_DIM floats (real impl: a predict_batch
    UDF over a vision/audio encoder; identical schema)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload or b""), dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
                total = max(hist.sum(), 1)
                feats.append((hist / total).astype(np.float32))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)
