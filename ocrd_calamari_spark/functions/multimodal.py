"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the codec calls themselves are stubbed
(no image/audio libraries in this container) behind ``DecodeBackend``:
``fake`` is a deterministic header-parse backend used in tests, ``real``
raises NotImplementedError at the exact call site where PIL/ffmpeg would
plug in.

Payload convention for the fake backend (and the test generator):
  bytes 0..3   magic  b"IMG0" / b"AUD0" / b"VID0"
  bytes 4..7   width / sample-rate / n-frames (uint32 BE)
  bytes 8..11  height / n-samples / fps      (uint32 BE)
  rest         opaque body
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta", StructType([
            StructField("source_url", StringType(), True),
            StructField("content_type", StringType(), True),
        ]), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
        StructField("error", StringType(), True),
    ]
)

_MAGICS = {b"IMG0": "image", b"AUD0": "audio", b"VID0": "video"}
FEATURE_DIM = 16


def make_fake_payload(kind: str, a: int, b: int, body: bytes = b"") -> bytes:
    magic = {v: k for k, v in _MAGICS.items()}[kind]
    return magic + struct.pack(">II", a, b) + body


def _decode_one(payload, backend: str):
    """Header parse + deterministic pseudo-features.

    ``real`` backend is the marked plug-point for PIL/torchaudio/ffmpeg.
    """
    if backend == "real":
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg — not present in this "
            "environment; use backend='fake'"
        )
    if payload is None or len(payload) < 12:
        raise ValueError("payload too short")
    magic = bytes(payload[:4])
    if magic not in _MAGICS:
        raise ValueError(f"unknown magic {magic!r}")
    a, b = struct.unpack(">II", bytes(payload[4:12]))
    if a > 0x7FFFFFFF or b > 0x7FFFFFFF:
        # DECODED_SCHEMA carries int32 dims; a uint32 header above 2^31-1
        # would either wrap negative (Arrow unsafe cast, silent) or kill
        # the whole task (safe cast) — surface it as this row's error
        # instead, per the per-row error policy
        raise ValueError(f"header dims out of int32 range: {a}x{b}")
    # deterministic pseudo-embedding: xxhash-free, numpy-only rolling bytes
    body = np.frombuffer(bytes(payload[12:]), dtype=np.uint8)
    if len(body) == 0:
        feats = np.zeros(FEATURE_DIM, dtype=np.float32)
    else:
        pad = (-len(body)) % FEATURE_DIM
        arr = np.pad(body, (0, pad)).reshape(-1, FEATURE_DIM)
        feats = (arr.mean(axis=0) / 255.0).astype(np.float32)
    return a, b, len(payload), feats


def decode_media(df: DataFrame, backend: str = "fake") -> DataFrame:
    """mapInPandas media decode: BINARY payload → dims + feature vector.

    Per-row failures become error rows (ignore_errors semantics), never
    task failures — same policy as the html kernel.
    """

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"].values, pdf["kind"].values, pdf["payload"].values
            ):
                row = {"media_id": mid, "kind": kind, "width": None,
                       "height": None, "n_bytes": None, "features": None,
                       "error": None}
                try:
                    a, b, n, feats = _decode_one(payload, backend)
                    row.update(width=a, height=b, n_bytes=n,
                               features=feats.tolist())
                except Exception as exc:
                    row["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(_fn, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),
        StructField("error", StringType(), True),
    ]
)


def resize_images(df: DataFrame, max_side: int = 256,
                  backend: str = "fake") -> DataFrame:
    """Image resize via mapInPandas.

    ``fake`` backend rewrites the header dims to the aspect-preserving
    target and truncates the body proportionally (deterministic); ``real``
    is the marked PIL plug point.  Plumbing (schema, batching, error rows)
    is the tested surface.
    """

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"].values, pdf["kind"].values, pdf["payload"].values
            ):
                row = {"media_id": mid, "width": None, "height": None,
                       "payload": None, "error": None}
                try:
                    if backend == "real":
                        raise NotImplementedError(
                            "real resize requires PIL — use backend='fake'"
                        )
                    if kind != "image":
                        raise ValueError(f"not an image: {kind}")
                    w, h, _, _ = _decode_one(payload, backend)
                    scale = min(1.0, max_side / max(w, h, 1))
                    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                    body = bytes(payload[12:])
                    keep = max(1, int(len(body) * scale * scale)) if body else 0
                    row.update(
                        width=nw, height=nh,
                        payload=make_fake_payload("image", nw, nh, body[:keep]),
                    )
                except Exception as exc:
                    row["error"] = f"{type(exc).__name__}: {exc}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(_fn, RESIZED_SCHEMA)


def audio_resample_plan(df: DataFrame, target_rate: int = 16000) -> DataFrame:
    """Audio resample plan: parse each audio payload's sample-rate
    (bytes 4..7) and n-samples (bytes 8..11) JVM-side and compute the
    output length at ``target_rate`` — the planning step before a real
    resampler (the codec itself is the stubbed plug-point, like
    decode_media's).  Exact integer math (``div``), so the DuckDB oracle
    reproduces it bit-for-bit.  Rows with short payloads or a zero rate
    yield no plan row (nothing to resample)."""
    src_rate = F.conv(F.hex(F.substring(F.col("payload"), 5, 4)), 16, 10).cast("long")
    n_samples = F.conv(F.hex(F.substring(F.col("payload"), 9, 4)), 16, 10).cast("long")
    return (
        df.where((F.col("kind") == "audio") & (F.octet_length("payload") >= 12))
        .select(
            "media_id",
            src_rate.alias("src_rate"),
            n_samples.alias("n_samples"),
            F.lit(int(target_rate)).cast("long").alias("target_rate"),
        )
        .where(F.col("src_rate") > 0)
        .withColumn(
            "n_out_samples",
            F.expr("n_samples * target_rate div src_rate"),
        )
    )


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plan: expand each video row into frame stubs
    (frame_no, ts_offset_sec) JVM-side; the per-frame decode would attach
    via decode_media on the exploded rows.

    The stub count is derived from the payload itself: the n-frames and
    fps header fields (bytes 4..7 / 8..11 of the payload convention above)
    are parsed JVM-side (substring → hex → conv — no Python in the loop),
    so every video yields ``ceil(n_frames / every_n)`` stubs at
    ``frame_no / fps`` second offsets.  Rows with a short payload or a
    zero n-frames/fps header produce no stubs (nothing to sample)."""
    n_frames = F.conv(F.hex(F.substring(F.col("payload"), 5, 4)), 16, 10).cast("long")
    fps = F.conv(F.hex(F.substring(F.col("payload"), 9, 4)), 16, 10).cast("long")
    return (
        df.where(
            (F.col("kind") == "video") & (F.octet_length("payload") >= 12)
        )
        .select("media_id", n_frames.alias("_nf"), fps.alias("_fps"))
        .where((F.col("_nf") > 0) & (F.col("_fps") > 0))
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.col("_nf") - 1,
                    F.lit(int(every_n)).cast("long"),
                )
            ).alias("frame_no"),
            F.col("_fps"),
        )
        .withColumn("ts_offset_sec", F.col("frame_no") / F.col("_fps").cast("double"))
        .drop("_fps")
    )
