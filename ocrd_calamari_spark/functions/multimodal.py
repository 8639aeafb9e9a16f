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


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup: the REAL pHash algorithm (32x32 gray ->
# DCT-II -> low-frequency 8x8 -> median threshold -> 64 bits) over the
# deterministic fake pixel source; a real decoder (PIL) plugs in at the
# same point the other codecs do and nothing downstream changes.
# ---------------------------------------------------------------------------
_PHASH_N = 32


def _dct_matrix(n: int) -> "np.ndarray":
    k = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


def _phash_one(payload, backend: str) -> int:
    """64-bit pHash.  Pixel source: fake backend tiles the payload body
    into a 32x32 gray grid (REAL images would land here via PIL resize
    + grayscale); everything after the pixel grid is the standard pHash:
    2-D DCT-II, keep the low-frequency 8x8 block, threshold each
    coefficient at the block's MEDIAN (excluding the DC term from the
    median keeps flat images from degenerating), pack 64 sign bits."""
    if backend == "real":
        raise NotImplementedError(
            "real pHash needs PIL for decode+resize — use backend='fake'"
        )
    if payload is None or len(payload) < 12 or bytes(payload[:4]) != b"IMG0":
        raise ValueError("not an image payload")
    body = np.frombuffer(bytes(payload[12:]), dtype=np.uint8)
    need = _PHASH_N * _PHASH_N
    if len(body) == 0:
        grid = np.zeros(need, dtype=np.float64)
    else:
        reps = -(-need // len(body))
        grid = np.tile(body, reps)[:need].astype(np.float64)
    img = grid.reshape(_PHASH_N, _PHASH_N)
    m = _dct_matrix(_PHASH_N)
    coef = m @ img @ m.T
    low = coef[:8, :8].flatten()
    med = np.median(low[1:])  # DC excluded from the threshold
    bits = (low > med).astype(np.uint64)
    h = np.uint64(0)
    for i, b in enumerate(bits):
        h |= b << np.uint64(i)
    return int(h.astype(np.int64))  # signed for the LongType column


def phash_signatures(df: DataFrame, backend: str = "fake") -> DataFrame:
    """(media_id, phash) for image rows — mapInPandas, Arrow-batched,
    row-local (no shuffle); per-row failures become error rows like
    ``decode_media``."""
    schema = "media_id long, phash long, error string"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "phash": [], "error": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    h, err = _phash_one(payload, backend), None
                except (ValueError, NotImplementedError) as e:
                    h, err = None, str(e)
                out["media_id"].append(mid)
                out["phash"].append(h)
                out["error"].append(err)
            yield pd.DataFrame(out)

    imgs = df.where(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(fn, schema)


def phash_near_dupes(
    df: DataFrame, max_hamming: int = 3, backend: str = "fake"
) -> DataFrame:
    """Image near-dup pairs by pHash Hamming distance <= ``max_hamming``
    — the visual twin of ``simhash_near_dupes`` with the SAME pigeonhole
    blocking (4 x 16-bit chunks: Hamming <= 3 implies one exact chunk
    match, so recall is exact, not probabilistic); verify is
    ``bit_count(xor)`` JVM-side.  Only (chunk, id, sig) rows shuffle."""
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            f"pigeonhole over 4 chunks is exact only for Hamming <= 3: "
            f"{max_hamming}"
        )
    sigs = phash_signatures(df, backend).where(
        F.col("error").isNull()
    ).select("media_id", F.col("phash").alias("sig"))
    chunks = sigs.select(
        "media_id", "sig",
        F.explode(
            F.array(*[
                (F.lit(i * 65536)
                 + F.shiftrightunsigned("sig", 16 * i)
                 .bitwiseAND(F.lit(0xFFFF))).cast("long")
                for i in range(4)
            ])
        ).alias("ck"),
    )
    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.ck") == F.col("r.ck"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .select(
            F.col("l.media_id").alias("id_a"),
            F.col("r.media_id").alias("id_b"),
            F.bit_count(
                F.col("l.sig").bitwiseXOR(F.col("r.sig"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
