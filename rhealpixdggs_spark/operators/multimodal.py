"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata (engine-level operators; no counterpart in the reference,
SURVEY.md section 2.7).

Design for 100 TB: the payload stays an opaque ``binary`` column in
its own parquet column chunk (column pruning means queries that never
touch pixels never read them); decode / feature-extract / frame-sample
run as Arrow-batched ``mapInPandas`` so each Python worker sees a
whole batch of payloads at once and NumPy processes them without
per-row Python.

The sandbox has no image/audio codecs (no PIL/av/librosa), so the
*codec* step is stubbed: ``decode_image`` falls back to a
deterministic fake decode and ``resize_image`` raises
``NotImplementedError`` unless PIL is importable. Everything around
the codec — schemas, batch shapes, partitioning, frame sampling, byte
features — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_TYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    media_type: str = "image",
) -> DataFrame:
    """Synthesize a multimodal table from a text table: payload =
    UTF-8 bytes of the text (deterministic stand-in for an encoded
    image/audio blob), typed metadata derived from the byte length.
    Production tables would carry real codec bytes in the same shape:
    (id, media_type string, payload binary, meta struct)."""
    nb = F.octet_length(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            (nb % 64 + 1).cast("int").alias("width"),
            (nb % 48 + 1).cast("int").alias("height"),
            (nb % 24 + 1).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("hist16", T.ArrayType(T.LongType())),
    ]
)


def byte_features(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over opaque payloads: byte count, exact mean
    byte (integer sum / n, so engines agree bit-for-bit), first byte,
    16-bin byte histogram. One NumPy pass per Arrow batch."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                n = int(b.size)
                rows.append(
                    (
                        int(i),
                        n,
                        float(int(b.sum())) / n if n else 0.0,
                        int(b[0]) if n else -1,
                        np.bincount(b >> 4, minlength=16).astype("int64").tolist(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _FEAT_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        extract, _FEAT_SCHEMA
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("frame_sum", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_size: int = 16,
    every_k: int = 3,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video-style frame sampling: chunk the payload into fixed-size
    frames, keep every k-th (frame 0, k, 2k, ...). Explodes inside
    mapInPandas so frame bytes never round-trip through the driver."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(buf)
                n_frames = (len(b) + frame_size - 1) // frame_size
                for fi in range(0, n_frames, every_k):
                    fr = b[fi * frame_size : (fi + 1) * frame_size]
                    arr = np.frombuffer(fr, dtype=np.uint8)
                    rows.append((int(i), fi, len(fr), int(arr.sum()), fr))
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        sample, _FRAME_SCHEMA
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("decoded_by", T.StringType()),
    ]
)


def decode_image(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id", meta_col: str = "meta") -> DataFrame:
    """Decode step. With PIL installed it decodes real image bytes; in
    this container (no codecs) it falls back to a CLEARLY-MARKED
    deterministic fake: bytes tiled into the (width, height) from
    metadata. The Spark plumbing (schema, Arrow batching, partition
    preservation) is identical either way."""
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf, meta in zip(pdf[id_col], pdf[payload_col], pdf["_w_h"]):
                w, h = int(meta[0]), int(meta[1])
                if have_pil:  # pragma: no cover
                    raise NotImplementedError(
                        "real codec path: wire PIL.Image.open here"
                    )
                # FAKE DECODE (deterministic): tile payload bytes into
                # the metadata raster shape.
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                px = np.resize(b, (h, w)) if b.size else np.zeros((h, w), np.uint8)
                rows.append((int(i), w, h, float(px.mean()), "fake"))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _DECODE_SCHEMA.fields]
            )

    prepped = df.select(
        F.col(id_col),
        F.col(payload_col),
        F.array(F.col(f"{meta_col}.width"), F.col(f"{meta_col}.height")).alias("_w_h"),
    )
    return prepped.mapInPandas(decode, _DECODE_SCHEMA)


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: real resampling needs an image library that is not in
    this container. The signature and schema are the contract."""
    raise NotImplementedError(
        "resize_image requires PIL/opencv (not available offline); "
        "decode_image/byte_features/sample_frames cover the plumbing"
    )
