"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata (engine-level operators; no counterpart in the reference,
SURVEY.md section 2.7).

Design for 100 TB: the payload stays an opaque ``binary`` column in
its own parquet column chunk (column pruning means queries that never
touch pixels never read them); decode / feature-extract / frame-sample
run as Arrow-batched ``mapInPandas`` so each Python worker sees a
whole batch of payloads at once and NumPy processes them without
per-row Python.

Codec status: binary P6 PPM (uncompressed portable pixmap) has a REAL
pure-NumPy encoder/decoder pair (``encode_ppm`` / ``parse_ppm``,
oracle-gated end to end by the driver's ``image_decode`` query);
and ``resize_image`` resamples PPM payloads with a real pure-NumPy
nearest-neighbor path (``resize_ppm``); compressed formats would go
through PIL, absent in this sandbox, so ``decode_image`` falls back
to a clearly-marked deterministic fake and ``resize_image`` raises
the declared NotImplementedError for non-PPM payloads.
Everything around the codecs — schemas, batch shapes, partitioning,
frame sampling, byte features — is real and tested.
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


def _flatten_payloads(bufs) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ragged binaries -> (flat uint8 buffer, per-row lengths, row start
    offsets). One C-level join — the only per-row Python is len()."""
    lengths = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1])) if len(bufs) else np.zeros(0, np.int64)
    return flat, lengths, starts


def byte_features(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over opaque payloads: byte count, exact mean
    byte (integer sum / n, so engines agree bit-for-bit), first byte,
    16-bin byte histogram.

    Fully vectorized over the flattened batch buffer (offsets +
    reduceat + one bincount over row*16+nibble keys) — no Python-level
    per-row loop even though the binaries are ragged."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            bufs = [bytes(b) for b in pdf[payload_col]]
            flat, lengths, starts = _flatten_payloads(bufs)
            nonempty = lengths > 0
            sums = np.zeros(n, dtype=np.int64)
            if flat.size:
                # per-row byte sums via prefix-sum differences (robust
                # to empty rows, unlike reduceat on duplicate offsets)
                csum = np.concatenate(([0], np.cumsum(flat, dtype=np.int64)))
                sums = csum[starts + lengths] - csum[starts]
            mean = np.where(nonempty, sums / np.maximum(lengths, 1), 0.0)
            first = np.full(n, -1, dtype=np.int64)
            if flat.size:
                first[nonempty] = flat[starts[nonempty]]
            hist = np.zeros((n, 16), dtype=np.int64)
            if flat.size:
                row_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
                keys = row_of * 16 + (flat >> 4)
                hist = np.bincount(keys, minlength=n * 16).reshape(n, 16)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(np.int64).to_numpy(),
                    "n_bytes": lengths,
                    "mean_byte": mean,
                    "first_byte": first.astype(np.int32),
                    "hist16": list(hist.astype(np.int64)),
                }
            )

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
        import pyarrow as pa

        for pdf in batches:
            n = len(pdf)
            bufs = [bytes(b) for b in pdf[payload_col]]
            flat, lengths, starts = _flatten_payloads(bufs)
            ids = pdf[id_col].astype(np.int64).to_numpy()
            # kept frames per row: indices 0, k, 2k, ... below ceil(n/fs)
            n_frames = (lengths + frame_size - 1) // frame_size
            kept = (n_frames + every_k - 1) // every_k
            total = int(kept.sum())
            if total == 0:
                yield pd.DataFrame(
                    {f.name: [] for f in _FRAME_SCHEMA.fields}
                ).astype({"doc_id": "int64", "frame_idx": "int64",
                          "frame_len": "int32", "frame_sum": "int64",
                          "frame": "object"})
                continue
            row_of = np.repeat(np.arange(n, dtype=np.int64), kept)
            # frame index within its row: global position minus the
            # row's first output slot, times the stride.
            out_starts = np.concatenate(([0], np.cumsum(kept)[:-1]))
            within = np.arange(total, dtype=np.int64) - np.repeat(out_starts, kept)
            frame_idx = within * every_k
            f_start = starts[row_of] + frame_idx * frame_size
            f_len = np.minimum(
                frame_size, lengths[row_of] - frame_idx * frame_size
            ).astype(np.int64)
            # exact per-frame sums from the flat prefix sum — no loop
            csum = np.concatenate(([0], np.cumsum(flat, dtype=np.int64)))
            f_sum = csum[f_start + f_len] - csum[f_start]
            # gather kept-frame bytes into one contiguous buffer and
            # wrap it as an Arrow binary array (offsets + values), so
            # the ragged frame column is built without per-frame Python
            v_ends = np.cumsum(f_len)
            v_starts = v_ends - f_len
            gather = (
                np.repeat(f_start - v_starts, f_len)
                + np.arange(int(v_ends[-1]), dtype=np.int64)
            )
            values = flat[gather]
            offsets = np.concatenate(([0], v_ends)).astype(np.int32)
            frames = pa.Array.from_buffers(
                pa.binary(), total,
                [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(values.tobytes())],
            )
            yield pd.DataFrame(
                {
                    "doc_id": ids[row_of],
                    "frame_idx": frame_idx,
                    "frame_len": f_len.astype(np.int32),
                    "frame_sum": f_sum,
                    "frame": frames.to_pandas(),
                }
            )

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


def encode_ppm(doc_ids, widths, heights) -> list[bytes]:
    """Deterministic binary P6 PPM payloads (the uncompressed portable
    pixmap format — magic, whitespace/comment header, maxval, raw RGB
    bytes). Pixel k of document d is (d*31 + 7k) mod 256, so a decoder
    and a byte-math oracle can both re-derive the image from the id
    alone. Every 5th document carries a '#' comment line to exercise
    the parser's comment handling."""
    out = []
    for d, w, h in zip(doc_ids, widths, heights):
        d, w, h = int(d), int(w), int(h)
        comment = b"# synthetic fixture\n" if d % 5 == 0 else b""
        header = b"P6\n" + comment + f"{w} {h}\n255\n".encode()
        n = w * h * 3
        px = ((d * 31 + 7 * np.arange(n, dtype=np.int64)) % 256).astype(np.uint8)
        out.append(header + px.tobytes())
    return out


def attach_ppm_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Multimodal table whose payload column holds REAL encoded image
    bytes (binary P6 PPM, encode_ppm) with dims derived from the doc
    id: width = id%64+1, height = id%48+1. Same output shape as
    attach_payload; built in one Arrow mapInPandas pass."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", META_TYPE),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype(np.int64).to_numpy()
            w = ids % 64 + 1
            h = ids % 48 + 1
            payloads = encode_ppm(ids, w, h)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": "image",
                    "payload": payloads,
                    "meta": [
                        {"width": int(wi), "height": int(hi),
                         "n_frames": 1, "sample_rate": 0}
                        for wi, hi in zip(w, h)
                    ],
                }
            )

    return df.select(F.col(id_col)).mapInPandas(build, schema)


def parse_ppm(buf: bytes):
    """Pure-NumPy decoder for binary P6 PPM (no PIL): magic, then
    width/height/maxval tokens separated by whitespace with '#'
    comments running to end-of-line, ONE whitespace byte, then
    width*height*3 raw bytes (maxval < 256). Returns
    (width, height, uint8 pixel array), or None for anything that is
    not a WELL-FORMED 8-bit P6 — including 'P6'-prefixed buffers with
    a truncated/garbled header, maxval >= 256, or a pixel buffer
    shorter than width*height*3 — so one corrupt payload falls
    through to the caller's next decoder instead of failing the
    whole Arrow batch."""
    if len(buf) < 2 or buf[:2] != b"P6":
        return None
    pos, vals = 2, []
    n = len(buf)
    while len(vals) < 3:
        while pos < n and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < n and buf[pos] == 0x23:  # '#' comment to EOL
            while pos < n and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not buf[pos : pos + 1].isspace():
            pos += 1
        if pos == start:  # truncated header
            return None
        try:
            vals.append(int(buf[start:pos]))
        except ValueError:  # non-numeric header token
            return None
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        return None  # 16-bit PPM / degenerate dims: not our format
    count = w * h * 3
    if n - pos < count:  # truncated pixel buffer
        return None
    px = np.frombuffer(buf, dtype=np.uint8, count=count, offset=pos)
    return w, h, px


def decode_image(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id", meta_col: str = "meta") -> DataFrame:
    """Decode step, in fallback order per payload:

    1. binary P6 PPM -> REAL pure-NumPy decode (parse_ppm): parsed
       width/height from the header, exact mean pixel value
       (integer sum / count, bit-stable across engines),
       decoded_by='ppm'. Oracle-gated end to end (the driver's
       image_decode query re-derives header and pixels in DuckDB
       byte math).
    2. PIL, when importable, for any other format (absent offline).
    3. CLEARLY-MARKED deterministic fake: payload bytes tiled into
       the metadata (width, height), decoded_by='fake'.

    The Spark plumbing (schema, Arrow batching, partition
    preservation) is identical in every branch."""
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf, meta in zip(pdf[id_col], pdf[payload_col], pdf["_w_h"]):
                buf = bytes(buf)
                ppm = parse_ppm(buf)
                if ppm is not None:
                    w, h, px = ppm
                    mean = (
                        float(int(px.sum(dtype=np.int64)) / px.size)
                        if px.size
                        else 0.0
                    )
                    rows.append((int(i), w, h, mean, "ppm"))
                    continue
                w, h = int(meta[0]), int(meta[1])
                if have_pil:  # pragma: no cover
                    raise NotImplementedError(
                        "real codec path: wire PIL.Image.open here"
                    )
                # FAKE DECODE (deterministic): tile payload bytes into
                # the metadata raster shape.
                b = np.frombuffer(buf, dtype=np.uint8)
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


def resize_ppm(buf: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resample of one binary P6 PPM to
    (width, height), re-encoded as P6 — pure NumPy (row/col index
    maps r_src = (r_dst * src_h) // dst_h, the standard floor map).
    Returns None for non-PPM payloads."""
    parsed = parse_ppm(buf)
    if parsed is None:
        return None
    sw, sh, px = parsed
    img = px.reshape(sh, sw, 3)
    rows = (np.arange(height, dtype=np.int64) * sh) // height
    cols = (np.arange(width, dtype=np.int64) * sw) // width
    out = img[rows][:, cols]
    return f"P6\n{width} {height}\n255\n".encode() + out.tobytes()


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_image(df: DataFrame, width: int, height: int,
                 payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Resample image payloads to (width, height). Binary P6 PPM goes
    through the REAL pure-NumPy nearest-neighbor path (resize_ppm,
    oracle-gated end to end by the driver's image_resize query);
    any other format needs PIL, absent offline, so it raises the
    declared NotImplementedError. Output payloads are re-encoded P6."""
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                out = resize_ppm(bytes(buf), width, height)
                if out is None:
                    if have_pil:  # pragma: no cover
                        raise NotImplementedError(
                            "real codec path: wire PIL resampling here"
                        )
                    raise NotImplementedError(
                        "resize_image: non-PPM payload needs PIL/opencv "
                        "(not available offline)"
                    )
                ids.append(int(i))
                payloads.append(out)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        resize, _RESIZE_SCHEMA
    )
