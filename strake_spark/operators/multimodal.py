"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at scale: the payload is an opaque
``binary`` column (or a reference to object storage), metadata is typed
columns, and decode/feature-extraction runs as Arrow-batched pandas
iterators (``mapInPandas``) so the heavy bytes never cross a row-at-a-
time Python boundary.

The container has no image/audio libraries, so the actual decode step
is STUBBED: ``decode_features`` computes a deterministic byte-histogram
"feature vector" standing in for a real decoder, and ``decode_image``
raises NotImplementedError with the integration point documented. The
Spark-side plumbing — schema, batching, UDF signature, partition
behavior — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
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
                counts = [0] * FEATURE_BINS
                for byte in b:
                    counts[byte % FEATURE_BINS] += 1
                total = max(len(b), 1)
                rows.append(
                    {
                        id_col: doc_id,
                        "n_bytes": len(b),
                        "features": [c / total for c in counts],
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "n_bytes", "features"])

    return docs_with_payload.mapInPandas(extract, schema=FEATURES_SCHEMA)


def decode_image(payload_df: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Real image decode (resize / frame-sample) integration point.

    Requires an imaging library (Pillow / torchvision / ffmpeg) on the
    executors; not present in this container. The implementation shape
    is identical to decode_features: mapInPandas over the binary column,
    emitting fixed-shape tensors as array columns.
    """
    raise NotImplementedError(
        "image decode requires an imaging library on executors; "
        "wire it into decode_features()'s mapInPandas pattern"
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


def resize_images(payload_df: DataFrame, width: int, height: int) -> DataFrame:  # pragma: no cover - stub
    """Image resize integration point (same gate as decode_image):
    requires Pillow/torchvision on executors; wire into the
    decode_features mapInPandas pattern emitting fixed-shape tensors."""
    raise NotImplementedError(
        "image resize requires an imaging library on executors; "
        "wire it into decode_features()'s mapInPandas pattern"
    )
