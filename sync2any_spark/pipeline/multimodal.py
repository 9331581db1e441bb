"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with typed metadata structs;
the Spark-side plumbing (schemas, Arrow batch shapes, ``mapInPandas``
signatures, partitioning) is real and tested, while the actual codec step is
STUBBED — the decode libraries (Pillow/ffmpeg/…) are not in this container.
``decode_images(..., fake=True)`` substitutes a deterministic md5-derived
decode so the pipeline shape can be exercised end-to-end; ``fake=False``
raises ``NotImplementedError`` at the exact point a real decoder plugs in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

DECODED_SCHEMA = (
    "doc_id long, width int, height int, channels int, n_bytes long, "
    "features array<float>"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string, n_bytes long"


def attach_blob(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Derive a deterministic fake payload column (utf-8 bytes of the text).
    In production this is the real image/audio bytes column; every operator
    below only sees ``binary`` + metadata, so nothing changes."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("blob"),
        F.lit("image/fake").alias("mime"),
    )


def blob_metadata(blobs: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, blob_md5, magic) — pure JVM metadata extraction."""
    return blobs.select(
        "doc_id",
        F.octet_length("blob").cast("long").alias("n_bytes"),
        F.md5("blob").alias("blob_md5"),
        F.hex(F.substring("blob", 1, 4)).alias("magic"),
    )


def decode_images(blobs: DataFrame, batch_features: int = 8, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batch iterator —
    the shape a real vectorized decoder uses: one pandas batch in, one
    typed batch out, never row-at-a-time)."""

    def run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires Pillow/libvips — plug the "
                    "decoder in here; the Spark plumbing is complete"
                )
            n = len(pdf)
            widths = np.empty(n, dtype=np.int32)
            heights = np.empty(n, dtype=np.int32)
            nbytes = np.empty(n, dtype=np.int64)
            feats = []
            for i, blob in enumerate(pdf["blob"]):
                b = bytes(blob)
                digest = hashlib.md5(b).digest()
                widths[i] = 16 + digest[0]  # deterministic fake decode
                heights[i] = 16 + digest[1]
                nbytes[i] = len(b)
                arr = np.frombuffer(b, dtype=np.uint8)
                if arr.size == 0:
                    feats.append(np.zeros(batch_features, dtype=np.float32))
                else:
                    hist, _ = np.histogram(
                        arr, bins=batch_features, range=(0, 256)
                    )
                    feats.append((hist / arr.size).astype(np.float32))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "width": widths,
                    "height": heights,
                    "channels": np.full(n, 3, dtype=np.int32),
                    "n_bytes": nbytes,
                    "features": feats,
                }
            )

    return blobs.mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(blobs: DataFrame, every_n_bytes: int = 64, fake: bool = True) -> DataFrame:
    """Video frame-sampling stub: one output row per sampled 'frame'
    (byte-stride slices of the payload in the fake decode)."""

    def run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg — plug it in here"
                )
            out_id, out_idx, out_md5, out_n = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                for f_idx, start in enumerate(range(0, len(b), every_n_bytes)):
                    frame = b[start : start + every_n_bytes]
                    out_id.append(doc_id)
                    out_idx.append(f_idx)
                    out_md5.append(hashlib.md5(frame).hexdigest())
                    out_n.append(len(frame))
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(out_id, dtype=np.int64),
                    "frame_idx": np.asarray(out_idx, dtype=np.int32),
                    "frame_md5": out_md5,
                    "n_bytes": np.asarray(out_n, dtype=np.int64),
                }
            )

    return blobs.mapInPandas(run, schema=FRAME_SCHEMA)
