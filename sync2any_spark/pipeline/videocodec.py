"""Pure-numpy AVI (RIFF) video container codec — no ffmpeg.

Same spirit as ``imagecodec``: the AVI/RIFF container layout and the
uncompressed DIB frame format are public specs (Microsoft "AVI RIFF File
Reference"), decodable with ``struct`` + numpy. This retires the video
frame-sampling stub (round-2 Missing #4) for the one codec that needs no
codec library: BI_RGB 24-bit device-independent bitmap frames (``'DIB '``
handler, ``00db`` chunks) — frames are stored exactly like BMP pixel
arrays: bottom-up rows, BGR order, rows padded to 4 bytes.

MJPEG streams (``'MJPG'`` handler, ``00dc`` chunks of baseline JPEG
frames) decode through the pure-numpy baseline JPEG codec
(``jpegcodec``); other compressed codecs (H.264, …) raise
``NotImplementedError`` with the handler name — honestly marking where a
real codec library plugs in. The container walk (headers, stream list,
movi chunks, idx1) is fully real in every case.

Encoder included so tests and fixtures are spec-literal bytes, not
library output; decode(encode(x)) == x is property-tested.
"""

from __future__ import annotations

import struct

import numpy as np


def _pad_row(w: int) -> int:
    return (w * 3 + 3) & ~3


def _dib_encode_frame(img: np.ndarray) -> bytes:
    """(H, W, 3) RGB uint8 → DIB pixel array: bottom-up, BGR, 4-byte rows."""
    h, w, _ = img.shape
    stride = _pad_row(w)
    out = np.zeros((h, stride), dtype=np.uint8)
    bgr = img[::-1, :, ::-1]  # bottom-up + RGB→BGR
    out[:, : w * 3] = bgr.reshape(h, w * 3)
    return out.tobytes()


def _dib_decode_frame(data: bytes, w: int, h: int) -> np.ndarray:
    stride = _pad_row(w)
    if len(data) < stride * h:
        raise ValueError(f"DIB frame truncated: {len(data)} < {stride * h}")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()  # back to top-down RGB


def encode_avi_raw(frames: "list[np.ndarray]", fps: int = 10) -> bytes:
    """Spec-conformant uncompressed AVI: RIFF('AVI ') → LIST('hdrl')
    [avih + LIST('strl')[strh 'vids'/'DIB ' + strf BITMAPINFOHEADER]] →
    LIST('movi')['00db' …] → 'idx1'."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, c = frames[0].shape
    if c != 3 or any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must be (H, W, 3)")
    n = len(frames)
    frame_bytes = [_dib_encode_frame(f) for f in frames]
    buf_size = max(len(b) for b in frame_bytes)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,        # dwMicroSecPerFrame
        buf_size * fps,          # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        n,                       # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        buf_size,                # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,        # dwWidth, dwHeight, dwReserved[4]
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIIi4H",
            0, 0, 0,             # flags, priority, language
            0,                   # initial frames
            1, fps,              # scale, rate → fps frames/sec
            0, n,                # start, length (frames)
            buf_size,            # suggested buffer
            0xFFFFFFFF & -1, 0,  # quality (-1 = default), sample size
            0, 0, w, h,          # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24,        # biSize, width, height, planes, bitcount
        0,                      # biCompression = BI_RGB
        _pad_row(w) * h,        # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"".join(chunk(b"00db", fb) for fb in frame_bytes)
    movi = lst(b"movi", movi_payload)
    # idx1: one entry per frame, offsets relative to the start of 'movi'
    idx_entries, off = [], 4
    for fb in frame_bytes:
        idx_entries.append(
            b"00db" + struct.pack("<III", 0x10, off, len(fb))  # AVIIF_KEYFRAME
        )
        off += 8 + len(fb) + (len(fb) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avi_mjpeg(
    jpeg_frames: "list[bytes]", width: int, height: int, fps: int = 10
) -> bytes:
    """Spec-conformant MJPEG AVI: same container as ``encode_avi_raw`` but
    handler 'MJPG', ``biCompression = 'MJPG'`` and ``00dc`` chunks whose
    payloads are complete baseline JPEG images (e.g. from
    ``jpegcodec.encode_jpeg_blocks``)."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")
    n = len(jpeg_frames)
    buf_size = max(len(b) for b in jpeg_frames)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, buf_size * fps, 0, 0x10, n, 0, 1,
        buf_size, width, height, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIi4H", 0, 0, 0, 0, 1, fps, 0, n, buf_size,
        0xFFFFFFFF & -1, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24,
        struct.unpack("<I", b"MJPG")[0],  # biCompression = 'MJPG'
        0, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", fb) for fb in jpeg_frames))
    idx_entries, off = [], 4
    for fb in jpeg_frames:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(fb)))
        off += 8 + len(fb) + (len(fb) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) over a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)  # chunks are word-aligned


def parse_avi(data: bytes) -> dict:
    """Container walk → {width, height, n_frames, handler, fps,
    frame_spans: [(start, size)]}. Raises ValueError on a non-AVI payload
    and NotImplementedError for compressed streams (handler != DIB/RGB)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    bitcount = compression = None
    handler = b""
    fps = 0
    frame_spans: list[tuple[int, int]] = []

    def walk_list(start: int, end: int) -> None:
        nonlocal width, height, bitcount, compression, handler, fps
        for fourcc, p, size in _walk_chunks(data, start, end):
            if fourcc == b"LIST":
                walk_list(p + 4, p + size)
            elif fourcc == b"strh":
                handler = data[p + 4 : p + 8]
                scale, rate = struct.unpack_from("<II", data, p + 20)
                fps = rate // scale if scale else 0
            elif fourcc == b"strf":
                (_, w_, h_, _, bc, comp) = struct.unpack_from("<IiiHHI", data, p)
                width, height, bitcount, compression = w_, abs(h_), bc, comp
            elif fourcc in (b"00db", b"00dc"):
                frame_spans.append((p, size))

    walk_list(12, 12 + struct.unpack_from("<I", data, 4)[0] - 4)
    if width is None:
        raise ValueError("no video stream format (strf) found")
    mjpg_fourcc = struct.unpack("<I", b"MJPG")[0]
    if handler == b"MJPG" or compression == mjpg_fourcc:
        codec = "MJPG"
    elif (
        handler in (b"DIB ", b"RGB ", b"\x00\x00\x00\x00")
        and compression in (0, None)
        and bitcount == 24
    ):
        codec = "DIB"
    else:
        raise NotImplementedError(
            f"compressed AVI stream (handler={handler!r}, "
            f"biCompression={compression}, bitcount={bitcount}) — a codec "
            f"library (e.g. ffmpeg) plugs in here; uncompressed DIB and "
            f"baseline MJPEG decode without one"
        )
    return {
        "width": int(width),
        "height": int(height),
        "n_frames": len(frame_spans),
        "handler": handler.decode("ascii", "replace").strip(),
        "codec": codec,
        "fps": int(fps),
        "frame_spans": frame_spans,
    }


def decode_avi_frames(
    data: bytes, every_n: int = 1
) -> "tuple[dict, list[tuple[int, np.ndarray]]]":
    """(container meta, [(frame_idx, RGB (H,W,3) uint8)]) sampling every
    ``every_n``-th frame — the frame-sample operator's core."""
    meta = parse_avi(data)
    w, h = meta["width"], meta["height"]
    out = []
    for idx, (start, size) in enumerate(meta["frame_spans"]):
        if idx % every_n:
            continue
        payload = data[start : start + size]
        if meta["codec"] == "MJPG":
            from .jpegcodec import decode_jpeg

            img = decode_jpeg(payload)
            if img.ndim == 2:  # grayscale MJPEG → uniform (H, W, 3)
                img = np.repeat(img[:, :, None], 3, axis=2)
        else:
            img = _dib_decode_frame(payload, w, h)
        out.append((idx, img))
    return meta, out
