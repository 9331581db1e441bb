"""Pure-numpy/stdlib image codecs — the real decoder behind decode_images.

No Pillow/libvips/ffmpeg exists in this environment, but three formats are
decodable from first principles with nothing beyond numpy and ``zlib``:

- **BMP** (Windows bitmap, BITMAPINFOHEADER, uncompressed BI_RGB, 8/24/32
  bpp, bottom-up or top-down) — the format spec is a fixed-layout header +
  raw BGR(A) rows padded to 4 bytes.
- **PPM/PGM** (netpbm P6/P5, maxval ≤ 255) — ASCII header + raw bytes.
- **PNG** (non-interlaced, 8-bit gray/RGB/RGBA/gray+alpha) — zlib inflate
  of IDAT + per-scanline unfilter (filters 0–4 per the PNG spec).

``decode_image`` dispatches on magic bytes and returns an (H, W, C) uint8
array. ``encode_bmp`` exists so pipelines (and the contract fixture) can
synthesize deterministic images without any external library; tests also
hand-assemble spec-literal BMP/PNG bytes so the decoder is validated
against the public format specs, not against our own encoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed bottom-up BMP bytes."""
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_bmp expects (H, W, 3) RGB")
    stride = (w * 3 + 3) & ~3
    img_size = stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = arr[:, :, ::-1]  # BMP stores BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + rows[::-1].tobytes()  # bottom-up row order


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed BI_RGB BMP (8/24/32 bpp) → (H, W, C) uint8 (RGB order)."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h_raw = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    top_down = h_raw < 0
    h = abs(h_raw)
    if bpp not in (8, 24, 32):
        raise ValueError(f"{bpp} bpp not supported")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * nch]
    if not top_down:
        rows = rows[::-1]
    if nch == 1:
        return rows.reshape(h, w, 1).copy()
    px = rows.reshape(h, w, nch)
    rgb = px[:, :, 2::-1]  # BGR(A) → RGB
    if nch == 4:
        return np.concatenate([rgb, px[:, :, 3:4]], axis=2).copy()
    return rgb.copy()


def decode_ppm(b: bytes) -> np.ndarray:
    """netpbm P6 (RGB) / P5 (gray), maxval ≤ 255 → (H, W, C) uint8."""
    if b[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    nch = 3 if b[:2] == b"P6" else 1
    # header: magic, width, height, maxval — whitespace/comment separated
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        fields.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    raw = np.frombuffer(b, dtype=np.uint8, count=w * h * nch, offset=i)
    return raw.reshape(h, w, nch).copy()


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(b: bytes) -> np.ndarray:
    """Non-interlaced 8-bit PNG (gray / RGB / gray+alpha / RGBA) →
    (H, W, C) uint8. Full spec-conformant unfilter (types 0–4)."""
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(b):
        length, ctype = struct.unpack_from(">I4s", b, pos)
        body = b[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError("only 8-bit PNG supported")
            if color not in _PNG_CHANNELS:
                raise ValueError("palette PNG not supported")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            nch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * nch
    lines = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(lines[y, 0])
        cur = lines[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = cur
        elif ftype == 2:  # Up
            rec = (cur + prior) & 0xFF
        else:
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - nch] if x >= nch else 0
                bb = prior[x]
                if ftype == 1:  # Sub
                    rec[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:  # Average
                    rec[x] = (cur[x] + ((a + bb) >> 1)) & 0xFF
                elif ftype == 4:  # Paeth
                    cc = prior[x - nch] if x >= nch else 0
                    p = a + bb - cc
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else cc)
                    rec[x] = (cur[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, nch).copy()


def decode_image(b: bytes) -> np.ndarray:
    """Magic-dispatch decode → (H, W, C) uint8."""
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(b)
    if b[:2] in (b"P6", b"P5"):
        return decode_ppm(b)
    if b[:2] == b"\xff\xd8":
        from .jpegcodec import decode_jpeg

        img = decode_jpeg(b)
        return img if img.ndim == 3 else img[:, :, None]
    raise ValueError(f"unsupported image magic {b[:4]!r}")
