"""Pure-numpy WAV (RIFF/WAVE) audio codec — no audio library.

Same spirit as ``imagecodec``/``videocodec``: the WAVE container and its
uncompressed sample formats are public specs decodable with ``struct`` +
numpy. Completes the multimodal trio (image/audio/video) with a REAL
decoder for every WAV shape that needs no codec library:

- integer PCM (tag 1): 8/16/32-bit → int32 samples
- IEEE float (tag 3): 32/64-bit → float64 samples
- G.711 A-law / µ-law (tags 6/7): 8-bit companded telephony audio,
  expanded to 16-bit linear via the ITU-T G.711 segment formulas
  (256-entry LUTs built from the spec arithmetic, not copied tables)
- WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE): resolved to the real format via
  the first two bytes of the SubFormat GUID in the fmt extension

Genuinely-compressed formats (ADPCM, MP3-in-WAV, …) raise
``NotImplementedError`` with the format tag — the plug-in point for a
codec library.

Encoders included so fixtures are spec-literal bytes; decode(encode(x))
== x for int16 PCM and float32, and decode(encode_g711(c)) equals the
G.711 expansion of the code stream exactly.
"""

from __future__ import annotations

import struct

import numpy as np


def _ulaw_table() -> np.ndarray:
    """G.711 µ-law code → 16-bit linear (the segment/mantissa expansion:
    invert, mantissa<<3 + bias 0x84, shift by segment, re-sign)."""
    u = 255 - np.arange(256, dtype=np.int32)  # ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int32)


def _alaw_table() -> np.ndarray:
    """G.711 A-law code → 16-bit linear (xor 0x55, segmented mantissa
    expansion; segment 0 is linear, higher segments shift)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int32)


_ULAW = _ulaw_table()
_ALAW = _alaw_table()

# format tags (RIFF spec / mmreg.h values — public constants)
_TAG_PCM, _TAG_FLOAT, _TAG_ALAW, _TAG_ULAW, _TAG_EXT = 1, 3, 6, 7, 0xFFFE


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """(n,) or (n, channels) int16 PCM → canonical 44-byte-header WAV."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _wav_container(fmt_body: bytes, data: bytes) -> bytes:
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_float(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """(n,) or (n, channels) float32 → IEEE-float WAV (format tag 3)."""
    s = np.asarray(samples, dtype=np.float32)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    block_align = ch * 4
    fmt = struct.pack(
        "<HHIIHH", _TAG_FLOAT, ch, sample_rate, sample_rate * block_align,
        block_align, 32,
    )
    return _wav_container(fmt, s.astype("<f4").tobytes())


def encode_wav_g711(
    codes: np.ndarray, law: str = "ulaw", sample_rate: int = 8000
) -> bytes:
    """(n,) or (n, channels) uint8 G.711 code stream → WAV with format
    tag 7 (µ-law) or 6 (A-law) — the telephony container shape. The payload IS
    the code bytes; expansion happens at decode."""
    tag = {"ulaw": _TAG_ULAW, "alaw": _TAG_ALAW}[law]
    c = np.asarray(codes, dtype=np.uint8)
    if c.ndim == 1:
        c = c[:, None]
    n, ch = c.shape
    fmt = struct.pack("<HHIIHH", tag, ch, sample_rate, sample_rate * ch, ch, 8)
    return _wav_container(fmt, c.tobytes())


def decode_wav(data: bytes) -> "tuple[dict, np.ndarray]":
    """WAV bytes → ({tag, channels, sample_rate, bits, n_samples},
    (n_samples, channels) samples). Integer PCM and G.711 decode to
    int32 (G.711 expanded to 16-bit linear); IEEE float decodes to
    float64. Compressed format tags raise with the tag named.
    WAVE_FORMAT_EXTENSIBLE resolves through its SubFormat GUID."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    pcm = None
    end = 8 + struct.unpack_from("<I", data, 4)[0]
    while pos + 8 <= min(end, len(data)):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", payload)
            if tag == _TAG_EXT and size >= 26:
                # fmt extension: cbSize(2) validBits(2) channelMask(4)
                # SubFormat GUID — first two LE bytes are the real tag
                (tag,) = struct.unpack_from("<H", payload, 24)
            fmt = {"tag": tag, "channels": ch, "sample_rate": rate, "bits": bits}
        elif cid == b"data":
            pcm = payload
        pos += 8 + size + (size % 2)
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    tag, bits = fmt["tag"], fmt["bits"]
    if tag == _TAG_PCM and bits in (8, 16, 32):
        if bits == 8:  # 8-bit WAV is unsigned, centered at 128
            arr = np.frombuffer(pcm, dtype=np.uint8).astype(np.int32) - 128
        elif bits == 16:
            arr = np.frombuffer(pcm, dtype="<i2").astype(np.int32)
        else:
            arr = np.frombuffer(pcm, dtype="<i4").astype(np.int32)
    elif tag == _TAG_FLOAT and bits in (32, 64):
        dt = "<f4" if bits == 32 else "<f8"
        arr = np.frombuffer(pcm, dtype=dt).astype(np.float64)
    elif tag in (_TAG_ALAW, _TAG_ULAW) and bits == 8:
        lut = _ALAW if tag == _TAG_ALAW else _ULAW
        arr = lut[np.frombuffer(pcm, dtype=np.uint8)]
    else:
        raise NotImplementedError(
            f"compressed WAV (format tag {tag}, {bits}-bit) — an audio "
            f"library plugs in here"
        )
    ch = fmt["channels"]
    n = arr.size // ch
    arr = arr[: n * ch].reshape(n, ch)
    meta = {
        "tag": tag,
        "channels": ch,
        "sample_rate": fmt["sample_rate"],
        "bits": bits,
        "n_samples": n,
    }
    return meta, arr
