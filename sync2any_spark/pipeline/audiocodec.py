"""Pure-numpy WAV (RIFF/WAVE) PCM audio codec — no audio library.

Same spirit as ``imagecodec``/``videocodec``: the WAVE container and
integer PCM are public specs decodable with ``struct`` + numpy. Completes
the multimodal trio (image/audio/video) with a REAL decoder for the one
audio format that needs no codec library: the 'fmt ' chunk is parsed for
(format, channels, sample rate, bit depth), the 'data' chunk decodes to an
(n_samples, channels) int32 array for 8/16/32-bit integer PCM. Compressed
formats (IEEE float, ADPCM, MP3-in-WAV, …) raise ``NotImplementedError``
with the format tag — the plug-in point for a codec library.

Encoder included so fixtures are spec-literal bytes; decode(encode(x)) == x
for int16 PCM.
"""

from __future__ import annotations

import struct

import numpy as np


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


def decode_wav(data: bytes) -> "tuple[dict, np.ndarray]":
    """WAV bytes → ({channels, sample_rate, bits, n_samples},
    (n_samples, channels) int32 array). Integer PCM only; other format
    tags raise with the tag named."""
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
            fmt = {"tag": tag, "channels": ch, "sample_rate": rate, "bits": bits}
        elif cid == b"data":
            pcm = payload
        pos += 8 + size + (size % 2)
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if fmt["tag"] != 1 or fmt["bits"] not in (8, 16, 32):
        raise NotImplementedError(
            f"non-integer-PCM WAV (format tag {fmt['tag']}, "
            f"{fmt['bits']}-bit) — an audio library plugs in here"
        )
    bits = fmt["bits"]
    if bits == 8:  # 8-bit WAV is unsigned, centered at 128
        arr = np.frombuffer(pcm, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        arr = np.frombuffer(pcm, dtype="<i2").astype(np.int32)
    else:
        arr = np.frombuffer(pcm, dtype="<i4").astype(np.int32)
    ch = fmt["channels"]
    n = arr.size // ch
    arr = arr[: n * ch].reshape(n, ch)
    meta = {
        "channels": ch,
        "sample_rate": fmt["sample_rate"],
        "bits": bits,
        "n_samples": n,
    }
    return meta, arr
