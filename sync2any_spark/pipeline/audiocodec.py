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
- IMA/DVI ADPCM (tag 0x11, mono): 4-bit adaptive-delta blocks expanded
  with the public IMA step/index tables, 'fact'-chunk trimming
- MS ADPCM (tag 0x02, mono): 7-coefficient predictor blocks with
  adaptive delta per the public MS specification
- WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE): resolved to the real format via
  the first two bytes of the SubFormat GUID in the fmt extension

Formats that genuinely need a codec library (MP3-in-WAV, …) raise
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
    int32 (G.711 expanded to 16-bit linear; IMA ADPCM through the
    adaptive-delta recurrence); IEEE float decodes to float64. Remaining
    compressed format tags raise with the tag named.
    WAVE_FORMAT_EXTENSIBLE resolves through its SubFormat GUID."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    pcm = None
    fact_samples = None
    end = 8 + struct.unpack_from("<I", data, 4)[0]
    while pos + 8 <= min(end, len(data)):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, ch, rate, _br, ba, bits = struct.unpack_from("<HHIIHH", payload)
            if tag == _TAG_EXT and size >= 26:
                # fmt extension: cbSize(2) validBits(2) channelMask(4)
                # SubFormat GUID — first two LE bytes are the real tag
                (tag,) = struct.unpack_from("<H", payload, 24)
            fmt = {
                "tag": tag, "channels": ch, "sample_rate": rate,
                "bits": bits, "block_align": ba,
            }
            if tag == 0x11 and size >= 20:  # wSamplesPerBlock extension
                (fmt["samples_per_block"],) = struct.unpack_from(
                    "<H", payload, 18
                )
        elif cid == b"fact":
            (fact_samples,) = struct.unpack_from("<I", payload, 0)
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
    elif tag == 0x11 and bits == 4 and fmt["channels"] == 1:
        spb = fmt.get(
            "samples_per_block", (fmt["block_align"] - 4) * 2 + 1
        )
        arr = decode_ima_adpcm(pcm, fmt["block_align"], spb)
        if fact_samples is not None:
            arr = arr[:fact_samples]  # trim last-block padding
    elif tag == 0x02 and bits == 4 and fmt["channels"] == 1:
        arr = decode_ms_adpcm(pcm, fmt["block_align"])
        if fact_samples is not None:
            arr = arr[:fact_samples]
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


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAV format tag 0x11) — the dominant compressed-WAV codec
# ---------------------------------------------------------------------------

# step-size table (89 entries) and index-adjust table from the public
# IMA ADPCM specification (DVI/IMA "Recommended Practices for Enhancing
# Digital Audio Compatibility", also RFC 3551 §4.5.1)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)

_TAG_IMA_ADPCM = 0x11


def _ima_decode_nibbles(codes, pred: int, index: int):
    """Decode a stream of 4-bit IMA codes given the block-header seed
    (predictor, step index). The recurrence is data-dependent, so it
    stays a Python loop — blocks are short (spec: ~505 samples) and
    independent, which is also what makes the format seekable."""
    out = np.empty(len(codes), dtype=np.int32)
    steps = _IMA_STEPS
    adj = _IMA_INDEX_ADJ
    for i, code in enumerate(codes):
        step = int(steps[index])
        diff = step >> 3
        if code & 4:
            diff += step
        if code & 2:
            diff += step >> 1
        if code & 1:
            diff += step >> 2
        pred = pred - diff if code & 8 else pred + diff
        pred = -32768 if pred < -32768 else (32767 if pred > 32767 else pred)
        out[i] = pred
        index += int(adj[code & 7])
        index = 0 if index < 0 else (88 if index > 88 else index)
    return out, pred, index


def decode_ima_adpcm(
    data: bytes, block_align: int, samples_per_block: int
) -> np.ndarray:
    """Mono IMA-ADPCM 'data' payload → int32 samples. Each block: 4-byte
    header (int16 predictor, uint8 step index, reserved) + 4-bit codes,
    low nibble first; the header sample IS the first output sample."""
    out = []
    for off in range(0, len(data) - 3, block_align):
        block = data[off : off + block_align]
        if len(block) < 4:
            break
        pred = struct.unpack_from("<h", block, 0)[0]
        index = block[2]
        if index > 88:
            raise ValueError("corrupt IMA ADPCM block (step index > 88)")
        nib_bytes = np.frombuffer(block[4:], dtype=np.uint8)
        codes = np.empty(nib_bytes.size * 2, dtype=np.uint8)
        codes[0::2] = nib_bytes & 0x0F
        codes[1::2] = nib_bytes >> 4
        want = samples_per_block - 1  # header carries sample 0
        dec, _, _ = _ima_decode_nibbles(codes[:want].tolist(), pred, index)
        out.append(np.concatenate([[np.int32(pred)], dec]))
    if not out:
        return np.empty(0, dtype=np.int32)
    return np.concatenate(out).astype(np.int32)


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int = 8000, block_align: int = 256
) -> bytes:
    """Mono int16 PCM → IMA-ADPCM WAV (tag 0x11) with the standard
    quantize-and-track encoder: the encoder runs the SAME predictor
    recurrence as the decoder, so decode(encode(x)) equals the encoder's
    own reconstruction bit-for-bit (ADPCM is lossy vs x, deterministic vs
    the tracked prediction)."""
    s = np.asarray(samples, dtype=np.int16).ravel().astype(np.int64)
    spb = (block_align - 4) * 2 + 1
    pred, index = 0, 0
    blocks = []
    i = 0
    while i < s.size:
        chunk = s[i : i + spb]
        i += spb
        pred = int(chunk[0])
        hdr = struct.pack("<hBB", pred, index, 0)
        codes = []
        for x in chunk[1:]:
            step = int(_IMA_STEPS[index])
            diff = int(x) - pred
            code = 0
            if diff < 0:
                code = 8
                diff = -diff
            if diff >= step:
                code |= 4
                diff -= step
            if diff >= step >> 1:
                code |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                code |= 1
            codes.append(code)
            dec, pred, index = _ima_decode_nibbles([code], pred, index)
            pred = int(dec[0])
        # pad odd nibble counts with zero codes (decoder trims by
        # samples_per_block)
        if len(codes) % 2:
            codes.append(0)
        # pack: low nibble first
        nb = bytearray()
        for j in range(0, len(codes), 2):
            nb.append((codes[j + 1] << 4) | codes[j])
        body = hdr + bytes(nb)
        body += b"\x00" * (block_align - len(body))
        blocks.append(body)
    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHH", _TAG_IMA_ADPCM, 1, sample_rate,
        sample_rate * block_align // spb, block_align, 4,
    ) + struct.pack("<HH", 2, spb)  # cbSize=2, wSamplesPerBlock
    # 'fact' chunk: total decoded sample count — required for compressed
    # formats (the last block may be padding-filled past the real end)
    fact = b"fact" + struct.pack("<II", 4, s.size)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + fact
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# MS ADPCM (WAV format tag 0x02) — the other Windows-era compressed WAV
# ---------------------------------------------------------------------------

# the 7 built-in predictor coefficient pairs and the delta adaptation
# table from the public MS ADPCM specification (Multimedia Programming
# Interface and Data Specifications / mmreg)
_MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
             (460, -208), (392, -232)]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]
_TAG_MS_ADPCM = 0x02


def _ms_clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def decode_ms_adpcm(data: bytes, block_align: int) -> np.ndarray:
    """Mono MS-ADPCM 'data' payload → int32 samples. Each block: 7-byte
    header (predictor index, int16 initial delta, int16 sample1, int16
    sample2) then 4-bit signed codes, HIGH nibble first; the two header
    samples are emitted verbatim (oldest first) before the coded ones."""
    out = []
    for off in range(0, len(data) - 6, block_align):
        block = data[off : off + block_align]
        if len(block) < 7:
            break
        pidx = block[0]
        if pidx >= len(_MS_COEFS):
            raise ValueError("corrupt MS ADPCM block (predictor index)")
        c1, c2 = _MS_COEFS[pidx]
        delta, s1, s2 = struct.unpack_from("<hhh", block, 1)
        samples = [s2, s1]
        for byte in block[7:]:
            for code in ((byte >> 4), (byte & 0x0F)):
                signed = code - 16 if code >= 8 else code
                pred = (s1 * c1 + s2 * c2) >> 8
                s = _ms_clamp16(pred + signed * delta)
                samples.append(s)
                s2, s1 = s1, s
                delta = max(16, (_MS_ADAPT[code] * delta) >> 8)
        out.append(np.array(samples, dtype=np.int32))
    if not out:
        return np.empty(0, dtype=np.int32)
    return np.concatenate(out)


def encode_wav_ms_adpcm(
    samples: np.ndarray, sample_rate: int = 8000, block_align: int = 256,
    predictor: int = 0, initial_delta: int = 32,
) -> bytes:
    """Mono int16 PCM → MS-ADPCM WAV (tag 0x02), fixed predictor pair,
    tracked-prediction encoder: the encoder runs the decoder's exact
    recurrence, so decode(encode(x)) equals the tracked reconstruction
    bit-for-bit; the two header samples per block are verbatim."""
    s = np.asarray(samples, dtype=np.int16).ravel().astype(np.int64)
    spb = (block_align - 7) * 2 + 2
    c1, c2 = _MS_COEFS[predictor]
    blocks = []
    total = 0
    i = 0
    while i < s.size:
        chunk = s[i : i + spb]
        i += spb
        s2 = int(chunk[0])
        s1 = int(chunk[1]) if chunk.size > 1 else 0
        delta = initial_delta
        hdr = bytes([predictor]) + struct.pack("<hhh", delta, s1, s2)
        codes = []
        for x in chunk[2:]:
            pred = (s1 * c1 + s2 * c2) >> 8
            q = (int(x) - pred) // max(delta, 1)
            q = -8 if q < -8 else (7 if q > 7 else q)
            code = q + 16 if q < 0 else q
            dec = _ms_clamp16(pred + q * delta)
            codes.append(code)
            s2, s1 = s1, dec
            delta = max(16, (_MS_ADAPT[code] * delta) >> 8)
        if len(codes) % 2:
            codes.append(0)
        nb = bytes(
            (codes[j] << 4) | codes[j + 1] for j in range(0, len(codes), 2)
        )
        body = hdr + nb
        body += b"\x00" * (block_align - len(body))
        blocks.append(body)
        total += chunk.size
    data = b"".join(blocks)
    # fmt extension: cbSize (2+2+7*4 = 32), wSamplesPerBlock, wNumCoef,
    # 7 coefficient pairs
    ext = struct.pack("<HHH", 32, spb, len(_MS_COEFS))
    for a, b in _MS_COEFS:
        ext += struct.pack("<hh", a, b)
    fmt = struct.pack(
        "<HHIIHH", _TAG_MS_ADPCM, 1, sample_rate,
        sample_rate * block_align // spb, block_align, 4,
    ) + ext
    fact = b"fact" + struct.pack("<II", 4, total)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + fact
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
