"""Pure-numpy baseline JPEG codec — the MJPEG plug-in, no libjpeg.

Decoder: baseline sequential DCT JPEG (ITU-T T.81) — marker parse
(DQT/SOF0/DHT/DRI/SOS), canonical Huffman decode with DC prediction,
restart-marker handling (byte realign + predictor reset every DRI
interval), 0xFF00 byte-unstuffing, de-zigzag, dequantization, 8×8 IDCT
(exact DCT-III matrix form), level shift, nearest-neighbor chroma
upsampling, and JFIF YCbCr→RGB for 3-component scans. Sampling factors 1
and 2 (grayscale, 4:4:4, 4:2:2, 4:2:0 — everything MJPEG cameras emit);
progressive (SOF2) and arithmetic-coded streams raise by marker.

Encoder: a RESTRICTED exact encoder for test fixtures — images constant
per 8×8 block, quantization tables of all ones, standard Annex K Huffman
tables. Such blocks carry only a DC coefficient, and with Q=1 the
DC→IDCT→level-shift path is exact for integer samples, so
``decode(encode(x)) == x`` bit-for-bit: the fixture exercises the full
real bitstream (markers, canonical Huffman, DC prediction across blocks,
amplitude categories, byte stuffing) with a closed-form expected output.

The Huffman decode is LUT-driven (round 4): each DHT table becomes a
2^16-entry table mapping the next 16 bits to (code length, symbol) — one
list lookup per symbol instead of a per-bit tree walk — and the bit
cursor reads through precomputed 32-bit windows (numpy builds them
vectorized, the scan walks them as native ints). The walk itself stays
sequential Python because JPEG entropy decode is data-dependent
(coefficient counts steer the cursor), but per-symbol cost drops ~10×;
a production deployment can still swap in libjpeg/ffmpeg at the
``NotImplementedError`` plug-in points for non-baseline streams.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# standard Huffman tables (T.81 Annex K): (counts per code length 1..16, symbols)
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(counts, symbols):
    """symbol → (code, length) under canonical Huffman assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_LUT_CACHE: "dict[bytes, list]" = {}


def _decode_lut(counts, symbols):
    """2^16-entry decode LUT: index = the next 16 scan bits, value =
    ``(code_length << 8) | symbol`` (0 = no code has this prefix). Every
    code of length L owns a 2^(16−L) slice of the table, so one lookup
    replaces the per-bit canonical-tree walk. Cached by table content —
    MJPEG streams repeat the same four DHT tables every frame."""
    key = bytes(counts) + bytes(symbols)
    got = _LUT_CACHE.get(key)
    if got is not None:
        return got
    lut = np.zeros(1 << 16, dtype=np.uint16)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            base = code << (16 - length)
            lut[base : base + (1 << (16 - length))] = (length << 8) | symbols[k]
            code += 1
            k += 1
        code <<= 1
    out = lut.tolist()  # native ints: list indexing beats numpy scalars
    _LUT_CACHE[key] = out
    return out


_IDCT_M = None


def _idct_matrix() -> np.ndarray:
    global _IDCT_M
    if _IDCT_M is None:
        u = np.arange(8)
        x = np.arange(8)
        c = np.where(u == 0, 1.0 / np.sqrt(2.0), 1.0)
        _IDCT_M = 0.5 * c[:, None] * np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16)
    return _IDCT_M


class _BitReader:
    def __init__(self, data: bytes) -> None:
        # un-stuff 0xFF00 → 0xFF (restart markers 0xFFD0-D7 are untouched
        # and consumed explicitly via skip_restart)
        self.data = data.replace(b"\xff\x00", b"\xff")
        self.pos = 0  # bit position
        self.nbits = len(self.data) * 8
        # 32-bit big-endian window at every byte offset (zero-padded tail),
        # built vectorized once; peek16 then needs one index + one shift
        b = np.concatenate(
            [np.frombuffer(self.data, dtype=np.uint8), np.zeros(4, np.uint8)]
        ).astype(np.uint32)
        self.words = (
            (b[:-3] << 24) | (b[1:-2] << 16) | (b[2:-1] << 8) | b[3:]
        ).tolist()

    def skip_restart(self) -> None:
        """Byte-align and consume one RSTn marker (T.81 E.1.4: entropy
        segments are padded to a byte boundary before each restart)."""
        self.pos = (self.pos + 7) & ~7
        i = self.pos >> 3
        if i + 1 >= len(self.data):
            raise ValueError("truncated JPEG scan")
        if not (self.data[i] == 0xFF and 0xD0 <= self.data[i + 1] <= 0xD7):
            raise ValueError(
                f"expected restart marker at byte {i}, found "
                f"{self.data[i:i + 2]!r}"
            )
        self.pos += 16


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W) uint8 (grayscale) or (H, W, 3) uint8 (RGB)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], list] = {}  # (class, id) → decode LUT
    frame = None
    scan_comps = None
    scan_data = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG stream (segment length cut off)")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if pos + seglen > len(data):
            raise ValueError("truncated JPEG stream (segment body cut off)")
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                qt[tq] = vals
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}) — libjpeg "
                f"plugs in here; MJPEG streams are baseline"
            )
        elif marker == 0xDD:  # DRI — restart interval in MCUs
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + n])
                if len(counts) < 16 or len(symbols) < n:
                    raise ValueError("malformed DHT segment (symbols cut off)")
                huff[(tc, th)] = _decode_lut(counts, symbols)
                p += 17 + n
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append({"id": cs, "dc": tables >> 4, "ac": tables & 0xF})
            # entropy-coded data runs until the next non-RST marker
            p = pos + seglen
            q = p
            while q + 1 < len(data):
                if data[q] == 0xFF and data[q + 1] not in (0x00,) and not (
                    0xD0 <= data[q + 1] <= 0xD7
                ):
                    break
                q += 1
            scan_data = data[p:q]
            pos = q
            continue
        pos += seglen
    if frame is None or scan_data is None:
        raise ValueError("missing SOF/SOS")
    comps = frame["comps"]
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        f = [(c["h"], c["v"]) for c in comps]
        raise NotImplementedError(f"sampling factors {f} — 1 and 2 supported")

    h, w = frame["h"], frame["w"]
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcux = (w + 8 * max_h - 1) // (8 * max_h)
    mcuy = (h + 8 * max_v - 1) // (8 * max_v)
    by_id = {c["id"]: c for c in comps}
    pred = {c["id"]: 0 for c in comps}
    r = _BitReader(scan_data)

    # SCAN phase: sequential entropy decode — data-dependent, so it stays
    # Python, but fully INLINED: the bit cursor is a local int over the
    # precomputed 32-bit windows, each Huffman symbol is one LUT lookup,
    # and only the NONZERO coefficients are kept as (block, zigzag-k,
    # value) triplets per component. All numeric work (dequant, IDCT,
    # placement) happens vectorized over whole components afterwards.
    words = r.words
    nbits = r.nbits
    pos = 0
    tri = {c["id"]: ([], [], []) for c in comps}  # (block, zigzag k, value)
    nblk = {c["id"]: 0 for c in comps}
    sched = [
        (
            by_id[sc["id"]]["id"],
            by_id[sc["id"]]["v"] * by_id[sc["id"]]["h"],
            huff[(0, sc["dc"])],
            huff[(1, sc["ac"])],
        )
        for sc in scan_comps
    ]
    for mcu in range(mcuy * mcux):
        if restart_interval and mcu and mcu % restart_interval == 0:
            r.pos = pos
            r.skip_restart()
            pos = r.pos
            for cid in pred:
                pred[cid] = 0
        for cid, units, dc_lut, ac_lut in sched:
            bis, ks, vs = tri[cid]
            # h×v data units per MCU, raster order (T.81 A.2.3)
            for _ in range(units):
                bi = nblk[cid]
                nblk[cid] = bi + 1
                if pos >= nbits:
                    raise ValueError("truncated JPEG scan")
                v = dc_lut[(words[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF]
                if v == 0:
                    raise ValueError("invalid Huffman code in scan")
                pos += v >> 8
                s = v & 0xFF
                if pos + s > nbits:
                    raise ValueError("truncated JPEG scan")
                if s:
                    amp = (words[pos >> 3] >> (32 - (pos & 7) - s)) & (
                        (1 << s) - 1
                    )
                    pos += s
                    pred[cid] += (
                        amp if amp >= 1 << (s - 1) else amp - (1 << s) + 1
                    )
                bis.append(bi)
                ks.append(0)
                vs.append(pred[cid])
                k = 1
                while k < 64:
                    if pos >= nbits:
                        raise ValueError("truncated JPEG scan")
                    v = ac_lut[(words[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF]
                    if v == 0:
                        raise ValueError("invalid Huffman code in scan")
                    pos += v >> 8
                    rs = v & 0xFF
                    if rs == 0x00:  # EOB
                        if pos > nbits:
                            raise ValueError("truncated JPEG scan")
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    ss = rs & 0xF
                    if pos + ss > nbits:
                        raise ValueError("truncated JPEG scan")
                    if k > 63:
                        raise ValueError("coefficient run overflow in scan")
                    amp = (words[pos >> 3] >> (32 - (pos & 7) - ss)) & (
                        (1 << ss) - 1
                    )
                    pos += ss
                    bis.append(bi)
                    ks.append(k)
                    vs.append(
                        amp if amp >= 1 << (ss - 1) else amp - (1 << ss) + 1
                    )
                    k += 1

    # VECTOR phase: per component, one sparse scatter does de-zigzag AND
    # dequantization, then a batched 8×8 IDCT and one reshape/transpose
    # lands every block in its plane position
    m = _idct_matrix()
    outs = []
    for c in comps:
        cv, chh = c["v"], c["h"]
        bis, ks, vs = tri[c["id"]]
        ka = np.array(ks, dtype=np.int64)
        dq = np.zeros((nblk[c["id"]], 64), dtype=np.float64)
        dq[np.array(bis, dtype=np.int64), ZIGZAG[ka]] = (
            np.array(vs, dtype=np.float64) * qt[c["tq"]][ka]
        )
        sp = dq.reshape(-1, 8, 8)
        px = (m.T @ sp @ m) + 128.0  # batched 8×8 IDCT (matmul broadcasts)
        # (my, mx, bv, bh, y, x) → rows (my, bv, y), cols (mx, bh, x)
        p = (
            px.reshape(mcuy, mcux, cv, chh, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * cv * 8, mcux * chh * 8)
        )
        if chh < max_h or cv < max_v:  # nearest-neighbor upsample
            p = np.repeat(np.repeat(p, max_v // cv, axis=0), max_h // chh, axis=1)
        outs.append(p[:h, :w])
    if len(outs) == 1:
        return np.clip(np.rint(outs[0]), 0, 255).astype(np.uint8)
    y, cb, cr = outs
    rr = y + 1.402 * (cr - 128.0)
    gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bb = y + 1.772 * (cb - 128.0)
    rgb = np.stack([rr, gg, bb], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# restricted exact encoder (test fixtures): block-constant images, Q = 1
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.bytes.append(self.acc)
                if self.acc == 0xFF:
                    self.bytes.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def restart(self, idx: int) -> None:
        """Byte-align (1-padding) and emit RSTn — the marker bytes are NOT
        stuffed (they must survive as a marker)."""
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1
            self.bytes.append(self.acc)
            if self.acc == 0xFF:
                self.bytes.append(0x00)
            self.acc = 0
            self.n = 0
        self.bytes += bytes([0xFF, 0xD0 + (idx % 8)])

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.bytes.append(self.acc)
            if self.acc == 0xFF:
                self.bytes.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.bytes)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _dht_segment(tc: int, th: int, table) -> bytes:
    counts, symbols = table
    body = bytes([tc << 4 | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg_blocks(
    img: np.ndarray, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Exact baseline JPEG for a BLOCK-CONSTANT image (grayscale (H, W) or
    RGB (H, W, 3)): all-ones quant tables, Annex K Huffman, DC-only blocks
    + EOB. ``subsampling="444"`` needs constant 8×8 blocks and
    multiple-of-8 dims; ``"420"`` (the MJPEG-camera shape: Y 2×2, chroma
    1×1 with interleaved 16×16 MCUs) needs constant 16×16 tiles and
    multiple-of-16 dims. Grayscale decodes BIT-EXACTLY; color is exact to
    ±1 per channel (the YCbCr forward transform itself rounds — inherent
    to JPEG, not to this codec)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if gray or subsampling == "444":
        tile = 8
        samp_y = 0x11
    else:
        tile = 16
        samp_y = 0x22
    if h % tile or w % tile:
        raise ValueError(f"fixture encoder needs multiple-of-{tile} dims")
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    th_, tw_ = h // tile, w // tile
    for p in planes:
        tiles = p.reshape(th_, tile, tw_, tile)
        if not np.allclose(tiles, tiles[:, :1, :, :1]):
            raise ValueError(f"fixture encoder needs {tile}×{tile}-constant pixels")

    out = bytearray(b"\xff\xd8")
    # DQT: all ones, table 0 (and 1 for chroma when color)
    for tq in range(1 if gray else 2):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + b"\x01" * 64
    nc = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, samp_y if i == 0 else 0x11, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUMA) + _dht_segment(1, 0, AC_LUMA)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA) + _dht_segment(1, 1, AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_codes = [_canonical_codes(*DC_LUMA)] + (
        [] if gray else [_canonical_codes(*DC_CHROMA)] * 2
    )
    ac_codes = [_canonical_codes(*AC_LUMA)] + (
        [] if gray else [_canonical_codes(*AC_CHROMA)] * 2
    )
    wtr = _BitWriter()
    pred = [0] * nc

    def put_block(ci: int, c: float) -> None:
        dc = int(round(8.0 * (c - 128.0)))
        diff = dc - pred[ci]
        pred[ci] = dc
        s = _category(diff)
        code, length = dc_codes[ci][s]
        wtr.write(code, length)
        if s:
            amp = diff if diff >= 0 else diff + (1 << s) - 1
            wtr.write(amp, s)
        code, length = ac_codes[ci][0x00]  # EOB
        wtr.write(code, length)

    mcu_count = 0
    rst_idx = 0

    def maybe_restart() -> None:
        nonlocal rst_idx
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            wtr.restart(rst_idx)
            rst_idx += 1
            for ci in range(nc):
                pred[ci] = 0

    if tile == 8:
        for byy in range(th_):
            for bxx in range(tw_):
                maybe_restart()
                mcu_count += 1
                for ci in range(nc):
                    put_block(ci, planes[ci][byy * 8, bxx * 8])
    else:
        # 4:2:0 MCU = 4 Y blocks (raster) + Cb + Cr, all constant per tile
        for myy in range(th_):
            for mxx in range(tw_):
                maybe_restart()
                mcu_count += 1
                c = planes[0][myy * 16, mxx * 16]
                for _ in range(4):
                    put_block(0, c)
                put_block(1, planes[1][myy * 16, mxx * 16])
                put_block(2, planes[2][myy * 16, mxx * 16])
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)
