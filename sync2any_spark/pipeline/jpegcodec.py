"""Pure-numpy JPEG codec (baseline + progressive) — the MJPEG plug-in,
no libjpeg.

Decoder: sequential baseline DCT JPEG (ITU-T T.81) — marker parse
(DQT/SOF0/DHT/DRI/SOS), canonical Huffman decode with DC prediction,
restart-marker handling (byte realign + predictor reset every DRI
interval), 0xFF00 byte-unstuffing, de-zigzag, dequantization, 8×8 IDCT
(exact DCT-III matrix form), level shift, nearest-neighbor chroma
upsampling, and JFIF YCbCr→RGB for 3-component scans — AND progressive
DCT (SOF2, Annex G): multi-scan spectral selection + successive
approximation, interleaved or single-component DC scans, cross-block EOB
runs, and AC refinement with interleaved correction bits. Sampling
factors 1 and 2 (grayscale, 4:4:4, 4:2:2, 4:2:0); lossless/hierarchical
and arithmetic-coded streams raise by marker.

Encoders: RESTRICTED exact encoders for test fixtures. Baseline:
block-constant images, all-ones quantization, Annex K tables — only DC
coefficients survive, so ``decode(encode(x)) == x`` bit-for-bit with a
closed-form expected output. Progressive: the same block-constant form
as an SOF2 scan script (interleaved DC + all-EOB AC scans), plus a
COEFFICIENT-LEVEL grayscale encoder (arbitrary quantized coefficients,
any band partition and approximation depth) whose expected image is the
closed numpy form dezigzag → IDCT → +128 — full Annex G bitstreams with
independently-computable ground truth.

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

    def read_symbol(self, lut: list) -> int:
        """One Huffman symbol via the 2^16 LUT (progressive scans use
        these method forms; the baseline hot path inlines them)."""
        p = self.pos
        if p >= self.nbits:
            raise ValueError("truncated JPEG scan")
        v = lut[(self.words[p >> 3] >> (16 - (p & 7))) & 0xFFFF]
        if v == 0:
            raise ValueError("invalid Huffman code in scan")
        self.pos = p + (v >> 8)
        if self.pos > self.nbits:
            raise ValueError("truncated JPEG scan")
        return v & 0xFF

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("truncated JPEG scan")
        self.pos = p + n
        return (self.words[p >> 3] >> (32 - (p & 7) - n)) & ((1 << n) - 1)

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


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit amplitude to its signed value."""
    return v if s == 0 or v >= 1 << (s - 1) else v - (1 << s) + 1


def _decode_progressive(frame, scans, qt, mcux, mcuy, max_h, max_v):
    """Progressive JPEG (T.81 Annex G, Huffman): every scan deposits
    partial coefficients into per-component MCU-padded block grids —
    DC scans (interleaved or single-component) with successive
    approximation, AC scans (always single-component) with spectral
    selection, EOB runs spanning blocks, and AC refinement scans that
    interleave correction bits for already-nonzero coefficients with
    newly-significant ones. Returns full-resolution float planes."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    by_id = {c["id"]: c for c in comps}
    geom = {}
    coef = {}
    for c in comps:
        gw = mcux * c["h"]  # padded grid width/height in blocks
        gh = mcuy * c["v"]
        cw = ((w * c["h"] + max_h - 1) // max_h + 7) // 8  # actual blocks
        ch = ((h * c["v"] + max_v - 1) // max_v + 7) // 8
        geom[c["id"]] = (gw, gh, cw, ch)
        coef[c["id"]] = [[0] * 64 for _ in range(gw * gh)]

    for sc in scans:
        r = _BitReader(sc["data"])
        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        dri = sc["dri"]
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            _prog_dc_scan(r, sc, by_id, geom, coef, mcux, mcuy, ah, al, dri)
        else:
            if len(sc["comps"]) != 1:
                raise ValueError("progressive AC scan must be single-component")
            s0 = sc["comps"][0]
            lut = sc["huff"][(1, s0["ac"])]
            _prog_ac_scan(
                r, geom[s0["id"]], coef[s0["id"]], lut, ss, se, ah, al, dri
            )

    # dequant + batched IDCT + raster placement (blocks stored row-major)
    m = _idct_matrix()
    outs = []
    for c in comps:
        gw, gh, _cw, _ch = geom[c["id"]]
        arr = np.array(coef[c["id"]], dtype=np.float64)  # (gw*gh, 64) zigzag
        dq = np.empty_like(arr)
        dq[:, ZIGZAG] = arr * qt[c["tq"]][None, :]
        px = (m.T @ dq.reshape(-1, 8, 8) @ m) + 128.0
        p = px.reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3).reshape(gh * 8, gw * 8)
        if c["h"] < max_h or c["v"] < max_v:
            p = np.repeat(
                np.repeat(p, max_v // c["v"], axis=0), max_h // c["h"], axis=1
            )
        outs.append(p[:h, :w])
    return outs


def _prog_dc_scan(r, sc, by_id, geom, coef, mcux, mcuy, ah, al, dri):
    """DC scan: first pass (Ah=0) Huffman-codes diffs of DC>>Al with
    per-component prediction; refinement (Ah>0) is one raw bit per block
    ORed in at Al. Interleaved iterates MCUs; a single-component scan
    iterates the component's ACTUAL block grid (padding blocks are not
    coded — T.81 A.2.2)."""
    scomps = sc["comps"]
    pred = {s["id"]: 0 for s in scomps}
    if len(scomps) > 1:  # interleaved, MCU order
        units = []
        for s in scomps:
            c = by_id[s["id"]]
            lut = sc["huff"][(0, s["dc"])] if ah == 0 else None
            units.append((c["id"], c["h"], c["v"], geom[c["id"]][0], lut))
        for mcu in range(mcuy * mcux):
            if dri and mcu and mcu % dri == 0:
                r.skip_restart()
                for cid in pred:
                    pred[cid] = 0
            my, mx = divmod(mcu, mcux)
            for cid, chh, cv, gw, lut in units:
                for bv in range(cv):
                    for bh in range(chh):
                        block = coef[cid][(my * cv + bv) * gw + mx * chh + bh]
                        if ah == 0:
                            s = r.read_symbol(lut)
                            pred[cid] += _extend(r.bits(s), s)
                            block[0] = pred[cid] << al
                        elif r.bits(1):
                            block[0] |= 1 << al
    else:
        s0 = scomps[0]
        gw, _gh, cw, ch = geom[s0["id"]]
        blocks = coef[s0["id"]]
        lut = sc["huff"][(0, s0["dc"])] if ah == 0 else None
        n = 0
        for row in range(ch):
            for col in range(cw):
                if dri and n and n % dri == 0:
                    r.skip_restart()
                    pred[s0["id"]] = 0
                n += 1
                block = blocks[row * gw + col]
                if ah == 0:
                    s = r.read_symbol(lut)
                    pred[s0["id"]] += _extend(r.bits(s), s)
                    block[0] = pred[s0["id"]] << al
                elif r.bits(1):
                    block[0] |= 1 << al


def _prog_ac_scan(r, geom, blocks, lut, ss, se, ah, al, dri):
    """AC scan over one component's actual block grid. First pass
    (Ah=0): run-length symbols place values<<Al, EOBn codes span blocks.
    Refinement (Ah>0): the T.81 G.1.2.3 walk — newly-significant
    coefficients are coded (r, s=1)+sign, and every already-nonzero
    coefficient passed over (including the whole band tail under an EOB
    run) receives a correction bit."""
    gw, _gh, cw, ch = geom
    eobrun = 0
    p1 = 1 << al
    m1 = -1 << al
    n = 0
    for row in range(ch):
        for col in range(cw):
            if dri and n and n % dri == 0:
                r.skip_restart()
                eobrun = 0
            n += 1
            block = blocks[row * gw + col]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = r.read_symbol(lut)
                    rr, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if rr != 15:
                            eobrun = (1 << rr) - 1
                            if rr:
                                eobrun += r.bits(rr)
                            break
                        k += 16
                    else:
                        k += rr
                        if k > se:
                            raise ValueError("AC coefficient outside band")
                        block[k] = _extend(r.bits(s), s) << al
                        k += 1
            else:
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = r.read_symbol(lut)
                        rr, s = rs >> 4, rs & 0xF
                        val = 0
                        if s == 0:
                            if rr != 15:
                                eobrun = 1 << rr
                                if rr:
                                    eobrun += r.bits(rr)
                                break
                            # ZRL: skip 16 zero-history coefficients
                        else:
                            val = p1 if r.bits(1) else m1
                        while k <= se:
                            c = block[k]
                            if c:
                                if r.bits(1) and not (c & p1):
                                    block[k] = c + (p1 if c >= 0 else m1)
                            else:
                                if rr == 0:
                                    break
                                rr -= 1
                            k += 1
                        if s:
                            if k > se:
                                raise ValueError("AC refine outside band")
                            block[k] = val
                        k += 1
                if eobrun:
                    while k <= se:
                        c = block[k]
                        if c and r.bits(1) and not (c & p1):
                            block[k] = c + (p1 if c >= 0 else m1)
                        k += 1
                    eobrun -= 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JPEG → (H, W) uint8 (grayscale) or
    (H, W, 3) uint8 (RGB)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], list] = {}  # (class, id) → decode LUT
    frame = None
    scans: list[dict] = []
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
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            # SOF0/1 baseline, SOF2 progressive, SOF3 lossless
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {
                "h": h, "w": w, "comps": comps, "prec": prec,
                "prog": marker == 0xC2, "lossless": marker == 0xC3,
            }
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}) — libjpeg "
                f"plugs in here; MJPEG streams are baseline or progressive"
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
            # spectral selection + successive approximation (baseline:
            # 0, 63, 0, 0 — progressive scans vary them per T.81 Annex G)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
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
            scans.append(
                {
                    "comps": scan_comps,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 0xF,
                    "data": scan_data,
                    "huff": dict(huff),  # tables may be redefined per scan
                    "dri": restart_interval,
                }
            )
            pos = q
            continue
        pos += seglen
    if frame is None or not scans:
        raise ValueError("missing SOF/SOS")
    if frame.get("lossless"):
        return _decode_lossless(frame, scans)
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

    if frame["prog"]:
        outs = _decode_progressive(frame, scans, qt, mcux, mcuy, max_h, max_v)
        return _finish_planes(outs)

    scan0 = scans[0]
    scan_comps = scan0["comps"]
    restart_interval = scan0["dri"]
    pred = {c["id"]: 0 for c in comps}
    r = _BitReader(scan0["data"])

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
            scan0["huff"][(0, sc["dc"])],
            scan0["huff"][(1, sc["ac"])],
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
    return _finish_planes(outs)


def _decode_lossless(frame, scans) -> np.ndarray:
    """Lossless JPEG (T.81 Annex H, Huffman): spatial-domain predictive
    coding — no DCT, no quantization. Each sample's difference from its
    prediction is coded exactly like a DC coefficient (category symbol
    SSSS through a DC Huffman table + SSSS amplitude bits; SSSS = 16 means
    a difference of 32768 with no extra bits), and reconstruction is
    ``Rx = (Px + Diff) mod 2^16`` (H.1.2.1).

    Predictors 1-7 (H.1-H.7) select over Ra (left), Rb (above), Rc
    (above-left). Positional rules: the very first sample (and the first
    sample after every restart marker) is predicted as ``2^(P - Pt - 1)``;
    the rest of the first line uses the 1-D horizontal predictor Ra; the
    first sample of every other line uses Rb; everywhere else the
    selected predictor applies. Prediction runs in the point-transformed
    domain; the final output shifts left by Pt.

    Returns (H, W) for one component, (H, W, nc) stacked otherwise —
    uint16 when precision > 8 (lossless precision spans 2-16 bits), else
    uint8. Lossless components carry no YCbCr convention, so no
    colorspace transform is applied.
    """
    comps = frame["comps"]
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        f = [(c["h"], c["v"]) for c in comps]
        raise NotImplementedError(
            f"lossless JPEG sampling factors {f} — components are "
            f"full-resolution (1x1) in practice"
        )
    prec = frame["prec"]
    if not 2 <= prec <= 16:
        raise ValueError(f"lossless JPEG precision {prec} outside 2..16")
    h, w = frame["h"], frame["w"]
    planes = {c["id"]: np.zeros((h, w), dtype=np.int64) for c in comps}
    covered: set[int] = set()
    for scan in scans:
        psel, pt = scan["ss"], scan["al"]
        if not 1 <= psel <= 7:
            raise ValueError(f"lossless predictor selector {psel}")
        sched = [
            (planes[sc["id"]], scan["huff"][(0, sc["dc"])])
            for sc in scan["comps"]
        ]
        covered.update(sc["id"] for sc in scan["comps"])
        r = _BitReader(scan["data"])
        dri = scan["dri"]
        default = 1 << (prec - pt - 1)
        reset = True  # start-of-scan → default prediction
        ra_row = 0  # row whose remainder uses the first-line Ra rule
        mcu = 0  # one MCU = one sample position (1x1 sampling)
        for y in range(h):
            for x in range(w):
                if dri and mcu and mcu % dri == 0:
                    r.skip_restart()
                    reset = True
                mcu += 1
                for plane, lut in sched:
                    s = r.read_symbol(lut)
                    if s > 16:
                        raise ValueError(f"lossless SSSS {s} > 16")
                    diff = 32768 if s == 16 else _extend(r.bits(s), s)
                    if reset:
                        px = default
                    elif y == ra_row:
                        # H.1.2.1: the FIRST LINE of the scan and of every
                        # restart interval uses the 1-D Ra predictor for
                        # everything after its default-predicted sample
                        # (ADVICE r5 #3 — the selected predictor must not
                        # resume mid-interval-first-line)
                        px = plane[y, x - 1]
                    elif x == 0:
                        px = plane[y - 1, 0]
                    else:
                        ra = plane[y, x - 1]
                        rb = plane[y - 1, x]
                        rc = plane[y - 1, x - 1]
                        if psel == 1:
                            px = ra
                        elif psel == 2:
                            px = rb
                        elif psel == 3:
                            px = rc
                        elif psel == 4:
                            px = ra + rb - rc
                        elif psel == 5:
                            px = ra + ((rb - rc) >> 1)
                        elif psel == 6:
                            px = rb + ((ra - rc) >> 1)
                        else:
                            px = (ra + rb) >> 1
                    plane[y, x] = (int(px) + diff) & 0xFFFF
                if reset:
                    ra_row = y
                reset = False
    missing = {c["id"] for c in comps} - covered
    if missing:
        raise ValueError(f"lossless scan(s) missing component(s) {missing}")
    pt0 = scans[0]["al"]
    outs = [planes[c["id"]] << pt0 for c in comps]
    dtype = np.uint16 if prec > 8 else np.uint8
    if len(outs) == 1:
        return outs[0].astype(dtype)
    return np.stack(outs, axis=-1).astype(dtype)


def _finish_planes(outs: "list[np.ndarray]") -> np.ndarray:
    """Full-resolution component planes → uint8 image (JFIF YCbCr→RGB for
    3-component frames)."""
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


# ---------------------------------------------------------------------------
# progressive fixture encoders (T.81 Annex G bitstreams with closed-form
# expected output) — the decoder's test harness, not a general encoder
# ---------------------------------------------------------------------------


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (T.81 G.1.2.1)."""
    return v >> al if v >= 0 else -((-v) >> al)


# progressive AC table: baseline Annex K AC tables lack the EOBn symbols
# (r>0, s=0) progressive scans need, so the fixtures carry a generic
# canonical table covering every (run, size) byte — 254 8-bit + 2 9-bit
# codes, leaving the all-ones code unused as T.81 C.2 requires
PROG_AC = (
    [0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def encode_jpeg_lossless(
    img: np.ndarray,
    predictor: int = 1,
    pt: int = 0,
    restart_rows: int = 0,
) -> bytes:
    """Exact SOF3 fixture encoder (T.81 Annex H): the inverse of
    ``_decode_lossless``, mirroring its prediction rules bit for bit.

    ``img`` is (H, W) or (H, W, nc) uint8/uint16; precision is 8 or 16 by
    dtype. ``pt`` (point transform) drops the low ``pt`` bits first —
    decode then returns ``(img >> pt) << pt``. All 17 difference
    categories share one flat 5-bit Huffman table (17/32 Kraft slots), so
    any 16-bit difference is codable. ``restart_rows`` emits an RSTn every
    that many sample rows (DRI in MCUs = rows × W)."""
    img = np.asarray(img)
    if img.ndim == 2:
        arrs = [img]
    else:
        arrs = [img[:, :, i] for i in range(img.shape[2])]
    prec = 16 if img.dtype == np.uint16 else 8
    if pt >= prec:
        raise ValueError("point transform must leave at least one bit")
    h, w = img.shape[:2]
    samples = [a.astype(np.int64) >> pt for a in arrs]

    counts = [0] * 16
    counts[4] = 17  # all 17 SSSS symbols at code length 5
    symbols = list(range(17))
    codes = _canonical_codes(counts, symbols)

    out = bytearray(b"\xff\xd8")
    out += _dht_segment(0, 0, (counts, symbols))
    nc = len(samples)
    sof = bytes([prec]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", len(sof) + 2) + sof
    dri = restart_rows * w if restart_rows else 0
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    out += _sos_segment([(i + 1, 0, 0) for i in range(nc)], predictor, 0, 0, pt)

    wtr = _BitWriter()
    default = 1 << (prec - pt - 1)
    reset = True
    ra_row = 0  # mirror of the decoder's first-line-of-interval Ra rule
    mcu = 0
    rst = 0
    for y in range(h):
        for x in range(w):
            if dri and mcu and mcu % dri == 0:
                wtr.restart(rst)
                rst += 1
                reset = True
            mcu += 1
            if reset:
                ra_row = y
            for plane in samples:
                if reset:
                    px = default
                elif y == ra_row:
                    px = plane[y, x - 1]
                elif x == 0:
                    px = plane[y - 1, 0]
                else:
                    ra = plane[y, x - 1]
                    rb = plane[y - 1, x]
                    rc = plane[y - 1, x - 1]
                    if predictor == 1:
                        px = ra
                    elif predictor == 2:
                        px = rb
                    elif predictor == 3:
                        px = rc
                    elif predictor == 4:
                        px = ra + rb - rc
                    elif predictor == 5:
                        px = ra + ((rb - rc) >> 1)
                    elif predictor == 6:
                        px = rb + ((ra - rc) >> 1)
                    else:
                        px = (ra + rb) >> 1
                d = (int(plane[y, x]) - int(px)) & 0xFFFF
                if d > 32768:
                    d -= 65536  # signed difference in [-32767, 32768]
                if d == 32768:
                    c, ln = codes[16]
                    wtr.write(c, ln)  # SSSS=16: no amplitude bits
                else:
                    s = _category(d)
                    c, ln = codes[s]
                    wtr.write(c, ln)
                    if s:
                        wtr.write(d if d >= 0 else d + (1 << s) - 1, s)
            reset = False
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _sos_segment(comp_spec: "list[tuple[int, int, int]]",
                 ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(comp_spec)])
    for cs, td, ta in comp_spec:
        body += bytes([cs, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


class _ProgACWriter:
    """Cross-block EOB-run accumulator for progressive AC scans: blocks
    with no newly-significant coefficients join a pending run; the EOBn
    symbol (plus, for refinement scans, each covered block's correction
    bits in order) is emitted when the run is broken or the scan ends."""

    def __init__(self, wtr: "_BitWriter", codes: dict) -> None:
        self.wtr = wtr
        self.codes = codes
        self.run = 0
        self.tails: "list[list[int]]" = []

    def eob_block(self, tail_bits: "list[int]") -> None:
        self.run += 1
        self.tails.append(tail_bits)
        if self.run == 32767:
            self.flush()

    def flush(self) -> None:
        if self.run == 0:
            return
        rr = self.run.bit_length() - 1
        code, ln = self.codes[rr << 4]
        self.wtr.write(code, ln)
        if rr:
            self.wtr.write(self.run - (1 << rr), rr)
        for bits_ in self.tails:
            for b in bits_:
                self.wtr.write(b, 1)
        self.run = 0
        self.tails = []


def _emit_ac_first(acw: _ProgACWriter, wtr: "_BitWriter", codes: dict,
                   vals, ss: int, se: int, al: int) -> None:
    nz = [(k, _pt_ac(int(vals[k]), al)) for k in range(ss, se + 1)]
    nz = [(k, v) for k, v in nz if v]
    if not nz:
        acw.eob_block([])
        return
    acw.flush()
    k = ss
    for p, v in nz:
        run = p - k
        while run >= 16:
            code, ln = codes[0xF0]
            wtr.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = codes[(run << 4) | s]
        wtr.write(code, ln)
        amp = v if v >= 0 else v + (1 << s) - 1
        wtr.write(amp & ((1 << s) - 1), s)
        k = p + 1
    if k <= se:
        acw.eob_block([])


def _emit_ac_refine(acw: _ProgACWriter, wtr: "_BitWriter", codes: dict,
                    vals, ss: int, se: int, al: int) -> None:
    hist = [_pt_ac(int(vals[k]), al + 1) != 0 for k in range(64)]
    cur = [_pt_ac(int(vals[k]), al) for k in range(64)]
    newpos = [k for k in range(ss, se + 1) if not hist[k] and cur[k]]
    for k in newpos:
        if abs(cur[k]) != 1:
            raise ValueError("refinement can only introduce magnitude 1")
    if not newpos:
        acw.eob_block([abs(cur[j]) & 1 for j in range(ss, se + 1) if hist[j]])
        return
    acw.flush()
    k = ss
    for p in newpos:
        run = sum(1 for j in range(k, p) if not hist[j])
        while run >= 16:
            code, ln = codes[0xF0]
            wtr.write(code, ln)
            consumed = 0
            while consumed < 16:
                if hist[k]:
                    wtr.write(abs(cur[k]) & 1, 1)
                else:
                    consumed += 1
                k += 1
            run -= 16
        code, ln = codes[(run << 4) | 1]
        wtr.write(code, ln)
        wtr.write(1 if cur[p] > 0 else 0, 1)
        while k < p:
            if hist[k]:
                wtr.write(abs(cur[k]) & 1, 1)
            k += 1
        k = p + 1
    if k <= se:
        acw.eob_block([abs(cur[j]) & 1 for j in range(k, se + 1) if hist[j]])


def encode_jpeg_progressive_gray(
    coefs: np.ndarray, h: int, w: int,
    dc_al: int = 1,
    ac_bands: "tuple[tuple[int, int], ...]" = ((1, 5), (6, 63)),
    ac_al: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Grayscale progressive JPEG from EXPLICIT quantized coefficients
    (``(n_blocks, 64)`` int array, zigzag order, Q = 1): the fixture has
    full coefficient control, so the expected image is a closed numpy
    form (dezigzag → IDCT → +128) while the bitstream exercises the whole
    Annex G scan machinery — DC first + successive-approximation refines,
    per-band AC first scans with cross-block EOB runs and ZRL, AC
    refinement scans with interleaved correction bits, and (with
    ``restart_interval``) RSTn markers inside every scan, which reset the
    DC predictor / terminate EOB runs at each interval boundary."""
    coefs = np.asarray(coefs, dtype=np.int64)
    mcux, mcuy = (w + 7) // 8, (h + 7) // 8
    n = mcux * mcuy
    if coefs.shape != (n, 64):
        raise ValueError(f"need ({n}, 64) coefficient blocks for {w}x{h}")
    bands = [tuple(b) for b in ac_bands]
    covered = sorted(k for ss, se in bands for k in range(ss, se + 1))
    if covered != list(range(1, 64)):
        raise ValueError("ac_bands must partition 1..63")

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + b"\x01" * 64
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUMA) + _dht_segment(1, 0, PROG_AC)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    dc_codes = _canonical_codes(*DC_LUMA)
    ac_codes = _canonical_codes(*PROG_AC)
    ri = restart_interval

    # DC first scan (Al = dc_al): Huffman diffs of the shifted values
    wtr = _BitWriter()
    pred = 0
    rst = 0
    for b in range(n):
        if ri and b and b % ri == 0:
            wtr.restart(rst)
            rst += 1
            pred = 0
        d = int(coefs[b, 0]) >> dc_al
        diff = d - pred
        pred = d
        s = _category(diff)
        code, ln = dc_codes[s]
        wtr.write(code, ln)
        if s:
            amp = diff if diff >= 0 else diff + (1 << s) - 1
            wtr.write(amp & ((1 << s) - 1), s)
    out += _sos_segment([(1, 0, 0)], 0, 0, 0, dc_al) + wtr.flush()
    # DC refinement scans: one raw bit per block per level
    for a in range(dc_al - 1, -1, -1):
        wtr = _BitWriter()
        rst = 0
        for b in range(n):
            if ri and b and b % ri == 0:
                wtr.restart(rst)
                rst += 1
            wtr.write((int(coefs[b, 0]) >> a) & 1, 1)
        out += _sos_segment([(1, 0, 0)], 0, 0, a + 1, a) + wtr.flush()
    # AC first scans per band
    for ss, se in bands:
        wtr = _BitWriter()
        acw = _ProgACWriter(wtr, ac_codes)
        rst = 0
        for b in range(n):
            if ri and b and b % ri == 0:
                acw.flush()  # an EOB run cannot span a restart interval
                wtr.restart(rst)
                rst += 1
            _emit_ac_first(acw, wtr, ac_codes, coefs[b], ss, se, ac_al)
        acw.flush()
        out += _sos_segment([(1, 0, 0)], ss, se, 0, ac_al) + wtr.flush()
    # AC refinement scans per band per level
    for ss, se in bands:
        for a in range(ac_al - 1, -1, -1):
            wtr = _BitWriter()
            acw = _ProgACWriter(wtr, ac_codes)
            rst = 0
            for b in range(n):
                if ri and b and b % ri == 0:
                    acw.flush()
                    wtr.restart(rst)
                    rst += 1
                _emit_ac_refine(acw, wtr, ac_codes, coefs[b], ss, se, a)
            acw.flush()
            out += _sos_segment([(1, 0, 0)], ss, se, a + 1, a) + wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive_blocks(
    img: np.ndarray, subsampling: str = "444", dc_al: int = 1
) -> bytes:
    """Progressive spelling of ``encode_jpeg_blocks``: the same
    block-constant restriction (DC-only blocks, Q = 1) emitted as an
    SOF2 scan script — INTERLEAVED DC first scan + refinement, then one
    all-EOB AC scan per component — so color/subsampled progressive
    streams with MCU-ordered DC decoding get a closed-form fixture."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if gray or subsampling == "444":
        tile, samp_y = 8, 0x11
    else:
        tile, samp_y = 16, 0x22
    if h % tile or w % tile:
        raise ValueError(f"fixture encoder needs multiple-of-{tile} dims")
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    th_, tw_ = h // tile, w // tile
    for p in planes:
        tiles = p.reshape(th_, tile, tw_, tile)
        if not np.allclose(tiles, tiles[:, :1, :, :1]):
            raise ValueError(f"fixture encoder needs {tile}×{tile}-constant pixels")
    nc = 1 if gray else 3

    out = bytearray(b"\xff\xd8")
    for tq in range(1 if gray else 2):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + b"\x01" * 64
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, samp_y if i == 0 else 0x11, 0 if i == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUMA) + _dht_segment(1, 0, PROG_AC)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA)
    dc_codes = [_canonical_codes(*DC_LUMA)] + (
        [] if gray else [_canonical_codes(*DC_CHROMA)] * 2
    )
    ac_codes = [_canonical_codes(*PROG_AC)] * nc

    # per-component DC grids in MCU-interleave order
    if gray or subsampling == "444":
        dcs = [
            [int(round(8.0 * (p[yy * 8, xx * 8] - 128.0)))
             for yy in range(th_) for xx in range(tw_)]
            for p in planes
        ]
        units = [(ci, 1, 1, tw_) for ci in range(nc)]
        mcun, mcux = th_ * tw_, tw_
    else:
        # luma 2×2 per MCU (each 16×16 tile constant → 4 equal blocks)
        dcs = [
            [int(round(8.0 * (planes[0][(yy // 2) * 16, (xx // 2) * 16] - 128.0)))
             for yy in range(th_ * 2) for xx in range(tw_ * 2)],
            [int(round(8.0 * (planes[1][yy * 16, xx * 16] - 128.0)))
             for yy in range(th_) for xx in range(tw_)],
            [int(round(8.0 * (planes[2][yy * 16, xx * 16] - 128.0)))
             for yy in range(th_) for xx in range(tw_)],
        ]
        units = [(0, 2, 2, tw_ * 2), (1, 1, 1, tw_), (2, 1, 1, tw_)]
        mcun, mcux = th_ * tw_, tw_

    # interleaved DC first scan
    wtr = _BitWriter()
    pred = [0] * nc
    for mcu in range(mcun):
        my, mx = divmod(mcu, mcux)
        for ci, chh, cv, gw in units:
            for bv in range(cv):
                for bh in range(chh):
                    d = dcs[ci][(my * cv + bv) * gw + mx * chh + bh] >> dc_al
                    diff = d - pred[ci]
                    pred[ci] = d
                    s = _category(diff)
                    code, ln = dc_codes[ci][s]
                    wtr.write(code, ln)
                    if s:
                        amp = diff if diff >= 0 else diff + (1 << s) - 1
                        wtr.write(amp & ((1 << s) - 1), s)
    spec = [(i + 1, 0 if i == 0 else 1, 0) for i in range(nc)]
    out += _sos_segment(spec, 0, 0, 0, dc_al) + wtr.flush()
    # interleaved DC refinement scans
    for a in range(dc_al - 1, -1, -1):
        wtr = _BitWriter()
        for mcu in range(mcun):
            my, mx = divmod(mcu, mcux)
            for ci, chh, cv, gw in units:
                for bv in range(cv):
                    for bh in range(chh):
                        d = dcs[ci][(my * cv + bv) * gw + mx * chh + bh]
                        wtr.write((d >> a) & 1, 1)
        out += _sos_segment(spec, 0, 0, a + 1, a) + wtr.flush()
    # one all-EOB AC scan per component (all AC coefficients are zero)
    for ci in range(nc):
        wtr = _BitWriter()
        acw = _ProgACWriter(wtr, ac_codes[ci])
        for _ in range(len(dcs[ci])):
            acw.eob_block([])
        acw.flush()
        out += _sos_segment([(ci + 1, 0, 0)], 1, 63, 0, 0)
        out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)
