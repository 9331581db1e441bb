"""Canonical analyzer — the engine's analog of ES's ``standard`` analyzer.

The reference creates every text column with the ``standard`` analyzer for
both index and search (``load/impl/EsLoadServiceImpl.java:249-258``). The
standard analyzer does Unicode word segmentation + lowercase; for CJK it
emits one token per ideograph. We pin a deterministic, regex-definable
subset of that behavior so the exact same tokenization is computable in

1. Python (this module — used by the pandas UDFs AND the pytest oracle), and
2. DuckDB RE2 (``DUCKDB_TOKEN_RE`` — used by the driver's oracle_sql gate),

guaranteeing bit-identical df/tf/BM25 statistics across engine and oracle.

Token = maximal run of ``[a-z0-9]`` over the lowercased text, or a single
CJK/kana/hangul codepoint. Everything else is a separator. Accented Latin
letters act as separators in both engines (Python ``str.lower`` and DuckDB
``lower`` agree on the characters this pattern keeps).
"""

from __future__ import annotations

import re

# Python (re) and DuckDB (RE2) spellings of the same token pattern.
_CJK = "一-鿿぀-ヿ가-힯"
TOKEN_RE = re.compile(rf"[a-z0-9]+|[{_CJK}]")
DUCKDB_TOKEN_RE = (
    r"[a-z0-9]+|[\x{4e00}-\x{9fff}\x{3040}-\x{30ff}\x{ac00}-\x{d7af}]"
)


def tokenize(text: str | None) -> list[str]:
    """Analyze one text into its token list (duplicates preserved, in order)."""
    if not text:
        return []
    return TOKEN_RE.findall(text.lower())


def tokenize_series(texts) -> "list[list[str]]":
    """Vectorized-batch form used inside Arrow/pandas UDFs.

    Accepts a pandas Series of strings (possibly with None), returns a list
    of token lists. The per-element regex runs inside one Arrow batch — this
    is the engine's only Python-side text work (SURVEY.md §2.B B1).
    """
    findall = TOKEN_RE.findall
    return [findall(t.lower()) if t else [] for t in texts]


# ---------------------------------------------------------------------------
# Byte-level vectorized analyzer (round 6). Same tokens as TOKEN_RE over
# str.lower(), produced without materializing one Python string per token —
# the per-token PyObject churn (~60 B/token × ~60 tokens/doc) was the
# dominant memory-bandwidth cost of the SPIMI kernels under 32-way task
# concurrency. Operates directly on the UTF-8 buffer of an Arrow string
# array: one 256-byte LUT lowercase pass, boolean run detection for
# [a-z0-9]+ tokens, codepoint math for single-char CJK tokens, then ONE
# Arrow dictionary_encode over a zero-Python token array.
#
# Exactness: the fast path refuses (returns None) whenever the bytes could
# tokenize differently from `TOKEN_RE.findall(text.lower())`:
#   - any 2-byte UTF-8 codepoint equal to U+0130 ('İ' — lower() emits an
#     ASCII 'i' + combining dot) or any 3-byte U+212A ('K' Kelvin — lower()
#     emits ASCII 'k'). These are the only BMP codepoints whose str.lower()
#     introduces ASCII token characters (pinned by tests/test_tokenize.py
#     which brute-forces the whole BMP);
#   - case mappings never produce CJK codepoints, and astral-plane (4-byte)
#     mappings stay astral, so every other non-ASCII codepoint is a
#     separator both before and after lower() — byte identity is enough.
# Callers fall back to tokenize_series when this returns None.
import numpy as np

_LOWER_LUT = np.arange(256, dtype=np.uint8)
_LOWER_LUT[ord("A") : ord("Z") + 1] += 32
_ISWORD_LUT = np.zeros(256, dtype=bool)
_ISWORD_LUT[ord("a") : ord("z") + 1] = True
_ISWORD_LUT[ord("0") : ord("9") + 1] = True
# the CJK token ranges of TOKEN_RE (all 3-byte UTF-8, BMP)
_CJK_RANGES = ((0x4E00, 0x9FFF), (0x3040, 0x30FF), (0xAC00, 0xD7AF))
# lone codepoints whose lower() yields ASCII token chars (see test)
_UNSAFE_2B = frozenset([0x0130])
_UNSAFE_3B = frozenset([0x212A])


def tokenize_arrow_codes(arr):
    """Tokenize an Arrow string array into
    ``(codes int64, doc_lens int64, uniq_terms object ndarray)`` — codes are
    indices into ``uniq_terms`` (sorted ascending, factorize(sort=True)
    semantics), one code per token occurrence in document order, and
    ``doc_lens[i]`` is document i's token count. Returns None when the
    input needs the regex path (see module comment). ``arr`` may be a
    ChunkedArray; nulls tokenize to zero tokens."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_docs = len(arr)
    if n_docs == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=object),
        )
    if arr.null_count:
        # null → "" (tokenizes to nothing, same as tokenize(None))
        arr = pc.fill_null(arr, "")
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    bufs = arr.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + n_docs + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
    offs = offs - offs[0]
    n = data.size

    lowered = _LOWER_LUT[data]
    word = _ISWORD_LUT[lowered]

    cjk_starts = None
    nonascii = data >= 0x80
    n_nonascii = int(nonascii.sum())
    if n_nonascii:
        lead3 = np.flatnonzero((data & 0xF0) == 0xE0)
        lead4 = np.flatnonzero((data & 0xF8) == 0xF0)
        lead2 = np.flatnonzero((data & 0xE0) == 0xC0)
        # every non-ASCII byte must be a lead or its continuation; Arrow
        # strings are valid UTF-8, so counting is enough
        if n_nonascii != 3 * lead3.size + 4 * lead4.size + 2 * lead2.size:
            return None
        if lead2.size:
            cp2 = ((data[lead2].astype(np.int32) & 0x1F) << 6) | (
                data[lead2 + 1] & 0x3F
            )
            if np.isin(cp2, list(_UNSAFE_2B)).any():
                return None
        if lead3.size:
            cp3 = (
                ((data[lead3].astype(np.int32) & 0x0F) << 12)
                | ((data[lead3 + 1].astype(np.int32) & 0x3F) << 6)
                | (data[lead3 + 2] & 0x3F)
            )
            if np.isin(cp3, list(_UNSAFE_3B)).any():
                return None
            in_range = np.zeros(cp3.shape, dtype=bool)
            for lo, hi in _CJK_RANGES:
                in_range |= (cp3 >= lo) & (cp3 <= hi)
            cjk_starts = lead3[in_range]
        # 4-byte codepoints are astral: separators under both spellings

    # ASCII [a-z0-9]+ runs, broken at document boundaries
    prev = np.empty(n, dtype=bool)
    if n:
        prev[0] = False
        prev[1:] = word[:-1]
        prev[offs[:-1][offs[:-1] < n]] = False  # a doc start opens a run
    tok_start_mask = word & ~prev
    nxt = np.empty(n, dtype=bool)
    if n:
        nxt[-1] = False
        nxt[:-1] = word[1:]
        doc_last = offs[1:] - 1
        nxt[doc_last[(doc_last >= 0) & (doc_last < n)]] = False
    tok_end_mask = word & ~nxt
    starts = np.flatnonzero(tok_start_mask)
    ends = np.flatnonzero(tok_end_mask) + 1

    if cjk_starts is not None and cjk_starts.size:
        starts = np.concatenate((starts, cjk_starts))
        ends = np.concatenate((ends, cjk_starts + 3))
        order = np.argsort(starts, kind="stable")
        starts, ends = starts[order], ends[order]

    n_tok = starts.size
    doc_lens = (
        np.bincount(
            np.searchsorted(offs[1:], starts, side="right"), minlength=n_docs
        ).astype(np.int64)
        if n_tok
        else np.zeros(n_docs, dtype=np.int64)
    )
    if n_tok == 0:
        return (
            np.empty(0, dtype=np.int64),
            doc_lens,
            np.empty(0, dtype=object),
        )

    # Pack each token's first ≤8 bytes into ONE uint64 with a single
    # unaligned strided gather — token bytes are never 0x00, so
    # zero-padding makes the packed key injective for tokens ≤ 8 bytes
    # (one gather instead of materializing a token-bytes values buffer,
    # which cost more than the tokenize itself). Longer tokens (rare)
    # get distinct keys ≥ 2^63 from a bytes dict — packed short keys
    # stay below 2^63 because a token byte is ≤ 0xEF and an 8-byte
    # token is pure ASCII (≤ 0x7A high byte).
    lens = ends - starts
    pad = np.zeros(8, dtype=np.uint8)
    lp = np.concatenate((lowered, pad))
    u64v = np.ndarray(
        buffer=lp.data, dtype=np.uint64, shape=(lp.size - 7,), strides=(1,)
    )
    keys = u64v[starts]
    mask_lut = np.zeros(9, dtype=np.uint64)
    for L in range(1, 9):
        mask_lut[L] = (1 << (8 * L)) - 1 if L < 8 else np.uint64(2**64 - 1)
    keys &= mask_lut[np.minimum(lens, 8)]
    long_idx = np.flatnonzero(lens > 8)
    if long_idx.size:
        lbytes = lowered.tobytes()
        seen: dict[bytes, int] = {}
        lkeys = np.empty(long_idx.size, dtype=np.uint64)
        base = np.uint64(1) << np.uint64(63)
        for i, t in enumerate(long_idx):
            bb = lbytes[starts[t] : ends[t]]
            got = seen.get(bb)
            if got is None:
                got = len(seen)
                seen[bb] = got
            lkeys[i] = base + np.uint64(got)
        keys[long_idx] = lkeys
    import pandas as pd

    codes32, uniq_keys = pd.factorize(keys)
    # term strings for the unique keys only (~vocab-sized, not token-sized)
    uniq = np.empty(uniq_keys.size, dtype=object)
    long_names = {v: k for k, v in seen.items()} if long_idx.size else {}
    kb = np.ascontiguousarray(uniq_keys, dtype="<u8").view(np.uint8).reshape(-1, 8)
    for i, key in enumerate(uniq_keys):
        if key >= (1 << 63):
            uniq[i] = long_names[int(key - (1 << 63))].decode("utf-8")
        else:
            row = kb[i]
            z = np.flatnonzero(row == 0)
            uniq[i] = row[: int(z[0]) if z.size else 8].tobytes().decode("utf-8")
    # factorize(sort=True) semantics: codes index the SORTED vocabulary
    sort_order = np.argsort(uniq)
    inv = np.empty(uniq.size, dtype=np.int64)
    inv[sort_order] = np.arange(uniq.size, dtype=np.int64)
    return inv[codes32.astype(np.int64)], doc_lens, uniq[sort_order]
