"""Varbyte/delta codec round-trips (FIXTURES.md invariant 4)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sync2any_spark.index.codec import (
    decode_doc_ids,
    decode_tfs,
    encode_doc_ids,
    encode_tfs,
    vb_decode,
    vb_encode,
)


def test_empty():
    assert vb_encode(np.array([], dtype=np.int64)) == b""
    assert vb_decode(b"").size == 0
    assert encode_doc_ids(np.array([], dtype=np.int64)) == b""


def test_known_values():
    v = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**40 + 7])
    assert (vb_decode(vb_encode(v)) == v).all()
    # 127 fits one byte, 128 needs two
    assert len(vb_encode(np.array([127]))) == 1
    assert len(vb_encode(np.array([128]))) == 2


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**62), max_size=300)
)
def test_vb_roundtrip(vals):
    v = np.array(vals, dtype=np.int64)
    assert (vb_decode(vb_encode(v)) == v).all()


@settings(max_examples=200, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=2**50), min_size=1, max_size=300)
)
def test_doc_id_roundtrip(ids):
    d = np.array(sorted(ids), dtype=np.int64)
    assert (decode_doc_ids(encode_doc_ids(d)) == d).all()


def test_tfs_roundtrip():
    rng = np.random.default_rng(0)
    tfs = rng.integers(1, 1000, size=1000)
    assert (decode_tfs(encode_tfs(tfs)) == tfs).all()


def test_positions_roundtrip():
    """encode_positions_segments / decode_positions: per-posting absolute
    reset + gap encoding round-trips across segment layouts."""
    import numpy as np

    from sync2any_spark.index.codec import (
        decode_positions,
        encode_positions_segments,
    )

    rng = np.random.default_rng(5)
    # 7 postings with 1..6 occurrences each, ascending positions per posting
    tfs = rng.integers(1, 7, size=7)
    pos = np.concatenate(
        [np.sort(rng.choice(200, size=int(t), replace=False)) for t in tfs]
    ).astype(np.int64)
    posting_bounds = np.concatenate(([0], np.cumsum(tfs)))
    # two segments: postings 0-2 and 3-6
    seg_bounds = np.array(
        [0, posting_bounds[3], posting_bounds[-1]], dtype=np.int64
    )
    bufs = encode_positions_segments(pos, posting_bounds, seg_bounds)
    assert len(bufs) == 2
    got = decode_positions(b"".join(bufs), tfs)
    assert (got == pos).all()
    # empty input
    assert encode_positions_segments(
        np.array([], dtype=np.int64), np.array([0]), np.array([0, 0])
    ) == [b""]
