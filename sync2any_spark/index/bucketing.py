"""Term-bucket function, computable identically JVM-side and driver-side.

The postings layout partitions by ``bucket(term)`` so the query planner can
prune partitions before the scan. Queries need the same function *on the
driver* (to know which buckets to ask for) without launching a Spark job,
so the bucket is md5-based: Spark's ``md5`` and Python's ``hashlib.md5``
agree bit-for-bit (xxhash64 would be JVM-only). First 15 hex chars = 60
bits — fits signed int64 in both engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket_expr(term_col: str, n_buckets: int) -> Column:
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(term_col)), 1, 15), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def bucket_of(term: str, n_buckets: int) -> int:
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16) % n_buckets


def sub_of(term: str, n_subs: int) -> int:
    """Merge sub-split within a bucket — independent bits (hex 15..30) of
    the SAME md5 digest as ``bucket_of``, so one hash per term yields both.
    Internal to the build (queries never see ``sub``), but deterministic
    across engines so chunk writers and the merge planner always agree."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[15:30], 16) % n_subs


def bucket_sub_arrays(terms, n_buckets: int, n_subs: int):
    """Vectorized-ish (bucket, sub) int32 arrays for an array of terms —
    one md5 per term, both values from its digest."""
    import numpy as np

    md5 = hashlib.md5
    b = np.empty(len(terms), dtype=np.int32)
    s = np.empty(len(terms), dtype=np.int32)
    for i, t in enumerate(terms):
        h = md5(t.encode("utf-8")).hexdigest()
        b[i] = int(h[:15], 16) % n_buckets
        s[i] = int(h[15:30], 16) % n_subs
    return b, s


def salt_of_part(part_id: int, n_salts: int) -> int:
    """Salt of a SPIMI chunk — round-robin over the chunk partition id.

    A heavy term appears once per chunk partition, so assigning each
    PARTITION's row to salt ``part_id % n_salts`` spreads every heavy
    term's rows evenly across salts BY CONSTRUCTION (a hash of the row
    would be a luck-of-the-draw split at small partition counts). Streams
    stay doc-disjoint because partitions are doc-disjoint. The salt is
    constant per chunk FILE, so a heavy-group merge task prunes to its
    salt's files outright — zero read amplification."""
    return int(part_id) % n_salts
