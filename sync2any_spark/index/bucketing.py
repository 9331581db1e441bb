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
