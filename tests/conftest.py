from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from sync2any_spark.session import get_spark

    s = get_spark("sync2any_tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_sf0001(spark):
    from sync2any_spark.generator import ensure_transcripts

    path = ensure_transcripts("sf0.001")
    return spark.read.parquet(path)
