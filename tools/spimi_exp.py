#!/usr/bin/env python
"""SPIMI-stage experiment harness: isolate the local[32] regression.

Runs ONLY the SPIMI chunk pass (docs store pre-built, read from disk) under
one configuration per subprocess invocation, printing a JSON line with the
wall time. Drive it from run_spimi_matrix() below or the CLI:

    python tools/spimi_exp.py CPUS N_PARTITIONS SHUFFLE COMPRESSION TOKENIZER

Not part of the engine — a measurement tool (BENCH.md methodology).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS = os.path.join(REPO, "data", "index", "bench-sf0.1x4-cpus32", "docs")
SCRATCH = "/dev/shm/spimi-exp"


def run_one(cpus: int, n_partitions: int, shuffle: int, compression: str,
            tokenizer: str, gc: str = "default") -> None:
    os.environ["SPARK_GRAFT_CHUNK_COMPRESSION"] = compression
    from sync2any_spark.index.builder import build_chunks
    from sync2any_spark.session import get_spark

    extra = {}
    if gc == "parallel":
        extra["spark.driver.extraJavaOptions"] = "-XX:+UseParallelGC"
    spark = get_spark(
        f"spimi_exp_c{cpus}", cpus=cpus, shuffle_partitions=shuffle,
        extra_conf=extra,
    )
    docs = spark.read.parquet(DOCS)
    chunks_dir = os.path.join(SCRATCH, f"chunks-{os.getpid()}")
    shutil.rmtree(chunks_dir, ignore_errors=True)
    if tokenizer == "files":
        # prototype: one task per docs-store file, kernel reads parquet
        # directly (no shuffle, no Arrow transfer of the corpus)
        import pandas as pd
        from sync2any_spark.index.builder import (
            MANIFEST_SCHEMA, _chunk_builder_pandas,
        )

        files = sorted(
            os.path.join(DOCS, f) for f in os.listdir(DOCS)
            if f.endswith(".parquet")
        )
        rdd = spark.sparkContext.parallelize(
            [(i, p) for i, p in enumerate(files)], len(files)
        )
        flist = spark.createDataFrame(rdd, "part_id int, path string")
        inner = _chunk_builder_pandas(chunks_dir)

        def kern(batches):
            import pyarrow as pa
            import pyarrow.parquet as pq
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    sub = pq.read_table(
                        r.path, columns=["doc_id", "text", "dl"]
                    ).to_pandas()
                    sub["part_id"] = r.part_id
                    yield inner(sub)

        t0 = time.time()
        m = flist.mapInPandas(kern, schema=MANIFEST_SCHEMA)
    else:
        t0 = time.time()
        m = build_chunks(docs, chunks_dir, n_partitions, resume=False,
                         tokenizer=tokenizer)
    from pyspark.sql import functions as F
    agg = m.agg(
        F.count("*").alias("n"),
        F.sum("wall_ms").alias("sum_ms"),
        F.max("wall_ms").alias("max_ms"),
    ).first()
    wall = time.time() - t0
    print(json.dumps({"cpus": cpus, "n_partitions": n_partitions,
                      "shuffle": shuffle, "compression": compression,
                      "tokenizer": tokenizer, "gc": gc,
                      "built": agg.n, "wall_s": round(wall, 2),
                      "kernel_sum_s": round(agg.sum_ms / 1000, 2),
                      "kernel_max_s": round(agg.max_ms / 1000, 2)}))
    shutil.rmtree(chunks_dir, ignore_errors=True)
    spark.stop()


def main() -> None:
    cpus, n_parts, shuffle = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    compression, tokenizer = sys.argv[4], sys.argv[5]
    gc = sys.argv[6] if len(sys.argv) > 6 else "default"
    run_one(cpus, n_parts, shuffle, compression, tokenizer, gc)


if __name__ == "__main__":
    main()
