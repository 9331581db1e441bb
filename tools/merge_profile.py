#!/usr/bin/env python
"""Profile the salted postings merge in isolation at a given parallelism.

Replays build_postings_direct's pipeline against an existing chunks dir and
prints per-(bucket,sub,salt) group wall_ms plus the stage wall, so N-vs-4N
merge scaling can be decomposed into (task skew, substrate, overhead).

Usage: taskset -c 0-N python tools/merge_profile.py <index_dir> <cpus> [out_json]
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    idx, cpus = sys.argv[1], int(sys.argv[2])
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    from sync2any_spark.session import get_spark
    from sync2any_spark.index.builder import (
        IndexPaths, _postings_writer, _salted_chunks, build_term_stats_driver,
    )
    import pyarrow.dataset as ds

    spark = get_spark(f"merge_prof_c{cpus}", cpus=cpus, shuffle_partitions=96)
    paths = IndexPaths(idx)
    st = ds.dataset(paths.stats).to_table().to_pandas().iloc[0]
    avgdl = float(st.avgdl)
    terms_pdf = build_term_stats_driver(paths.chunks, 32)
    terms = spark.createDataFrame(
        terms_pdf[terms_pdf["df"] > 20_000],
        schema="term string, df long, cf long, bucket int",
    )
    out_dir = f"/dev/shm/merge_prof_c{cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    # warmup (JIT) on a small slice? keep one full run warm then timed run
    for rnd in range(2):
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir)
        t0 = time.time()
        salted = _salted_chunks(spark, paths.chunks, terms, 32, 8, 20_000,
                                "part-*.parquet")
        man = salted.groupBy("bucket", "sub", "salt").applyInPandas(
            _postings_writer(avgdl, out_dir),
            schema="bucket int, sub int, salt int, n_blocks long, wall_ms long",
        ).toPandas()
        wall = time.time() - t0
        tag = "warm" if rnd else "cold"
        res = {
            "cpus": cpus, "pass": tag, "stage_wall_s": round(wall, 2),
            "n_groups": len(man),
            "sum_task_ms": int(man.wall_ms.sum()),
            "max_group_ms": int(man.wall_ms.max()),
            "p99_group_ms": int(man.wall_ms.quantile(0.99)),
            "p50_group_ms": int(man.wall_ms.quantile(0.5)),
            "top10": man.nlargest(10, "wall_ms")[
                ["bucket", "sub", "salt", "n_blocks", "wall_ms"]
            ].to_dict("records"),
        }
        print(json.dumps(res))
        if out_json and rnd:
            with open(out_json, "w") as f:
                json.dump(res, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
