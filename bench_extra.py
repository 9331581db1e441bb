#!/usr/bin/env python
"""Round-6 auxiliary benchmarks (bench.py is frozen for measurement; extra
evidence rows live here and are cited in OPTIMIZATION_r06.md).

Modes:
  python bench_extra.py qps_sweep <index_dir>
      Serving QPS at 1/2/4/8/16 client threads over the 50-query set, with
      per-leg (pruned / no-ids / exhaustive) counts — the r5 VERDICT #7
      "find the knee" row.
  python bench_extra.py sf1_cdc <index_dir>
      50k-row I/U/D apply + compact wall on an sf1-scale index (the r5
      VERDICT #5 CDC-at-scale validation; run after `bench.py validate`).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def qps_sweep(index_dir: str) -> None:
    import pyarrow.parquet as pq

    import sync2any_spark.query.serving as serving
    from sync2any_spark.generator import ensure_queries

    local = serving.LocalSearcher(index_dir)
    queries = pq.read_table(ensure_queries()).to_pandas()
    for q in queries.itertuples(index=False):  # warm
        local.search(q.query_text, int(q.k))

    # per-leg counters via wrappers (diagnostics only — no production code)
    legs = {"noids": 0, "pruned_scored": 0, "exhaustive": 0}
    orig_fast = serving.LocalSearcher._single_term_topk
    orig_par = serving.LocalSearcher._score_pairs_parallel

    def fast(self, w, g, k):
        r = orig_fast(self, w, g, k)
        if r is not None:
            legs["noids"] += 1
        return r

    def par(self, pairs, k):
        legs["exhaustive"] += 1
        return orig_par(self, pairs, k)

    serving.LocalSearcher._single_term_topk = fast
    serving.LocalSearcher._score_pairs_parallel = par

    from concurrent.futures import ThreadPoolExecutor

    out = {}
    for n_clients in (1, 2, 4, 8, 16):
        def client():
            for _ in range(2):
                for q in queries.itertuples(index=False):
                    local.search(q.query_text, int(q.k))
        with ThreadPoolExecutor(max_workers=n_clients) as ex:
            t0 = time.time()
            list(ex.map(lambda _: client(), range(n_clients)))
            dt = time.time() - t0
        out[f"qps_{n_clients}"] = round(n_clients * 2 * len(queries) / dt, 1)
    serving.LocalSearcher._single_term_topk = orig_fast
    serving.LocalSearcher._score_pairs_parallel = orig_par
    out["legs"] = legs
    print(json.dumps({"metric": "serving_qps_sweep", **out}))


def sf1_cdc(index_dir: str) -> None:
    import numpy as np
    import pyarrow.parquet as pq

    from sync2any_spark.generator import ensure_transcripts
    from sync2any_spark.session import get_spark
    from sync2any_spark.streaming.incremental import apply_increments, compact

    mult = int(os.environ.get("SPARK_GRAFT_VALIDATE_MULT", "80"))
    src = ensure_transcripts("sf0.1", mult)
    spark = get_spark("bench_extra_sf1", cpus=32, shuffle_partitions=96)
    # JIT/worker warmup (same methodology as the frozen bench's
    # incremental phase — a cold JVM's first pandas-UDF wave would
    # otherwise dominate the measured apply)
    from sync2any_spark.index.builder import build_index

    warm_src = ensure_transcripts("sf0.001", 1)
    warm_idx = "/dev/shm/bench-extra-warm"
    shutil.rmtree(warm_idx, ignore_errors=True)
    build_index(
        spark, spark.read.parquet(warm_src), warm_idx, n_partitions=8,
        n_buckets=4, resume=False, source_path=warm_src, span_mb=4,
    )
    wb = pq.read_table(warm_src).slice(0, 1000).to_pandas()
    wb["op"] = "U"
    wb["text"] = wb["text"] + " warm"
    apply_increments(
        spark, warm_idx,
        spark.createDataFrame(
            wb[["conv_id", "turn_idx", "op", "role", "text", "tool", "ts"]]
        ),
    )
    shutil.rmtree(warm_idx, ignore_errors=True)
    files = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    ) if os.path.isdir(src) else [src]
    head = pq.read_table(files[0]).slice(0, 50_000).to_pandas()
    m = len(head)
    third = m // 4
    head["op"] = np.array(
        ["U"] * (m - 2 * third) + ["D"] * third + ["I"] * third
    )
    ins = head["op"] == "I"
    head.loc[ins, "turn_idx"] = head.loc[ins, "turn_idx"] + 100_000
    nonce = f"x{os.getpid()}_{int(time.time())}"
    upd = head["op"] == "U"
    head.loc[upd, "text"] = head.loc[upd, "text"] + " " + nonce
    head.loc[ins, "text"] = head.loc[ins, "text"] + " " + nonce
    batch = spark.createDataFrame(
        head[["conv_id", "turn_idx", "op", "role", "text", "tool", "ts"]]
    )
    t0 = time.time()
    s = apply_increments(spark, index_dir, batch)
    apply_s = time.time() - t0
    cdir = index_dir + "-compacted"
    shutil.rmtree(cdir, ignore_errors=True)
    t0 = time.time()
    compact(spark, index_dir, cdir)
    compact_s = time.time() - t0
    shutil.rmtree(cdir, ignore_errors=True)
    print(json.dumps({
        "metric": "sf1_cdc",
        "sf1_apply_50k_wall_s": round(apply_s, 2),
        "sf1_apply_rows_per_sec": round(m / apply_s, 1),
        "sf1_apply_stages": s.get("stage_walls"),
        "sf1_compact_wall_s": round(compact_s, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    {"qps_sweep": qps_sweep, "sf1_cdc": sf1_cdc}[sys.argv[1]](sys.argv[2])
