#!/usr/bin/env python
"""Per-round benchmark: index-build throughput at two parallelism levels +
BM25 query latency over the built index.

Prints ONE JSON line:
  {"metric": "index_build_wall_sec", "value": <sec at full cpus>,
   "unit": "sec", "sf": <sf>, "queries": {"q<id>": sec, ...},
   "turns_per_sec": ..., "turns_per_sec_low": ..., "cpus": ...,
   "cpus_low": ..., "scaling_efficiency": ..., "p50_ms": ..., "p99_ms": ...}

The two-cluster-size criterion of BASELINE.json (N vs 4N executors) is
evidenced per the driver's instruction by running the SAME build on the
SAME input at local[cpus/4] and local[cpus]: scaling_efficiency =
(thr_high / thr_low) / 4. Each phase runs in its own subprocess so every
measurement gets a fresh JVM. Results are also appended to BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CPUS_LOW = max(2, CPUS // 4)


def _index_dir(tag: str, cpus: int) -> str:
    return os.path.join(REPO, "data", "index", f"bench-{tag}-cpus{cpus}")


def phase_build(cpus: int, out_path: str) -> None:
    sys.path.insert(0, REPO)
    from sync2any_spark.generator import ensure_transcripts, sf_tag
    from sync2any_spark.index.builder import build_index
    from sync2any_spark.session import get_spark

    tag = sf_tag(SF_DIR)
    src = ensure_transcripts(tag)
    idx = _index_dir(tag, cpus)
    shutil.rmtree(idx, ignore_errors=True)
    # the JOB is identical at every parallelism level (same partition
    # counts, same shuffle width) — only the executor-thread count varies,
    # mirroring "same job, N vs 4N executors"
    spark = get_spark(f"bench_build_c{cpus}", cpus=cpus, shuffle_partitions=64)
    transcripts = spark.read.parquet(src)
    t0 = time.time()
    summary = build_index(
        spark,
        transcripts,
        idx,
        n_partitions=64,
        n_buckets=32,
        n_salts=8,
        heavy_df_threshold=20_000,
        resume=False,
    )
    wall = time.time() - t0
    with open(out_path, "w") as f:
        json.dump(
            {"wall_s": wall, "n_docs": summary["n_docs"], "tag": tag, "cpus": cpus},
            f,
        )
    spark.stop()


def phase_query(cpus: int, out_path: str) -> None:
    sys.path.insert(0, REPO)
    import pyarrow.parquet as pq

    from sync2any_spark.generator import ensure_queries, sf_tag
    from sync2any_spark.query.wand import IndexSearcher
    from sync2any_spark.session import get_spark

    tag = sf_tag(SF_DIR)
    idx = _index_dir(tag, cpus)
    spark = get_spark(f"bench_query_c{cpus}", cpus=cpus, shuffle_partitions=cpus)
    searcher = IndexSearcher(spark, idx, cache=True)
    queries = pq.read_table(ensure_queries()).to_pandas()
    searcher.search("ok w0000", 10)  # warm the scan paths once
    lat: dict[str, float] = {}
    for q in queries.itertuples(index=False):
        t0 = time.time()
        searcher.search(q.query_text, int(q.k))
        lat[f"q{q.query_id}"] = time.time() - t0
    with open(out_path, "w") as f:
        json.dump(lat, f)
    spark.stop()


def _run_phase(phase: str, cpus: int) -> dict:
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        out = tf.name
    env = dict(os.environ)
    # Pin the WHOLE process tree (JVM + GC threads + python workers) to
    # `cpus` cores. local[N] alone only caps task slots — background JVM
    # threads and python workers would still use every core, inflating the
    # low-parallelism baseline and corrupting the N-vs-4N efficiency number.
    cmd = [sys.executable, os.path.abspath(__file__), phase, str(cpus), out]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    subprocess.run(
        cmd,
        check=True,
        env=env,
        cwd=REPO,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    with open(out) as f:
        return json.load(f)


def main() -> None:
    from sync2any_spark.generator import ensure_transcripts, sf_tag

    tag = sf_tag(SF_DIR)
    ensure_transcripts(tag)  # generate once, outside the timed phases

    low = _run_phase("build", CPUS_LOW)
    high = _run_phase("build", CPUS)
    lat = _run_phase("query", CPUS)

    n_docs = high["n_docs"]
    thr_low = n_docs / low["wall_s"]
    thr_high = n_docs / high["wall_s"]
    eff = (thr_high / thr_low) / (CPUS / CPUS_LOW)
    lats = sorted(lat.values())
    p50 = lats[len(lats) // 2] * 1000
    p99 = lats[min(len(lats) - 1, int(len(lats) * 0.99))] * 1000

    result = {
        "metric": "index_build_wall_sec",
        "value": round(high["wall_s"], 3),
        "unit": "sec",
        "sf": float(tag[2:]),
        "queries": {k: round(v, 4) for k, v in sorted(lat.items(), key=lambda kv: int(kv[0][1:]))},
        "n_docs": n_docs,
        "cpus": CPUS,
        "cpus_low": CPUS_LOW,
        "turns_per_sec": round(thr_high, 1),
        "turns_per_sec_low": round(thr_low, 1),
        "scaling_efficiency": round(eff, 3),
        "query_p50_ms": round(p50, 2),
        "query_p99_ms": round(p99, 2),
    }
    line = json.dumps(result)

    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(
            f"\n## {stamp} — sf={tag} n_docs={n_docs}\n\n"
            f"| parallelism | build wall (s) | turns/sec |\n|---|---|---|\n"
            f"| local[{CPUS_LOW}] | {low['wall_s']:.1f} | {thr_low:.0f} |\n"
            f"| local[{CPUS}] | {high['wall_s']:.1f} | {thr_high:.0f} |\n\n"
            f"Scaling efficiency local[{CPUS_LOW}]→local[{CPUS}]: **{eff:.3f}** "
            f"(target ≥ 0.8 per BASELINE.json)\n\n"
            f"Query latency over {len(lats)} reference queries (block-max WAND, "
            f"warm): p50 {p50:.1f} ms, p99 {p99:.1f} ms\n"
        )
    print(line)


if __name__ == "__main__":
    if len(sys.argv) == 4 and sys.argv[1] in ("build", "query"):
        fn = phase_build if sys.argv[1] == "build" else phase_query
        fn(int(sys.argv[2]), sys.argv[3])
    else:
        main()
