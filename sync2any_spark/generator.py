"""Deterministic synthetic `transcripts` corpus + reference query set.

BASELINE.json's ``input_hint`` fixes the input shape:
``transcripts(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)`` with composite PK ``(conv_id, turn_idx)``
(the analog of the reference's mandatory-primary-key contract,
``extract/impl/MysqlMetaExtractImpl.java:160-172``). No transcripts table
ships in /root/testdata, so this module synthesizes one — a pure function
of (sf) with seed 42, written once under DATA_ROOT so the Spark engine and
the DuckDB oracle read the identical parquet file.

Skew/edge spec follows FIXTURES.md F1:
- Zipf(1.1) vocabulary of 5,000 types; turn length Uniform(3,120);
- one pathological term (``ok``) in ~30% of turns, 10 hot terms ~5% each
  (exercises the salted merge, SURVEY.md §2.B B3);
- ~2% CJK spans + JSON punctuation, ~0.5% empty text, duplicate texts,
  1-turn and 500-turn conversations;
- ts strictly increasing inside a conversation (UTC).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DATA_ROOT = os.environ.get("SYNC2ANY_DATA_ROOT", "/root/repo/data")

SEED = 42
VOCAB_SIZE = 5000
HOT_TERM = "ok"
HOT10 = [f"hot{i}" for i in range(10)]
CJK_SPANS = ["中文测试", "数据引擎", "こんにちは", "검색엔진", "索引构建"]
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["bash", "read", "search", "edit", "grep"]

N_CONVS = {"sf0.001": 200, "sf0.01": 2000, "sf0.1": 20000}


def _vocab() -> list[str]:
    return [f"w{i:04d}" for i in range(VOCAB_SIZE)]


def generate_transcripts(
    sf: str, mult: int = 1, conv_start: int = 0, seed: int = SEED
) -> "pa.Table":
    """Build the corpus for a scale factor tag ('sf0.001'|'sf0.01'|'sf0.1').

    ``mult`` scales the conversation count (bench corpora: the same seeded
    generator, more conversations — used so throughput measurements are
    compute-bound rather than job-latency-bound). ``conv_start``/``seed``
    support chunked generation of the large validation corpora: chunk i
    covers conversations [i*n, (i+1)*n) with its own rng stream, so chunks
    generate in parallel processes yet the corpus stays a pure function of
    (sf, mult)."""
    n_convs = N_CONVS[sf] * mult
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())

    # Zipf ranks over the vocabulary (bounded zipf via normalized weights —
    # np.random.zipf is unbounded, we need exactly VOCAB_SIZE types).
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    zipf_p = ranks ** -1.1
    zipf_p /= zipf_p.sum()

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    base_ts = np.datetime64("2026-01-01T00:00:00", "us")

    for c0 in range(n_convs):
        c = conv_start + c0
        conv = f"conv_{c:08d}"
        if c == 0:
            n_turns = 1
        elif c == 1:
            n_turns = 500
        else:
            n_turns = int(rng.integers(4, 21))
        ts = base_ts + np.timedelta64(int(c) * 3_600_000_000, "us")
        for t in range(n_turns):
            n_tok = int(rng.integers(3, 121))
            words = list(vocab[rng.choice(VOCAB_SIZE, size=n_tok, p=zipf_p)])
            if rng.random() < 0.30:
                words.insert(int(rng.integers(0, len(words) + 1)), HOT_TERM)
            for h in HOT10:
                if rng.random() < 0.05:
                    words.insert(int(rng.integers(0, len(words) + 1)), h)
            text = " ".join(words)
            u = rng.random()
            if u < 0.005:
                text = ""
            elif u < 0.025:
                span = CJK_SPANS[int(rng.integers(0, len(CJK_SPANS)))]
                text = f'{text} {span} {{"status": "done"}}'
            elif u < 0.035 and texts:
                text = texts[int(rng.integers(0, len(texts)))]  # duplicate
            role = ROLES[t % 2] if rng.random() < 0.9 else ROLES[int(rng.integers(2, 4))]
            tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else ""
            ts = ts + np.timedelta64(int(rng.integers(1, 30)) * 1_000_000, "us")
            conv_ids.append(conv)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(ts)

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(np.array(tss, dtype="datetime64[us]")),
        }
    )


def generate_queries() -> "pa.Table":
    """F2 reference query set: 50 queries over the synthetic vocabulary."""
    rng = np.random.default_rng(SEED + 1)
    vocab = _vocab()
    rows: list[tuple[int, str, int]] = []
    qid = 0

    def add(q: str, k: int = 10) -> None:
        nonlocal qid
        qid += 1
        rows.append((qid, q, k))

    add(HOT_TERM)                      # the pathological term
    add(HOT_TERM, k=100)
    for h in HOT10[:4]:
        add(h)
    add("w0000")                       # most common zipf term
    add("w0001 w0002")
    add(f"w0003 {HOT_TERM}")
    add("w0000", k=1)
    add("zzzzmissing")                 # absent term → empty result
    add("w0000 zzzzmissing")
    add("中")                          # CJK unigram
    add("中 文")
    for _ in range(20):                # random common terms
        i = int(rng.integers(0, 200))
        add(vocab[i], k=int(rng.choice([1, 10, 100])))
    for _ in range(10):                # random rare terms
        i = int(rng.integers(3000, VOCAB_SIZE))
        add(vocab[i])
    for _ in range(6):                 # multi-term
        idx = rng.integers(0, 1000, size=int(rng.integers(2, 6)))
        add(" ".join(vocab[i] for i in idx))

    qids, qtexts, ks = zip(*rows)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int32()),
            "query_text": pa.array(qtexts, pa.string()),
            "k": pa.array(ks, pa.int32()),
        }
    )


def transcripts_path(sf: str, mult: int = 1) -> str:
    tag = sf if mult == 1 else f"{sf}x{mult}"
    return os.path.join(DATA_ROOT, "transcripts", tag, "transcripts.parquet")


def queries_path() -> str:
    return os.path.join(DATA_ROOT, "queries", "queries.parquet")


def sf_tag(sf_dir: str) -> str:
    """Map a driver sf_dir like /root/testdata/sf0.01 → 'sf0.01'."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    return tag if tag in N_CONVS else "sf0.01"


# Corpus parquet row-group size. Row groups are the atomic split unit for
# both Spark's scan planner and the fused build's span planner; 2048-row
# groups (~0.7 MB uncompressed here) let the span planner cut cache-resident
# fused tasks and give small corpora enough spans to take the one-pass
# fused path at all (guide §6: file layout determines reader parallelism).
# A real 100 TB source has many files and doesn't need this.
ROW_GROUP_ROWS = 2048


def _layout_current(path: str) -> bool:
    """True when an existing corpus file/dir already uses the current
    row-group layout (one cheap footer read); stale layouts regenerate so
    span planning sees the intended granularity."""
    try:
        probe = path
        if os.path.isdir(path):
            names = sorted(n for n in os.listdir(path) if n.endswith(".parquet"))
            if not names:
                return False
            probe = os.path.join(path, names[0])
        md = pq.ParquetFile(probe).metadata
        if md.num_rows == 0:
            return True
        return md.row_group(0).num_rows <= ROW_GROUP_ROWS
    except Exception:
        return False


def _write_chunk(args: tuple) -> None:
    """Worker for chunked corpus generation (module-level: picklable)."""
    sf, chunk_mult, conv_start, seed, out = args
    pq.write_table(
        generate_transcripts(sf, chunk_mult, conv_start=conv_start, seed=seed),
        out,
        compression="zstd",
        row_group_size=ROW_GROUP_ROWS,
    )


def ensure_transcripts(sf: str, mult: int = 1) -> str:
    """Generate-if-missing; returns the parquet path (idempotent, seeded).

    ``mult`` ≤ 16 writes the single file the small-corpus paths expect.
    Larger multipliers (the sf1-scale validation corpus ≈ 19M docs) write a
    DIRECTORY of chunk files — generated in parallel processes, conv-id
    ranges disjoint and ascending with the lexical file order, so the
    sorted-source fast path and the DuckDB oracle both read it exactly like
    the single file."""
    path = transcripts_path(sf, mult)
    if os.path.exists(path) and _layout_current(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if mult <= 16:
        tmp = path + ".tmp"
        pq.write_table(
            generate_transcripts(sf, mult), tmp, compression="zstd",
            row_group_size=ROW_GROUP_ROWS,
        )
        os.replace(tmp, path)
        return path
    from concurrent.futures import ProcessPoolExecutor

    chunk_mult = 8
    if mult % chunk_mult:
        raise ValueError(f"large mult must be a multiple of {chunk_mult}")
    n_chunks = mult // chunk_mult
    per = N_CONVS[sf] * chunk_mult
    tmpdir = path + ".tmpdir"
    import shutil

    shutil.rmtree(tmpdir, ignore_errors=True)
    os.makedirs(tmpdir)
    jobs = [
        (
            sf,
            chunk_mult,
            i * per,
            SEED + 1_000_003 * i,
            os.path.join(tmpdir, f"chunk-{i:04d}.parquet"),
        )
        for i in range(n_chunks)
    ]
    with ProcessPoolExecutor(max_workers=min(8, n_chunks)) as ex:
        list(ex.map(_write_chunk, jobs))
    shutil.rmtree(path, ignore_errors=True)  # stale-layout dir, if any
    os.replace(tmpdir, path)
    return path


def ensure_queries() -> str:
    path = queries_path()
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(generate_queries(), tmp, compression="zstd")
        os.replace(tmp, path)
    return path
