"""Training-data pipeline operators: dedup, similarity, multimodal, textstats."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_exact_duplicates_detects_planted(spark):
    from sync2any_spark.pipeline.dedup import exact_duplicates

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other"), (4, "same text")],
        "doc_id long, text string",
    )
    rows = exact_duplicates(df, "doc_id").collect()
    assert len(rows) == 1
    assert rows[0].n_dups == 3 and rows[0].keep_id == 1


def test_minhash_finds_near_duplicates(spark):
    from sync2any_spark.pipeline.dedup import lsh_candidate_pairs, minhash_signatures

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base.replace("kappa", "lambda")  # 1-word change
    far = "completely different words with nothing shared at all here now"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    sig = minhash_signatures(df, "doc_id", h=12)
    pairs = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sig, "doc_id").collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_exact_value(spark):
    from sync2any_spark.pipeline.dedup import ngram_jaccard_pairs

    a = "w1 w2 w3 w4"  # shingles: {w1 w2 w3, w2 w3 w4}
    b = "w1 w2 w3 w5"  # shingles: {w1 w2 w3, w2 w3 w5} → jaccard 1/3
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    rows = ngram_jaccard_pairs(df, "doc_id", threshold=0.1).collect()
    assert len(rows) == 1
    assert rows[0].jaccard == pytest.approx(1 / 3, abs=1e-6)


def test_simhash_similar_docs_close(spark):
    from sync2any_spark.pipeline.dedup import simhash

    base = " ".join(f"tok{i}" for i in range(50))
    near = base.replace("tok3 ", "tokX ")
    far = " ".join(f"other{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    sig = {r.doc_id: r.simhash for r in simhash(df, "doc_id").collect()}
    d12 = bin(sig[1] ^ sig[2]).count("1")
    d13 = bin(sig[1] ^ sig[3]).count("1")
    assert d12 < d13
    assert d12 <= 6  # near-dup → small Hamming distance


def test_ann_recall_vs_brute_force(embeddings):
    from sync2any_spark.pipeline.similarity import cosine_topk, rp_lsh_topk

    emb = embeddings
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    rest = emb.where(F.col("vec_id") != 0)
    exact = [r.vec_id for r in cosine_topk(rest, "vec_id", "embedding", qv, 10).collect()]
    approx = [
        r.vec_id
        for r in rp_lsh_topk(
            rest, "vec_id", "embedding", qv, dim=64, k=10,
            n_planes=6, multiprobe=2,
        ).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (exact, approx)


def test_neardup_lsh_equals_exact_crossjoin(embeddings):
    """The scale-shape pair finder (banded LSH propose → exact verify) must
    return exactly the all-pairs oracle's result on the reference dataset —
    the crossJoin form survives only as this test's oracle (VERDICT.md
    What's-wrong #1)."""
    from sync2any_spark.pipeline.similarity import neardup_pairs, neardup_pairs_lsh

    exact = {
        (r.id_a, r.id_b, r.cos)
        for r in neardup_pairs(embeddings, "vec_id", "embedding", 0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b, r.cos)
        for r in neardup_pairs_lsh(
            embeddings, "vec_id", "embedding", dim=64, threshold=0.5,
            bands=128, rows_per_band=12, seed=7, min_recall=0.0,
        ).collect()
    }
    assert exact and lsh == exact


def test_ngram_jaccard_candidates_equals_unrestricted(documents):
    """Candidate-verified Jaccard (MinHash-LSH propose) equals the raw
    self-join on the reference corpus (VERDICT.md What's-wrong #2)."""
    from sync2any_spark.pipeline.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    raw = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(documents, "doc_id", threshold=0.2).collect()
    }
    cand = lsh_candidate_pairs(
        minhash_signatures(documents, "doc_id", h=12), "doc_id", h=12, bands=4
    )
    verified = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(
            documents, "doc_id", threshold=0.2, candidates=cand,
            candidate_bands=4, candidate_rows=3, min_recall=0.0,
        ).collect()
    }
    assert raw and verified == raw


def test_ann_probes_fewer_rows(embeddings):
    from sync2any_spark.pipeline.similarity import rp_lsh_buckets

    buckets = rp_lsh_buckets(embeddings, "vec_id", "embedding", dim=64, n_planes=6)
    sizes = buckets.groupBy("bucket").count().collect()
    # hashing actually partitions the space (not one giant bucket)
    assert len(sizes) > 8
    assert max(r["count"] for r in sizes) < embeddings.count() / 2


def test_ivf_recall_and_pruning(embeddings):
    from sync2any_spark.pipeline.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_fit,
        ivf_topk,
    )

    emb = embeddings
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    rest = emb.where(F.col("vec_id") != 0)
    centroids = ivf_fit(rest, "vec_id", "embedding", dim=64, n_centroids=8, n_iters=4)
    assert centroids.shape == (8, 64)
    # clusters genuinely partition the data
    sizes = ivf_assign(rest, "vec_id", "embedding", centroids).groupBy("cluster").count()
    counts = {r.cluster: r["count"] for r in sizes.collect()}
    assert sum(counts.values()) == rest.count()
    assert len(counts) >= 4
    exact = [r.vec_id for r in cosine_topk(rest, "vec_id", "embedding", qv, 10).collect()]
    approx = [
        r.vec_id
        for r in ivf_topk(rest, "vec_id", "embedding", qv, centroids, 10, n_probe=4).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (exact, approx)


def test_ivf_deterministic(embeddings):
    from sync2any_spark.pipeline.similarity import ivf_fit

    emb = embeddings.where(F.col("vec_id") != 0)
    a = ivf_fit(emb, "vec_id", "embedding", dim=64, n_centroids=4, n_iters=2)
    b = ivf_fit(emb, "vec_id", "embedding", dim=64, n_centroids=4, n_iters=2)
    assert np.allclose(a, b)


def test_multimodal_decode_schema_and_determinism(documents, spark):
    from sync2any_spark.pipeline.multimodal import attach_blob, decode_images

    blobs = attach_blob(documents.limit(50), "doc_id")
    out = decode_images(blobs).toPandas().sort_values("doc_id")
    assert list(out.columns) == [
        "doc_id", "width", "height", "channels", "n_bytes", "features",
    ]
    assert len(out) == 50
    assert (out["channels"] == 3).all()
    assert all(len(f) == 8 for f in out["features"])
    out2 = decode_images(blobs).toPandas().sort_values("doc_id")
    assert (out["width"].values == out2["width"].values).all()


def test_multimodal_real_decode_rejects_non_images(documents):
    """fake=False is a REAL decoder now: garbage bytes (utf-8 text) must be
    rejected by magic-byte dispatch, not silently pseudo-decoded."""
    from sync2any_spark.pipeline.multimodal import attach_blob, decode_images

    blobs = attach_blob(documents.limit(5), "doc_id")
    with pytest.raises(Exception, match="unsupported image magic"):
        decode_images(blobs, fake=False).collect()


def _spec_literal_bmp():
    """2×2 24-bit BMP assembled byte-by-byte from the public spec (NOT via
    encode_bmp — guards against an encoder/decoder bug cancelling out).
    Pixels (RGB): (0,0)=(1,2,3) (0,1)=(4,5,6) / (1,0)=(7,8,9) (1,1)=(10,11,12).
    Rows are bottom-up, BGR, padded to 4 bytes (2·3=6 → stride 8)."""
    import struct

    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + 16, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0)
    row_bottom = bytes([9, 8, 7, 12, 11, 10, 0, 0])  # y=1: BGR BGR pad
    row_top = bytes([3, 2, 1, 6, 5, 4, 0, 0])        # y=0
    return header + info + row_bottom + row_top


def test_bmp_decode_spec_literal():
    import numpy as np

    from sync2any_spark.pipeline.imagecodec import decode_bmp

    img = decode_bmp(_spec_literal_bmp())
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [1, 2, 3]
    assert img[0, 1].tolist() == [4, 5, 6]
    assert img[1, 0].tolist() == [7, 8, 9]
    assert img[1, 1].tolist() == [10, 11, 12]
    assert img.dtype == np.uint8


def test_png_decode_spec_literal():
    """Hand-assembled PNG (stdlib struct+zlib, filters 0/1/2 on successive
    scanlines) — validates inflate + unfilter against the public spec."""
    import struct
    import zlib

    import numpy as np

    from sync2any_spark.pipeline.imagecodec import decode_png

    w, h = 3, 3
    px = (np.arange(w * h * 3) * 7 % 256).astype(np.uint8).reshape(h, w, 3)
    raw = bytearray()
    # y0: filter 0 (None); y1: filter 2 (Up); y2: filter 1 (Sub)
    raw += b"\x00" + px[0].tobytes()
    raw += b"\x02" + ((px[1].astype(int) - px[0].astype(int)) % 256).astype(
        np.uint8
    ).tobytes()
    line2 = px[2].reshape(-1).astype(int)
    prev = np.concatenate([[0, 0, 0], line2[:-3]])
    raw += b"\x01" + ((line2 - prev) % 256).astype(np.uint8).tobytes()

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    img = decode_png(png)
    assert img.shape == (h, w, 3)
    assert (img == px).all()


def test_ppm_decode_and_bmp_roundtrip():
    import numpy as np

    from sync2any_spark.pipeline.imagecodec import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()
    ppm = b"P6\n7 5\n255\n" + img.tobytes()
    assert (decode_ppm(ppm) == img).all()


def test_real_decode_closed_form(documents, spark):
    """attach_image_blob → real BMP decode: features match the pixel
    closed form (the contract-row invariant)."""
    from sync2any_spark.pipeline.multimodal import attach_image_blob, decode_images

    blobs = attach_image_blob(documents.limit(8), "doc_id")
    rows = decode_images(blobs, fake=False).collect()
    assert len(rows) == 8
    for r in rows:
        assert (r.width, r.height, r.channels, r.n_bytes) == (8, 8, 3, 246)
        i = r.doc_id
        assert int(r.features[3]) == (i * 7) % 256          # pixel(0,0) R
        assert int(r.features[4]) == (i * 7 + 11) % 256     # pixel(0,0) G
        exp_mean_r = sum(
            (i * 7 + x * 5 + y * 3) % 256 for x in range(8) for y in range(8)
        ) / 64
        assert abs(r.features[0] - exp_mean_r) < 1e-3


def test_frame_sampling(documents):
    from sync2any_spark.pipeline.multimodal import attach_blob, sample_frames

    blobs = attach_blob(documents.limit(10), "doc_id")
    frames = sample_frames(blobs, every_n_bytes=64).toPandas()
    meta = blobs.select("doc_id", F.octet_length("blob").alias("n")).toPandas()
    expected = int(np.ceil(meta["n"] / 64).sum())
    assert len(frames) == expected
    assert (frames.groupby("doc_id")["frame_idx"].min() == 0).all()


def test_langid_on_planted_texts(spark):
    from sync2any_spark.pipeline.textstats import language_id

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog in a house"),
            (2, "el perro y la casa de los gatos"),
            (3, "der hund und die katze ist nicht da"),
            (4, "xyzzy plugh qwerty"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_pred for r in language_id(df, "doc_id").collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_langid_script_detection(spark):
    """Script stage: kana→ja, hangul→ko, han→zh (kana beats han for mixed
    Japanese text); Latin text falls through to the stopword vote."""
    from sync2any_spark.pipeline.textstats import language_id

    df = spark.createDataFrame(
        [
            (1, "日本語のテキストです"),          # han + kana → ja
            (2, "검색엔진 결과"),                 # hangul → ko
            (3, "中文测试文本"),                  # han only → zh
            (4, "the cat sat on the mat and it was good"),  # en stopwords
            (5, "el perro y el gato en la casa"),           # es stopwords
            (6, "xyzzy plugh"),                             # no evidence → und
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_pred for r in language_id(df, "doc_id").collect()}
    assert got == {1: "ja", 2: "ko", 3: "zh", 4: "en", 5: "es", 6: "und"}


def test_winnowing_fingerprints_overlap(spark):
    from sync2any_spark.pipeline.textstats import fingerprints

    base = " ".join(f"w{i}" for i in range(40))
    shifted = "zzz " + base  # winnowing is robust to prefix shifts
    other = " ".join(f"q{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, shifted), (3, other)], "doc_id long, text string"
    )
    fps = fingerprints(df, "doc_id").toPandas()
    s1 = set(fps[fps.doc_id == 1].fp)
    s2 = set(fps[fps.doc_id == 2].fp)
    s3 = set(fps[fps.doc_id == 3].fp)
    assert len(s1 & s2) / len(s1 | s2) > 0.6
    assert not (s1 & s3)


def test_recall_guard_property_grid(spark, documents):
    """Recall guard (round-2 What's-wrong #4): over a (threshold, bands,
    rows) grid, configurations whose banding recall at the threshold falls
    below min_recall must RAISE; safe ones must pass. The analytic recall
    is cross-checked against a direct Monte-Carlo-free evaluation of the
    S-curve identity."""
    import pytest as _pytest

    from sync2any_spark.pipeline.dedup import (
        check_candidate_recall,
        lsh_recall,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    for threshold in (0.1, 0.2, 0.5, 0.8, 0.95):
        for bands, rows in ((4, 3), (8, 2), (16, 1), (2, 8)):
            r = lsh_recall(threshold, bands, rows)
            assert r == _pytest.approx(1 - (1 - threshold**rows) ** bands)
            assert 0.0 <= r <= 1.0
            if r < 0.9:
                with _pytest.raises(ValueError, match="recall"):
                    check_candidate_recall(threshold, bands, rows, 0.9, "t")
            else:
                assert check_candidate_recall(
                    threshold, bands, rows, 0.9, "t"
                ) == _pytest.approx(r)
    # recall is monotone in bands, anti-monotone in rows
    assert lsh_recall(0.5, 8, 3) > lsh_recall(0.5, 4, 3)
    assert lsh_recall(0.5, 4, 2) > lsh_recall(0.5, 4, 3)

    # the guard fires end-to-end through the public API
    cand = lsh_candidate_pairs(
        minhash_signatures(documents, "doc_id", h=12), "doc_id", h=12, bands=4
    )
    with _pytest.raises(ValueError, match="recall"):
        ngram_jaccard_pairs(
            documents, "doc_id", threshold=0.2, candidates=cand,
            candidate_bands=4, candidate_rows=3,  # default min_recall=0.9
        )
    # and the sign-LSH guard too
    from sync2any_spark.pipeline.similarity import neardup_pairs_lsh

    emb = spark.createDataFrame(
        [(1, [1.0] * 4)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="recall"):
        neardup_pairs_lsh(emb, "vec_id", "embedding", dim=4,
                          threshold=0.5, bands=4, rows_per_band=12)


def test_video_codec_roundtrip_and_sampling(spark):
    """AVI container codec (videocodec): encode→decode is the identity for
    random RGB frames incl. odd widths (stride padding); frame sampling
    honors every_n; garbage and compressed streams are rejected loudly —
    sample_frames(fake=False) is a REAL decoder (round-2 Missing #4)."""
    import numpy as np

    from sync2any_spark.pipeline.multimodal import sample_frames
    from sync2any_spark.pipeline.videocodec import (
        decode_avi_frames,
        encode_avi_raw,
        parse_avi,
    )

    rng = np.random.default_rng(3)
    for h, w, n in ((6, 8, 3), (5, 7, 2), (1, 1, 1)):
        frames = [rng.integers(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(n)]
        blob = encode_avi_raw(frames, fps=10)
        meta, out = decode_avi_frames(blob)
        assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, n)
        assert all(np.array_equal(img, f) for (_, img), f in zip(out, frames))
    frames = [rng.integers(0, 256, (4, 4, 3)).astype(np.uint8) for _ in range(5)]
    _, sampled = decode_avi_frames(encode_avi_raw(frames), every_n=2)
    assert [i for i, _ in sampled] == [0, 2, 4]

    with pytest.raises(ValueError, match="RIFF"):
        parse_avi(b"plain text, definitely not a container")
    h264 = bytearray(encode_avi_raw(frames))
    p = h264.find(b"vids") + 4
    h264[p : p + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        parse_avi(bytes(h264))

    # through the Spark operator: md5 over DECODED pixels, not raw bytes
    import hashlib

    blob = encode_avi_raw(frames[:2], fps=10)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, blob binary")
    rows = sorted(
        sample_frames(df, fake=False).collect(), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in rows] == [0, 1]
    assert rows[0].frame_md5 == hashlib.md5(frames[0].tobytes()).hexdigest()
    assert rows[0].n_bytes == frames[0].nbytes


def test_video_frame_features_closed_form(spark):
    """attach_video_blob pixels follow a closed form; the decoded per-frame
    channel means must equal the direct numpy evaluation of that form."""
    import numpy as np

    from sync2any_spark.pipeline.multimodal import (
        attach_video_blob,
        video_frame_features,
    )

    ids = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    got = {
        (r.doc_id, r.frame_idx): (r.mean_r, r.mean_g, r.mean_b, r.width, r.height)
        for r in video_frame_features(attach_video_blob(ids, "doc_id")).collect()
    }
    x = np.arange(8)[None, :, None]
    y = np.arange(6)[:, None, None]
    c = np.arange(3)[None, None, :]
    for i in range(7):
        n_frames = 2 + i % 3
        for f in range(n_frames):
            px = (i * 7 + f * 13 + x * 5 + y * 3 + c * 11) % 256
            mr, mg, mb, w, h = got[(i, f)]
            assert (w, h) == (8, 6)
            assert mr == pytest.approx(px[:, :, 0].mean(), abs=1e-6)
            assert mg == pytest.approx(px[:, :, 1].mean(), abs=1e-6)
            assert mb == pytest.approx(px[:, :, 2].mean(), abs=1e-6)
        assert (i, n_frames) not in got  # frame count honored


def test_ivf_fit_sample_deterministic_and_searchable(embeddings):
    """ivf_fit_sample (driver-sample Lloyd — the scale shape for quantizer
    fitting) is a pure function of the sample bytes, and ivf_topk over its
    centroids keeps ANN recall vs brute force."""
    from sync2any_spark.pipeline.similarity import (
        cosine_topk,
        ivf_fit_sample,
        ivf_topk,
    )

    pdf = embeddings.toPandas().sort_values("vec_id")
    pdf = pdf[pdf["vec_id"] != 0]
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    a = ivf_fit_sample(vecs, n_centroids=8, n_iters=4)
    b = ivf_fit_sample(vecs, n_centroids=8, n_iters=4)
    assert np.array_equal(a, b)
    assert a.shape == (8, 64)

    emb = embeddings
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    rest = emb.where(F.col("vec_id") != 0)
    exact = [r.vec_id for r in cosine_topk(rest, "vec_id", "embedding", qv, 10).collect()]
    approx = [
        r.vec_id
        for r in ivf_topk(rest, "vec_id", "embedding", qv, a, 10, n_probe=4).collect()
    ]
    assert len(set(exact) & set(approx)) / 10 >= 0.5


def test_jpeg_codec_and_mjpeg_avi(spark):
    """Baseline JPEG codec (pure numpy: markers, canonical Huffman, DC
    prediction, byte stuffing, dequant, IDCT, YCbCr): block-constant
    grayscale fixtures decode BIT-EXACTLY, color within the YCbCr rounding
    bound; lossless/arithmetic streams are rejected by SOF marker (and a
    baseline stream mislabeled progressive fails its scan-script check).
    MJPEG-in-AVI then decodes end-to-end through sample_frames(fake=False)."""
    import hashlib

    import numpy as np

    from sync2any_spark.pipeline.jpegcodec import decode_jpeg, encode_jpeg_blocks
    from sync2any_spark.pipeline.multimodal import sample_frames
    from sync2any_spark.pipeline.videocodec import (
        decode_avi_frames,
        encode_avi_mjpeg,
        parse_avi,
    )

    rng = np.random.default_rng(11)
    gray = np.repeat(
        np.repeat(rng.integers(0, 256, (3, 4)), 8, axis=0), 8, axis=1
    ).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_blocks(gray)), gray)

    color_frames = []
    for f in range(3):
        c = np.repeat(
            np.repeat(rng.integers(0, 256, (2, 2, 3)), 8, axis=0), 8, axis=1
        ).astype(np.uint8)
        color_frames.append(c)
    jpegs = [encode_jpeg_blocks(f) for f in color_frames]
    for jb, f in zip(jpegs, color_frames):
        out = decode_jpeg(jb)
        assert int(np.abs(out.astype(int) - f.astype(int)).max()) <= 1

    bad = bytearray(jpegs[0])
    i = bad.find(b"\xff\xc0")
    bad[i + 1] = 0xC3  # relabeled lossless: a baseline scan header carries
    with pytest.raises(ValueError, match="predictor"):  # ss=0 → no predictor
        decode_jpeg(bytes(bad))
    bad[i + 1] = 0xC7  # differential lossless — genuinely out of scope
    with pytest.raises(NotImplementedError, match="0xC7"):
        decode_jpeg(bytes(bad))
    bad[i + 1] = 0xC2  # baseline scan script is invalid as progressive
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg(bytes(bad))

    # a truncated scan surfaces as the codec's ValueError contract, never a
    # raw IndexError from inside the Huffman walk (round-3 ADVICE)
    for cut in (len(jpegs[0]) - 3, len(jpegs[0]) // 2):
        with pytest.raises(ValueError):
            decode_jpeg(jpegs[0][:cut])

    avi = encode_avi_mjpeg(jpegs, width=16, height=16, fps=5)
    meta = parse_avi(avi)
    assert meta["codec"] == "MJPG" and meta["n_frames"] == 3
    _, decoded = decode_avi_frames(avi)
    assert len(decoded) == 3
    for (idx, img), f in zip(decoded, color_frames):
        assert img.shape == f.shape
        assert int(np.abs(img.astype(int) - f.astype(int)).max()) <= 1

    # through the Spark operator: frame_md5 over decoded MJPEG pixels
    df = spark.createDataFrame([(7, bytearray(avi))], "doc_id long, blob binary")
    rows = sorted(sample_frames(df, fake=False).collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    assert rows[0].frame_md5 == hashlib.md5(decoded[0][1].tobytes()).hexdigest()


def test_jpeg_420_subsampling_and_image_dispatch(spark):
    """4:2:0 chroma subsampling (the MJPEG-camera shape): interleaved
    16x16 MCUs (4 Y + Cb + Cr) decode with nearest-neighbor chroma
    upsampling, exact on tile-constant fixtures; decode_image dispatches
    standalone JPEG payloads by magic; a 4:2:0 MJPEG AVI decodes
    end-to-end."""
    import numpy as np

    from sync2any_spark.pipeline.imagecodec import decode_image
    from sync2any_spark.pipeline.jpegcodec import decode_jpeg, encode_jpeg_blocks
    from sync2any_spark.pipeline.videocodec import decode_avi_frames, encode_avi_mjpeg

    rng = np.random.default_rng(13)
    tiles = rng.integers(0, 256, (2, 3, 3))
    img = np.repeat(np.repeat(tiles, 16, axis=0), 16, axis=1).astype(np.uint8)
    jb = encode_jpeg_blocks(img, subsampling="420")
    out = decode_jpeg(jb)
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1
    # magic dispatch through the image decoder
    via_dispatch = decode_image(jb)
    assert np.array_equal(via_dispatch, out)
    # 4:2:0 MJPEG inside the AVI container
    avi = encode_avi_mjpeg([jb, jb], width=img.shape[1], height=img.shape[0])
    meta, frames = decode_avi_frames(avi)
    assert meta["codec"] == "MJPG" and len(frames) == 2
    assert np.array_equal(frames[0][1], out)


def test_audio_codec_and_features(spark):
    """WAV/PCM codec (pure numpy): encode→decode identity for mono and
    stereo int16; non-PCM format tags rejected by name; the Spark
    audio-features operator matches a direct numpy evaluation of the
    closed-form fixture."""
    import numpy as np

    from sync2any_spark.pipeline.audiocodec import decode_wav, encode_wav
    from sync2any_spark.pipeline.multimodal import attach_audio_blob, audio_features

    rng = np.random.default_rng(21)
    mono = rng.integers(-32768, 32768, 777).astype(np.int16)
    meta, pcm = decode_wav(encode_wav(mono, 16000))
    assert meta["sample_rate"] == 16000 and meta["n_samples"] == 777
    assert np.array_equal(pcm.ravel(), mono.astype(np.int32))
    stereo = rng.integers(-32768, 32768, (300, 2)).astype(np.int16)
    m2, p2 = decode_wav(encode_wav(stereo))
    assert m2["channels"] == 2 and np.array_equal(p2, stereo.astype(np.int32))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"never a wav")
    bad = bytearray(encode_wav(mono))
    bad[bad.find(b"fmt ") + 8] = 0x55  # MP3-in-WAV — library-bound
    with pytest.raises(NotImplementedError, match="format tag 85"):
        decode_wav(bytes(bad))

    ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    got = {
        r.doc_id: r
        for r in audio_features(attach_audio_blob(ids, "doc_id")).collect()
    }
    for i in range(6):
        n = 800 + i % 5 * 160
        x = (((i * 7 + np.arange(n) * 13) % 65536) - 32768).astype(np.float64)
        r = got[i]
        assert r.n_samples == n and r.sample_rate == 8000
        assert r.duration_s == pytest.approx(n / 8000.0, abs=1e-6)
        assert r.mean_amp == pytest.approx(x.mean(), abs=1e-5)
        assert r.rms == pytest.approx(np.sqrt((x * x).mean()), abs=1e-5)


def test_audio_float_g711_extensible():
    """Round-4 WAV format coverage: IEEE-float roundtrip is bit-exact;
    G.711 µ-law/A-law decode equals the ITU-T G.711 segment expansion
    (monotonic over each law's positive codes, correct extremes, exact
    roundtrip through the real container); WAVE_FORMAT_EXTENSIBLE
    resolves through its SubFormat GUID."""
    import struct

    import numpy as np

    from sync2any_spark.pipeline.audiocodec import (
        _ALAW,
        _ULAW,
        decode_wav,
        encode_wav_float,
        encode_wav_g711,
    )

    rng = np.random.default_rng(31)
    # float32 roundtrip — bit-exact
    f = rng.standard_normal(513).astype(np.float32)
    meta, out = decode_wav(encode_wav_float(f, 44100))
    assert meta["tag"] == 3 and meta["bits"] == 32 and meta["sample_rate"] == 44100
    assert np.array_equal(out.ravel(), f.astype(np.float64))

    # G.711 LUT spec properties (derived, not copied: extremes + zero codes)
    assert _ULAW[0x00] == -32124 and _ULAW[0x80] == 32124  # ±max magnitude
    assert _ULAW[0xFF] == 0 and _ULAW[0x7F] == 0  # the two zero codes
    assert int(np.abs(_ULAW).max()) == 32124
    assert int(np.abs(_ALAW).max()) == 32256
    # each law covers positive and negative ranges symmetrically
    assert set(np.abs(_ULAW)) == set(np.abs(_ULAW * -1))
    # µ-law decode mirrors: code c and c^0x80 differ only in sign
    c = np.arange(256)
    assert np.array_equal(_ULAW[c], -_ULAW[c ^ 0x80])
    assert np.array_equal(_ALAW[c], -_ALAW[c ^ 0x80])

    # container roundtrip: payload codes expand through the LUT exactly
    codes = rng.integers(0, 256, 400).astype(np.uint8)
    for law, lut, tag in (("ulaw", _ULAW, 7), ("alaw", _ALAW, 6)):
        m, pcm = decode_wav(encode_wav_g711(codes, law))
        assert m["tag"] == tag and m["bits"] == 8
        assert np.array_equal(pcm.ravel(), lut[codes])

    # WAVE_FORMAT_EXTENSIBLE: tag 0xFFFE + SubFormat GUID → real format
    from sync2any_spark.pipeline.audiocodec import _wav_container

    fmt_body = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000, 1, 8)
        + struct.pack("<HHI", 22, 8, 0x4)  # cbSize, validBits, channelMask
        + struct.pack("<H", 7) + b"\x00" * 14  # SubFormat GUID, tag-first
    )
    m, pcm = decode_wav(_wav_container(fmt_body, codes.tobytes()))
    assert m["tag"] == 7 and np.array_equal(pcm.ravel(), _ULAW[codes])


def test_audio_ima_adpcm():
    """IMA/DVI ADPCM (WAV tag 0x11): the adaptive-delta recurrence is
    cross-checked BIT-IDENTICAL against the stdlib's independent DVI
    implementation (audioop, same public spec); the WAV container
    roundtrip tracks a smooth signal within quantizer error, carries
    block-header samples verbatim, and trims last-block padding via the
    'fact' chunk."""
    import numpy as np

    from sync2any_spark.pipeline.audiocodec import (
        _ima_decode_nibbles,
        decode_wav,
        encode_wav_ima_adpcm,
    )

    rng = np.random.default_rng(5)
    try:  # removed in Python 3.13 — the cross-check is best-effort
        import audioop

        codes = rng.integers(0, 16, 400).tolist()
        mine, _, _ = _ima_decode_nibbles(codes, 0, 0)
        pk = bytes(
            (codes[i] << 4) | codes[i + 1] for i in range(0, len(codes), 2)
        )
        lin, _ = audioop.adpcm2lin(pk, 2, (0, 0))
        ref = np.frombuffer(lin, dtype="<i2").astype(np.int32)
        assert np.array_equal(mine, ref)
    except ImportError:
        pass

    n = 1200  # NOT a multiple of samples-per-block → exercises fact trim
    t = np.arange(n)
    x = (3000 * np.sin(t / 20) + 500 * np.sin(t / 7)).astype(np.int16)
    wav = encode_wav_ima_adpcm(x, 16000, block_align=64)
    meta, out = decode_wav(wav)
    out = out.ravel()
    assert meta["tag"] == 0x11 and meta["sample_rate"] == 16000
    assert out.size == n
    spb = (64 - 4) * 2 + 1
    assert np.array_equal(out[::spb], x[::spb].astype(np.int32))
    err = np.abs(out - x.astype(np.int64))
    assert err.max() < 2000 and err.mean() < 50


def test_audio_ms_adpcm():
    """MS ADPCM (WAV tag 0x02): 7-coefficient predictor blocks with
    adaptive delta. The tracked-prediction encoder mirrors the decoder's
    recurrence, so the container roundtrip is deterministic, each block's
    two header samples are verbatim, the 'fact' chunk trims last-block
    padding, and a smooth signal tracks within quantizer error."""
    import numpy as np

    from sync2any_spark.pipeline.audiocodec import (
        decode_wav,
        encode_wav_ms_adpcm,
    )

    n = 1500  # not a multiple of samples-per-block
    t = np.arange(n)
    x = (2500 * np.sin(t / 25) + 400 * np.sin(t / 9)).astype(np.int16)
    wav = encode_wav_ms_adpcm(x, 22050, block_align=128)
    meta, out = decode_wav(wav)
    out = out.ravel()
    assert meta["tag"] == 0x02 and meta["sample_rate"] == 22050
    assert out.size == n
    spb = (128 - 7) * 2 + 2
    # the two header samples per block are carried verbatim
    assert np.array_equal(out[::spb], x[::spb].astype(np.int32))
    assert np.array_equal(out[1::spb], x[1::spb].astype(np.int32))
    err = np.abs(out - x.astype(np.int64))
    assert err.max() < 3000 and err.mean() < 100
    m2, o2 = decode_wav(wav)
    assert np.array_equal(out, o2.ravel())


def test_jpeg_progressive():
    """Progressive JPEG (T.81 Annex G): coefficient-level grayscale
    fixtures exercise DC successive approximation, per-band AC first
    scans (ZRL, cross-block EOB runs), and AC refinement scans with
    interleaved correction bits — decoded output must equal the closed
    numpy form (dezigzag → IDCT → +128) of the SAME coefficients.
    Interleaved color progressive (4:4:4 and 4:2:0 MCU order) must decode
    identically to its baseline spelling."""
    import numpy as np

    from sync2any_spark.pipeline.jpegcodec import (
        ZIGZAG,
        _idct_matrix,
        decode_jpeg,
        encode_jpeg_blocks,
        encode_jpeg_progressive_blocks,
        encode_jpeg_progressive_gray,
    )

    def expected_gray(coefs, h, w):
        m = _idct_matrix()
        dq = np.zeros((len(coefs), 64))
        dq[:, ZIGZAG] = np.asarray(coefs, dtype=np.float64)
        px = (m.T @ dq.reshape(-1, 8, 8) @ m) + 128.0
        mcux, mcuy = (w + 7) // 8, (h + 7) // 8
        plane = (
            px.reshape(mcuy, mcux, 8, 8).transpose(0, 2, 1, 3)
            .reshape(mcuy * 8, mcux * 8)
        )
        return np.clip(np.rint(plane[:h, :w]), 0, 255).astype(np.uint8)

    rng = np.random.default_rng(41)
    h, w = 24, 32  # 3×4 = 12 blocks
    n = 12
    coefs = np.zeros((n, 64), dtype=np.int64)
    coefs[:, 0] = rng.integers(-400, 401, n)  # DC
    # sparse ACs: low band, a far position (forces ZRL), magnitude-1
    # values that only appear during refinement, negatives throughout
    for b in range(n):
        if b % 4 == 0:
            continue  # all-zero-AC blocks → cross-block EOB runs
        for k in rng.choice(np.arange(1, 10), size=3, replace=False):
            coefs[b, k] = int(rng.integers(-31, 32)) or 5
        coefs[b, 40 + b % 20] = int(rng.integers(-3, 4)) or -1
        coefs[b, 1 + b % 5] = [1, -1, 3, -2, 1][b % 5]

    for kwargs in (
        {},  # default script: dc_al=1, bands (1,5)(6,63), ac_al=1
        {"dc_al": 2, "ac_bands": ((1, 3), (4, 20), (21, 63)), "ac_al": 2},
        {"dc_al": 0, "ac_bands": ((1, 63),), "ac_al": 0},  # no refinement
    ):
        jb = encode_jpeg_progressive_gray(coefs, h, w, **kwargs)
        assert np.array_equal(decode_jpeg(jb), expected_gray(coefs, h, w)), kwargs

    # interleaved color progressive == its baseline spelling, exactly
    for sub, tile in (("444", 8), ("420", 16)):
        img = np.repeat(
            np.repeat(rng.integers(0, 256, (2, 3, 3)), tile, 0), tile, 1
        ).astype(np.uint8)
        prog = decode_jpeg(encode_jpeg_progressive_blocks(img, sub, dc_al=1))
        base = decode_jpeg(encode_jpeg_blocks(img, sub))
        assert np.array_equal(prog, base), sub
    # grayscale block-constant progressive is bit-exact
    g = np.repeat(np.repeat(rng.integers(0, 256, (3, 4)), 8, 0), 8, 1).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_progressive_blocks(g)), g)

    # restart markers inside progressive scans: RSTn boundaries reset the
    # DC predictor and terminate EOB runs in every scan type, and the
    # decode is identical across interval choices
    want = expected_gray(coefs, h, w)
    for ri in (1, 3, 5):
        jb = encode_jpeg_progressive_gray(coefs, h, w, restart_interval=ri)
        assert np.array_equal(decode_jpeg(jb), want), ri


def test_jpeg_progressive_randomized():
    """Property test: random sparse coefficient matrices × random scan
    scripts (band partition, approximation depths, restart intervals)
    always decode to the closed numpy form. Catches script-dependent
    bugs a fixed fixture can't (EOB runs straddling odd band edges,
    refinement order, ZRL at band boundaries)."""
    import numpy as np

    from sync2any_spark.pipeline.jpegcodec import (
        ZIGZAG,
        _idct_matrix,
        decode_jpeg,
        encode_jpeg_progressive_gray,
    )

    def expected(coefs, h, w):
        m = _idct_matrix()
        dq = np.zeros((len(coefs), 64))
        dq[:, ZIGZAG] = np.asarray(coefs, dtype=np.float64)
        px = (m.T @ dq.reshape(-1, 8, 8) @ m) + 128.0
        mcux, mcuy = (w + 7) // 8, (h + 7) // 8
        plane = (
            px.reshape(mcuy, mcux, 8, 8).transpose(0, 2, 1, 3)
            .reshape(mcuy * 8, mcux * 8)
        )
        return np.clip(np.rint(plane[:h, :w]), 0, 255).astype(np.uint8)

    rng = np.random.default_rng(97)
    for trial in range(12):
        mcux, mcuy = int(rng.integers(1, 5)), int(rng.integers(1, 4))
        h, w = mcuy * 8, mcux * 8
        n = mcux * mcuy
        coefs = np.zeros((n, 64), dtype=np.int64)
        coefs[:, 0] = rng.integers(-500, 501, n)
        # random sparsity: some blocks dense-ish, some empty
        for b in range(n):
            nnz = int(rng.integers(0, 12))
            ks = rng.choice(np.arange(1, 64), size=nnz, replace=False)
            coefs[b, ks] = rng.integers(-40, 41, nnz)
        # random band partition of 1..63
        cuts = sorted(
            set(rng.integers(2, 63, size=int(rng.integers(0, 3))).tolist())
        )
        bounds = [1] + cuts + [64]
        bands = tuple(
            (bounds[i], bounds[i + 1] - 1) for i in range(len(bounds) - 1)
        )
        kwargs = dict(
            dc_al=int(rng.integers(0, 3)),
            ac_bands=bands,
            ac_al=int(rng.integers(0, 3)),
            restart_interval=int(rng.choice([0, 0, 1, 2, 5])),
        )
        jb = encode_jpeg_progressive_gray(coefs, h, w, **kwargs)
        assert np.array_equal(decode_jpeg(jb), expected(coefs, h, w)), (
            trial, kwargs,
        )


def test_jpeg_lossless():
    """Lossless JPEG (SOF3, T.81 Annex H — r4 VERDICT Next #8): exact
    roundtrip through the fixture encoder for all 7 predictors, 1- and
    3-component frames, 8- and 16-bit precision (SSSS up to 16 with the
    mod-2^16 difference arithmetic), point transform, and restart
    markers. Randomized: 30 (predictor, shape, dtype, pt, restart) draws."""
    import numpy as np

    from sync2any_spark.pipeline.jpegcodec import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(31)
    g = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    for p in range(1, 8):
        assert np.array_equal(decode_jpeg(encode_jpeg_lossless(g, predictor=p)), g)

    rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg_lossless(rgb, predictor=4)), rgb)

    u16 = rng.integers(0, 65536, (8, 9), dtype=np.uint16)
    got = decode_jpeg(encode_jpeg_lossless(u16, predictor=7))
    assert got.dtype == np.uint16 and np.array_equal(got, u16)

    # point transform: decode returns the Pt-truncated samples
    assert np.array_equal(
        decode_jpeg(encode_jpeg_lossless(g, predictor=2, pt=3)), (g >> 3) << 3
    )
    # restart markers reset prediction mid-image
    assert np.array_equal(
        decode_jpeg(encode_jpeg_lossless(g, predictor=5, restart_rows=2)), g
    )

    for trial in range(30):
        hh, ww = int(rng.integers(1, 20)), int(rng.integers(1, 20))
        nc = int(rng.choice([1, 3]))
        dt = rng.choice([np.uint8, np.uint16])
        hi = 256 if dt is np.uint8 else 65536
        shape = (hh, ww) if nc == 1 else (hh, ww, nc)
        img = rng.integers(0, hi, shape, dtype=dt)
        p = int(rng.integers(1, 8))
        pt = int(rng.integers(0, 3))
        rr = int(rng.choice([0, 1, 3]))
        out = decode_jpeg(
            encode_jpeg_lossless(img, predictor=p, pt=pt, restart_rows=rr)
        )
        want = (img.astype(np.int64) >> pt) << pt
        assert np.array_equal(out.astype(np.int64), want), (trial, p, pt, rr)


def test_jpeg_restart_markers():
    """DRI/RSTn handling (T.81 E.1.4): restart intervals byte-realign the
    scan and reset DC predictors; decode is identical across intervals,
    and a corrupted restart position fails loudly."""
    import numpy as np

    from sync2any_spark.pipeline.jpegcodec import decode_jpeg, encode_jpeg_blocks

    rng = np.random.default_rng(23)
    g = np.repeat(np.repeat(rng.integers(0, 256, (4, 5)), 8, 0), 8, 1).astype(np.uint8)
    for ri in (1, 2, 7):
        assert np.array_equal(
            decode_jpeg(encode_jpeg_blocks(g, restart_interval=ri)), g
        ), ri
    c = np.repeat(np.repeat(rng.integers(0, 256, (2, 3, 3)), 16, 0), 16, 1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_blocks(c, subsampling="420", restart_interval=2))
    assert int(np.abs(out.astype(int) - c.astype(int)).max()) <= 1
    # DRI promised restarts but the stream has none → loud failure
    jb = bytearray(encode_jpeg_blocks(g))
    i = jb.find(b"\xff\xda")
    jb[i:i] = b"\xff\xdd" + (4).to_bytes(2, "big") + (2).to_bytes(2, "big")
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(jb))
