"""Unit tests for the training-data extras (SURVEY §2.8): text ops,
embedding similarity, multimodal plumbing — edge cases the DuckDB parity
checks don't reach."""

from __future__ import annotations

import math

import pytest

from nise_dedup import multimodal, textops, vectors


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, "  a  b\t c\nd  ")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"] for r in
           textops.quality_features(df).select(
               "doc_id", "n_tokens").collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 4}


def test_word_jaccard_values(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "b c d"), (2, "x y")],
        "doc_id long, text string")
    rows = {(r["a"], r["b"]): r for r in
            textops.word_jaccard_consecutive(df).collect()}
    assert rows[(0, 1)]["n_common"] == 2
    assert rows[(0, 1)]["n_union"] == 4
    assert abs(rows[(0, 1)]["jaccard"] - 0.5) < 1e-12
    assert rows[(1, 2)]["n_common"] == 0


def test_ngram_jaccard_identical_and_short(spark):
    df = spark.createDataFrame(
        [(0, "abcdef"), (1, "abcdef"), (2, "ab")],
        "doc_id long, text string")
    rows = {(r["a"], r["b"]): r for r in
            textops.char_ngram_jaccard_consecutive(df, n=3).collect()}
    assert rows[(0, 1)]["jaccard"] == 1.0
    assert rows[(1, 2)]["n_common"] == 0   # "ab" yields gram "ab" (len<3)


def test_doc_fingerprint_deterministic(spark):
    df = spark.createDataFrame([(1, "hello world " * 10)],
                               "doc_id long, text string")
    a = textops.doc_fingerprint(df).collect()[0]
    b = textops.doc_fingerprint(df).collect()[0]
    assert a == b
    assert a["fp_full"] != a["fp_q1"]


def test_cosine_topk_exact(spark):
    vecs = [(0, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]), (4, [0.9, 0.05])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in
           vectors.cosine_topk_bruteforce(df, n_queries=1, k=4).collect()}
    # neighbors of vec 0 by cosine: 4 (~0.998... vs 1: 0.995) -> check order
    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na / 1) / nb
    order = sorted([1, 2, 3, 4],
                   key=lambda i: (-cos(vecs[0][1], vecs[i][1]), i))
    assert [got[(0, r)] for r in range(1, 5)] == order


def test_lsh_codes_deterministic_and_bucketed(spark):
    import numpy as np
    rng = np.random.default_rng(7)
    rows = [(i, rng.standard_normal(16).astype(float).tolist())
            for i in range(50)]
    # near-duplicate of vec 0
    rows.append((99, [x * 1.001 for x in rows[0][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    c1 = {r["vec_id"]: r["code"] for r in vectors.lsh_codes(df, 8, 42).collect()}
    c2 = {r["vec_id"]: r["code"] for r in vectors.lsh_codes(df, 8, 42).collect()}
    assert c1 == c2                      # seeded determinism
    assert c1[0] == c1[99]               # near-dup lands in the same bucket
    pairs = {(r["a"], r["b"]) for r in
             vectors.cosine_neardup_pairs(df, threshold=0.99, tables=8,
                                          bits=8, seed=42).collect()}
    assert (0, 99) in pairs or (99, 0) in pairs


def test_multimodal_payload_and_features(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "")],
                               "doc_id long, text string")
    media = multimodal.with_binary_payload(df)
    rows = {r["media_id"]: r for r in media.collect()}
    assert bytes(rows[1]["payload"]) == b"hello"
    assert rows[1]["magic"] == b"hell".hex()
    feats = {r["media_id"]: r for r in
             multimodal.extract_features(media, mode="fake").collect()}
    assert feats[1]["n_bytes"] == 5
    assert len(feats[1]["feature"]) == 4
    assert feats[2]["n_bytes"] == 0


def test_multimodal_real_mode_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"xx", "real")


# ---------------------------------------------------------------------------
# REAL media decode (BMP / WAV header parsing — no codec libs needed)
# ---------------------------------------------------------------------------

def _tiny_bmp(w=3, h=2, bgr=(10, 20, 30)):
    import struct
    stride = ((w * 3 + 3) // 4) * 4
    row = (bytes(bgr) * w).ljust(stride, b"\x00")
    px = row * h
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px),
                       2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(px), 0, 0, 54)
    return hdr + info + px


def _tiny_wav(rate=8000, samples=(1000, -1000, 2000, -2000)):
    import struct
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_decode_bmp_real():
    from nise_dedup.multimodal import decode_bmp, decode_media
    f = decode_bmp(_tiny_bmp())
    assert f == [3.0, 2.0, 10.0, 20.0, 30.0]
    assert decode_media(_tiny_bmp())[0] == "bmp"
    assert decode_bmp(b"BMgarbage") is None
    assert decode_media(b"plain text payload")[0] == "unknown"


def test_decode_wav_real():
    import math

    from nise_dedup.multimodal import decode_wav
    rate, ch, n, rms, peak = decode_wav(_tiny_wav())
    assert (rate, ch, n, peak) == (8000.0, 1.0, 4.0, 2000.0)
    assert abs(rms - math.sqrt(2.5e6)) < 1e-6
    assert decode_wav(b"RIFFxxxxWAVE") is None


def test_decode_wav_truncated_fmt():
    """ADVICE r2: a RIFF/WAVE payload with a truncated 'fmt ' chunk must be
    not-decodable (None / 'unknown'), never a struct.error task failure."""
    import struct

    from nise_dedup.multimodal import decode_media, decode_wav
    short_fmt = struct.pack("<HHI", 1, 1, 8000)      # 8 bytes, not 16
    b = (b"RIFF" + struct.pack("<I", 20 + len(short_fmt)) + b"WAVE"
         + b"fmt " + struct.pack("<I", len(short_fmt)) + short_fmt
         + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00")
    # pad past the 44-byte RIFF minimum so only the fmt truncation is tested
    b = b + b"\x00" * max(0, 44 - len(b))
    assert decode_wav(b) is None
    assert decode_media(b) == ("unknown", [])
    # chunk size field lying beyond the payload end must not crash either
    evil = b"RIFF" + struct.pack("<I", 1 << 30) + b"WAVE" + b"fmt " \
        + struct.pack("<I", 1 << 29)
    assert decode_media(evil.ljust(60, b"\x01"))[0] == "unknown"


def test_synth_media_roundtrip(spark):
    """The media_decode driver query's contract: synthesized payloads decode
    (via the REAL BMP/WAV parsers) to exact integer arithmetic on the id."""
    from nise_dedup.multimodal import (extract_media_features,
                                       synth_media_payloads)
    ids = spark.range(0, 20).withColumnRenamed("id", "media_id")
    got = {r["media_id"]: r for r in
           extract_media_features(synth_media_payloads(ids)).collect()}
    for i in range(20):
        r = got[i]
        if i % 2 == 0:
            assert r["kind"] == "bmp"
            assert (r["f0"], r["f1"]) == (float(i % 7 + 1), float(i % 5 + 1))
            assert (r["f2"], r["f3"], r["f4"]) == (
                float(i % 256), float((3 * i + 7) % 256),
                float((5 * i + 11) % 256))
        else:
            assert r["kind"] == "wav"
            assert r["f0"] == float(8000 + (i % 5) * 1000)
            assert r["f1"] == float(1 + (i // 2) % 2)
            assert r["f2"] == float(16 + i % 8)
            assert r["f3"] == r["f4"] == float(i % 1000 + 1)


def test_cosine_topk_empty_and_zero_queries(spark):
    """ADVICE r2: no ids below n_queries -> empty frame (not np.stack
    crash); an all-zero query vector scores 0, never NaN."""
    df = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    out = vectors.cosine_topk_bruteforce(df, n_queries=10, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "rank", "cosine_r"]

    z = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 2.0])],
        "vec_id long, embedding array<float>")
    rows = vectors.cosine_topk_bruteforce(z, n_queries=1, k=2).collect()
    assert rows and all(r["cosine_r"] == 0.0 for r in rows)


def test_candidate_pairs_no_handles_releases_cache(spark):
    """ADVICE r2: with handles=None (the registry/one-shot path) the
    internal salted-bucket persist must be released before returning."""
    from nise_dedup import lsh
    from nise_dedup.config import DedupConfig
    bands = spark.createDataFrame(
        [(i % 2, i % 3, i) for i in range(24)],
        "band_id int, band_key long, file_id long")
    sc = spark.sparkContext._jsc.sc()

    def cached_dataframes():
        return sum(1 for info in sc.getRDDStorageInfo()
                   if "salted" in info.name().lower()
                   or "inmemory" in info.name().lower())

    spark.catalog.clearCache()
    pairs = lsh.candidate_pairs(bands, DedupConfig(bucket_cap=4))
    assert pairs.count() > 0
    # the only surviving storage is the localCheckpoint of the (tiny) pair
    # table itself; the salted-bucket DataFrame cache is gone
    names = [info.name() for info in sc.getRDDStorageInfo()]
    assert not any("InMemoryTable" in n or "salted" in n.lower()
                   for n in names), names


def test_extract_media_features_spark(spark):
    from nise_dedup.multimodal import extract_media_features
    rows = [(1, bytearray(_tiny_bmp())),
            (2, bytearray(_tiny_wav())),
            (3, bytearray(b"not media at all"))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in
           extract_media_features(media).collect()}
    assert got[1]["kind"] == "bmp" and got[1]["f0"] == 3.0
    assert got[2]["kind"] == "wav" and got[2]["f0"] == 8000.0
    assert got[3]["kind"] == "unknown" and got[3]["f0"] is None
