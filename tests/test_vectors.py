"""Embedding ANN path (D5/N1/N2): exact-baseline agreement, recall vs
brute force on planted duplicates, LINEAR candidate growth under bucket
caps (the round-1 scale-killer was quadratic), and code determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from nise_dedup.config import DedupConfig
from nise_dedup.lsh import candidate_pairs
from nise_dedup.vectors import (cosine_neardup_pairs, cosine_topk_bruteforce,
                                lsh_code_bands, lsh_codes)


def _df(spark, V):
    pdf = pd.DataFrame({"vec_id": list(range(len(V))),
                        "embedding": [[float(x) for x in v] for v in V]})
    return spark.createDataFrame(pdf, "vec_id long, embedding array<float>")


def _planted(n_base=300, n_dup=80, dim=32, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    src = rng.integers(0, n_base, n_dup)
    dups = base[src] + rng.standard_normal((n_dup, dim)) * 0.08
    return np.vstack([base, dups]).astype(np.float32)


def _truth_pairs(V, threshold):
    Vn = V.astype(np.float64)
    Vn /= np.linalg.norm(Vn, axis=1, keepdims=True)
    S = Vn @ Vn.T
    a, b = np.triu_indices(len(V), 1)
    keep = S[a, b] >= threshold
    return {(int(x), int(y)) for x, y in zip(a[keep], b[keep])}


def test_neardup_recall_and_precision_vs_bruteforce(spark):
    V = _planted()
    truth = _truth_pairs(V, 0.9)
    assert len(truth) >= 50         # fixture sanity: dups actually planted
    got = {(r["a"], r["b"]) for r in
           cosine_neardup_pairs(_df(spark, V), threshold=0.9).collect()}
    got = {(min(p), max(p)) for p in got}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"recall {recall} ({len(got)} found)"
    # precision: the re-rank is EXACT cosine, so nothing below threshold
    # (tolerance for float32->float64 edge pairs)
    loose = _truth_pairs(V, 0.9 - 1e-5)
    assert got <= loose


def test_candidate_volume_linear_under_caps(spark):
    """Doubling a structureless corpus must NOT double per-bucket pair
    density: with bucket caps + salting the candidate volume grows ~2x
    (linear), where the uncapped self-join would grow ~4x (quadratic)."""
    cfg = DedupConfig(bucket_cap=8)

    def n_cand(n):
        rng = np.random.default_rng(3)
        V = rng.standard_normal((n, 16)).astype(np.float32)
        bands = lsh_code_bands(_df(spark, V), tables=2, bits=4, seed=1)
        return candidate_pairs(bands, cfg).count()

    c1, c2 = n_cand(400), n_cand(800)
    assert c1 > 0
    assert c2 <= 3.0 * c1, (c1, c2)


def test_code_bands_deterministic(spark):
    V = _planted(n_base=50, n_dup=10)
    df = _df(spark, V)

    def codes(d):
        return sorted((r["file_id"], r["band_id"], r["band_key"])
                      for r in lsh_code_bands(d, tables=4, bits=6,
                                              seed=9).collect())

    assert codes(df) == codes(df.repartition(7))
    flat = sorted((r["vec_id"], r["code"])
                  for r in lsh_codes(df, n_bits=8, seed=9).collect())
    assert flat == sorted((r["vec_id"], r["code"])
                          for r in lsh_codes(df.repartition(5), n_bits=8,
                                             seed=9).collect())


def test_bruteforce_topk_matches_numpy(spark):
    V = _planted(n_base=60, n_dup=0, dim=16, seed=11)
    Vn = V.astype(np.float64)
    Vn /= np.linalg.norm(Vn, axis=1, keepdims=True)
    S = Vn @ Vn.T
    got = cosine_topk_bruteforce(_df(spark, V), n_queries=3, k=4).collect()
    for r in got:
        q, nb = r["query_id"], r["neighbor_id"]
        assert abs(S[q, nb] - r["cosine_r"]) < 1e-5
    # exact top-1 agreement per query
    top1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    for q in range(3):
        s = S[q].copy()
        s[q] = -2
        assert top1[q] == int(np.argmax(s))
