"""Signature stage S1–S4 (SURVEY §2.3): k-shingles, MinHash, SimHash, band
keys — fused into ONE vectorized Arrow pass so each content string is
scanned exactly once.

`mapInPandas` streams Arrow record batches into the Python worker; inside,
everything is NumPy (nise_dedup.hashing) — no per-row Python hot loops beyond
the unavoidable per-document iteration (each document's shingle set is a
variable-length array; the work inside each is vectorized).

Output schema (the `signatures` relation, SURVEY §1.2):
  file_id long, n_shingles long, simhash long,
  minhash array<long>[num_perm], band_keys array<long>[bands],
  shingles array<long>  (sorted distinct, uint64 order; kept for exact-
                         Jaccard verification V1)

All longs are uint64 values reinterpreted as signed int64 (Spark LongType);
bit patterns — hence equality/XOR/intersection semantics — are preserved.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from nise_dedup.config import DedupConfig

SIGNATURE_SCHEMA = ("file_id long, n_shingles long, simhash long, "
                    "minhash array<long>, band_keys array<long>, "
                    "shingles array<long>")


def _make_mapper(cfg: DedupConfig):
    """Returns the mapInPandas function. cfg fields are captured by value
    (a frozen dataclass pickles cheaply — no big driver state in closure)."""
    k = cfg.shingle_k
    num_perm, bands, rows, seed = cfg.num_perm, cfg.bands, cfg.rows, cfg.seed
    norm = cfg.normalize
    keep_shingles = True

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from nise_dedup import hashing as H

        seeds = H.hash_seeds(num_perm, seed)
        for pdf in batches:
            n = len(pdf)
            out = {
                "file_id": pdf["file_id"].to_numpy(),
                "n_shingles": np.empty(n, dtype=np.int64),
                "simhash": np.empty(n, dtype=np.int64),
                "minhash": [None] * n,
                "band_keys": [None] * n,
                "shingles": [None] * n,
            }
            contents = pdf["content"].to_numpy()
            for i in range(n):
                text = H.normalize_text(contents[i], norm)
                sh = H.shingle_hashes(text.encode("utf-8"), k)
                mh = H.minhash(sh, seeds)
                bk = H.band_keys(mh, bands, rows, seed)
                out["n_shingles"][i] = sh.shape[0]
                out["simhash"][i] = H.to_i64(H.simhash64(sh))
                out["minhash"][i] = H.to_i64(mh)
                out["band_keys"][i] = H.to_i64(bk)
                out["shingles"][i] = H.to_i64(sh) if keep_shingles else None
            yield pd.DataFrame(out)

    return compute


def compute_signatures(uniq: DataFrame, cfg: DedupConfig) -> DataFrame:
    """S4 — signature stage driver: uniq(file_id, content, ...) -> signatures.

    Column-prunes to exactly (file_id, content) before the Arrow exchange so
    the Python worker never sees bytes it doesn't hash.
    """
    return (uniq
            .select("file_id", "content")
            .mapInPandas(_make_mapper(cfg), schema=SIGNATURE_SCHEMA))
