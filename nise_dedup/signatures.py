"""Signature stage S1–S4 (SURVEY §2.3): k-shingles, MinHash, SimHash, band
keys — fused into ONE vectorized Arrow pass so each content string is
scanned exactly once.

`mapInPandas` streams Arrow record batches into the Python worker; inside,
everything is NumPy (nise_dedup.hashing) — no per-row Python hot loops beyond
the unavoidable per-document iteration (each document's shingle set is a
variable-length array; the work inside each is vectorized). MinHash uses
one-permutation hashing by default (O(m) per doc, DedupConfig.minhash_scheme).

Output schema (the `signatures` relation, SURVEY §1.2):
  file_id long, n_shingles long, n_bytes long (normalized UTF-8 length),
  simhash long, minhash array<long>[num_perm], band_keys array<long>[bands]
  [+ shingles array<long> when keep_shingles=True — tests/diagnostics only:
   the pipeline deliberately does NOT persist shingle sets (10 KB+/row);
   deep verification recomputes them from content for the gated residue]

All longs are uint64 values reinterpreted as signed int64 (Spark LongType);
bit patterns — hence equality/XOR semantics — are preserved.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from nise_dedup.config import DedupConfig

SIGNATURE_SCHEMA = ("file_id long, n_shingles long, n_bytes long, "
                    "simhash long, mhb_lo long, mhb_hi long, "
                    "minhash array<long>, band_keys array<long>")


def _make_mapper(cfg: DedupConfig, keep_shingles: bool):
    k = cfg.shingle_k
    num_perm, bands, rows, seed = cfg.num_perm, cfg.bands, cfg.rows, cfg.seed
    scheme, norm = cfg.minhash_scheme, cfg.normalize
    est_m = min(cfg.est_components, num_perm)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from nise_dedup import hashing as H

        seeds = H.hash_seeds(num_perm, seed) if scheme == "kperm" else None
        for pdf in batches:
            n = len(pdf)
            out = {
                "file_id": pdf["file_id"].to_numpy(),
                "n_shingles": np.empty(n, dtype=np.int64),
                "n_bytes": np.empty(n, dtype=np.int64),
                "simhash": np.empty(n, dtype=np.int64),
                "mhb_lo": np.empty(n, dtype=np.int64),
                "mhb_hi": np.empty(n, dtype=np.int64),
                "minhash": [None] * n,
                "band_keys": [None] * n,
            }
            if keep_shingles:
                out["shingles"] = [None] * n
            contents = pdf["content"].to_numpy()
            for i in range(n):
                raw = H.normalize_text(contents[i], norm).encode("utf-8")
                sh = H.shingle_hashes(raw, k)
                if scheme == "kperm":
                    mh = H.minhash(sh, seeds)
                else:
                    mh = H.minhash_oph(sh, num_perm, seed)
                bk = H.band_keys(mh, bands, rows, seed)
                out["n_shingles"][i] = sh.shape[0]
                out["n_bytes"][i] = len(raw)
                out["simhash"][i] = H.to_i64(H.simhash64(sh))
                lo, hi = H.pack_bbit(mh, est_m)
                out["mhb_lo"][i] = lo
                out["mhb_hi"][i] = hi
                out["minhash"][i] = H.to_i64(mh)
                out["band_keys"][i] = H.to_i64(bk)
                if keep_shingles:
                    out["shingles"][i] = H.to_i64(sh)
            yield pd.DataFrame(out)

    return compute


def compute_signatures(uniq: DataFrame, cfg: DedupConfig,
                       keep_shingles: bool = False) -> DataFrame:
    """S4 — signature stage driver: uniq(file_id, content, ...) -> signatures.

    Column-prunes to exactly (file_id, content) before the Arrow exchange so
    the Python worker never sees bytes it doesn't hash.
    """
    schema = SIGNATURE_SCHEMA
    if keep_shingles:
        schema += ", shingles array<long>"
    return (uniq
            .select("file_id", "content")
            .mapInPandas(_make_mapper(cfg, keep_shingles), schema=schema))
